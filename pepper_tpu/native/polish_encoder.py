"""ctypes wrapper for the fused native polish pileup encoder
(src/polish_encode.cpp).

Returns the (image, positions, indices) arrays of one region's expanded
pileup — the same values as the Python PolishSummary oracle
(pepper_tpu/polish/summary.py); tests/test_polish_native.py asserts
bit-equality between the two backends.
"""
import ctypes
import threading
from typing import Optional, Tuple

import numpy as np

from pepper_tpu.native import bamio
from pepper_tpu.options import AlignerOptions


class _PolishEncodeResult(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("image", ctypes.POINTER(ctypes.c_uint8)),
        ("positions", ctypes.POINTER(ctypes.c_int64)),
        ("indices", ctypes.POINTER(ctypes.c_int32)),
        ("n_reads", ctypes.c_int64),
    ]


_bound = False
_bind_lock = threading.Lock()


def _lib():
    global _bound
    bamio._load()
    lib = bamio._lib
    if lib is None:
        raise RuntimeError(
            f"native polish encoder unavailable: {bamio._build_error}")
    if _bound:
        return lib
    with _bind_lock:
        if _bound:
            return lib
        lib.polish_encode_region.restype = ctypes.POINTER(_PolishEncodeResult)
        lib.polish_encode_region.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.c_uint32]
        lib.polish_encode_result_free.argtypes = [
            ctypes.POINTER(_PolishEncodeResult)]
        lib.polish_encode_result_free.restype = None
        _bound = True
    return lib


def available() -> bool:
    return bamio.available()


def polish_encode_native(
        bam, chromosome: str, region_start: int, region_end: int,
        realign_ref: str, realignment_flag: bool,
        band: int = 128, max_reads: int = 1500,
        random_seed: int = AlignerOptions.RANDOM_SEED
        ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """One region's expanded pileup: (image uint8 [P,10], positions
    int64 [P], indices int32 [P]), or None when the region has no reads.

    `bam` is an open pepper_tpu.io.bam_reader.BamReader; `realign_ref` is
    the reference slice anchored at region_start covering
    [region_start, region_end + ALIGNMENT_SAFE_BASES). Region bounds are
    inclusive (the PolishSummary convention)."""
    lib = _lib()
    ref_id = bam._ref_ids[chromosome]
    chunks = bam._index.chunks_for(ref_id, max(0, region_start), region_end)
    flat = np.asarray(chunks, dtype=np.uint64).reshape(-1)
    ref_b = realign_ref.encode()
    res_ptr = lib.polish_encode_region(
        bam.path.encode(),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(chunks),
        ref_id, region_start, region_end, ref_b, len(ref_b),
        1 if realignment_flag else 0, band, max_reads, random_seed)
    if not res_ptr:
        raise MemoryError("polish_encode_region failed")
    try:
        res = res_ptr.contents
        n = int(res.n)
        if res.n_reads == 0:
            return None
        image = np.ctypeslib.as_array(res.image, (n, 10)).copy()
        positions = np.ctypeslib.as_array(res.positions, (n,)).copy()
        indices = np.ctypeslib.as_array(res.indices, (n,)).copy()
    finally:
        lib.polish_encode_result_free(res_ptr)
    return image, positions, indices
