"""Read-to-draft local realignment (polish path).

The reference realigns reads to the draft before building the pileup
(pepper/modules/python/AlignmentSummarizer.py:159-177) using a
DeepVariant-derived SSW aligner (scoring: match 4 / mismatch 6 / gap open 8
/ extend 2, aligner.h:22-28). Here: the native affine-gap local aligner
(pepper_tpu/native/src/align.cpp) rebuilds each read's (pos, CIGAR) against
the region reference; reads that fail to align keep their original
alignment, matching the reference's keep-original fallback. Pass-through if
the native library is unavailable.
"""
import ctypes
from dataclasses import replace
from typing import List

import numpy as np

from pepper_tpu.io.bam_reader import TrimmedRead
from pepper_tpu.native import bamio


_bound = False
_bind_lock = __import__("threading").Lock()


def _lib():
    global _bound
    bamio._load()
    lib = bamio._lib
    if lib is None:
        return None
    if _bound:
        return lib
    with _bind_lock:
        if not _bound:
            lib.ssw_align_one.restype = ctypes.c_int
            lib.ssw_align_one.argtypes = [
                ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
            lib.ssw_align_one_banded.restype = ctypes.c_int
            lib.ssw_align_one_banded.argtypes = [
                ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
            lib.ssw_align_one_auto.restype = ctypes.c_int
            lib.ssw_align_one_auto.argtypes = \
                lib.ssw_align_one_banded.argtypes
            _bound = True
    return lib


def align_reads_to_reference(reads: List[TrimmedRead], ref_seq: str,
                             ref_start: int,
                             band: int = 128) -> List[TrimmedRead]:
    """Realign each read locally to ref_seq (anchored at ref_start).

    Reads are BAM-anchored, so the DP runs in a +/-`band` diagonal band
    around each read's existing offset (O(len*band) instead of the full
    O(len*ref_len) matrix — the role of the reference's SIMD-striped SW).
    band <= 0 forces the full matrix."""
    lib = _lib()
    if lib is None:
        return reads
    ref_b = ref_seq.encode()
    cap = 4096
    ops = (ctypes.c_uint8 * cap)()
    lens = (ctypes.c_int32 * cap)()
    ref_off = ctypes.c_int32(0)
    out = []
    for read in reads:
        hint = read.pos - ref_start
        seq_b = read.sequence.encode()
        n = 0
        # fast path: k-mer seeded (gapless accept or seed-bounded band,
        # align.cpp ssw_align_one_auto) around the BAM anchor — unless the
        # anchor is nonsense (outside the window), where only the full DP
        # can help
        if band > 0 and -len(seq_b) <= hint <= len(ref_b):
            n = lib.ssw_align_one_auto(
                ref_b, len(ref_b), seq_b, len(seq_b),
                hint, band, ctypes.byref(ref_off), ops, lens, cap)
        if n <= 0:  # fallback: full matrix (reference's anchor-free SW)
            n = lib.ssw_align_one_banded(
                ref_b, len(ref_b), seq_b, len(seq_b),
                0, 0, ctypes.byref(ref_off), ops, lens, cap)
        if n <= 0:
            out.append(read)
            continue
        cigar = [(int(ops[i]), int(lens[i])) for i in range(n)]
        new_pos = ref_start + int(ref_off.value)
        ref_span = sum(l for op, l in cigar if op in (0, 2, 3, 7, 8))
        out.append(replace(read, pos=new_pos, pos_end=new_pos + ref_span,
                           cigar_tuples=cigar))
    return out
