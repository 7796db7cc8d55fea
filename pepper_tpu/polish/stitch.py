"""Polish stage 3 — stitch chunk predictions into the polished FASTA.

Parity: pepper/modules/python/Stitch.py + perform_stitch.py — per-contig
gather of (position, insert_index)-keyed base predictions across chunks,
skipping the first 2*MIN_IMAGE_OVERLAP positions of every chunk that
overlaps its predecessor, sorted concat, decode {1..4}->ACGT (0 -> '').
"""
import concurrent.futures
import os
import re
import sys
import time
from datetime import datetime
from typing import Dict, List, Tuple

import numpy as np

from pepper_tpu.options import PolishImageOptions
from pepper_tpu.polish.datastore import (PolishPredictionStore,
                                         polish_image_files)

LABEL_DECODER = {1: "A", 2: "C", 3: "G", 4: "T", 0: ""}


def _log(msg: str) -> None:
    sys.stderr.write("[" + datetime.now().strftime("%m-%d-%Y %H:%M:%S")
                     + "] INFO: " + msg + "\n")
    sys.stderr.flush()


def natural_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


_DECODE = np.frombuffer(b"\x00ACGT", np.uint8)  # label -> base byte, 0 drops


def small_chunk_stitch(contig: str,
                       chunk_keys: List[Tuple[str, str, int, int]]):
    """Stitch.py:36-94: (pos,index)-keyed de-dup with overlap-buffer skip.

    Vectorized: the reference's per-base dict insert (last chunk wins per
    (pos, index) key) becomes filter -> stable lexsort -> last-of-group
    selection, so stitching a contig is numpy throughput instead of a
    Python loop (and needs no process pool)."""
    buffer_positions = PolishImageOptions.MIN_IMAGE_OVERLAP * 2
    pos_parts, idx_parts, base_parts = [], [], []
    stores: Dict[str, PolishPredictionStore] = {}  # one open per file
    try:
        for file_name, chunk_key, _st, _end in chunk_keys:
            store = stores.get(file_name)
            if store is None:
                store = stores[file_name] = PolishPredictionStore(
                    file_name, "r")
            for bases, positions, indices in store.read_chunks(contig,
                                                               chunk_key):
                positions = np.asarray(positions, np.int64)
                indices = np.asarray(indices, np.int64)
                bases = np.asarray(bases, np.int64)
                mask = (indices >= 0) & (positions >= 0)
                if _st > 0:
                    mask &= positions > _st + buffer_positions
                if mask.any():
                    pos_parts.append(positions[mask])
                    idx_parts.append(indices[mask])
                    base_parts.append(bases[mask])
    finally:
        for store in stores.values():
            store.close()
    if not pos_parts:
        return -1, -1, ""
    pos = np.concatenate(pos_parts)
    idx = np.concatenate(idx_parts)
    base = np.concatenate(base_parts)
    order = np.lexsort((idx, pos))  # stable: ties keep arrival order
    sp, si, sb = pos[order], idx[order], base[order]
    last = np.empty(len(sp), bool)  # last write per key == dict overwrite
    last[-1] = True
    np.logical_or(sp[1:] != sp[:-1], si[1:] != si[:-1], out=last[:-1])
    kept = sb[last]
    sequence = _DECODE[kept[kept != 0]].tobytes().decode()
    return int(sp[0]), int(sp[-1]), sequence


def create_consensus_sequence(contig: str, chunk_keys, threads: int,
                              stitcher: str = "v1") -> str:
    """Stitch.py:97-128 (v1); 'v2' merges shard results by overlap
    alignment (StitchV2 parity, polish/stitch_v2.py)."""
    chunk_keys = sorted(chunk_keys, key=lambda e: (e[2], e[3]))
    if threads > 1 and len(chunk_keys) > 2:
        # threads, not fork: small_chunk_stitch is numpy-vectorized (h5py
        # and numpy release the GIL on the bulk work) and fork after JAX
        # init risks deadlock
        size = max(2, len(chunk_keys) // threads + 1)
        pieces = [chunk_keys[i:i + size]
                  for i in range(0, len(chunk_keys), size)]
        results = []
        with concurrent.futures.ThreadPoolExecutor(max_workers=threads) as pool:
            futures = [pool.submit(small_chunk_stitch, contig, p)
                       for p in pieces]
            for fut in concurrent.futures.as_completed(futures):
                exc = fut.exception()
                if exc is not None:
                    raise RuntimeError(f"stitch shard failed: {exc}") from exc
                results.append(fut.result())
    else:
        results = [small_chunk_stitch(contig, chunk_keys)]
    chunks = sorted((r for r in results if r[0] != -1),
                    key=lambda e: (e[0], e[1]))
    if not chunks:
        return ""
    if stitcher == "v2" and len(chunks) > 1:
        from pepper_tpu.polish.stitch_v2 import alignment_stitch
        return alignment_stitch(
            [(contig, first, last, seq) for first, last, seq in chunks])[3]
    return "".join(seq for _, _, seq in chunks)


def perform_stitch(prediction_dir: str, output_prefix: str,
                   threads: int = 1, stitcher: str = "v1") -> str:
    """perform_stitch.py:44-84 -> <prefix>_pepper_polished.fa."""
    prediction_files = polish_image_files(prediction_dir)
    all_contigs = set()
    for path in prediction_files:
        with PolishPredictionStore(path, "r") as store:
            all_contigs.update(store.contigs())

    output_path = output_prefix + "_pepper_polished.fa"
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with open(output_path, "w") as fasta:
        for contig in sorted(all_contigs, key=natural_key):
            _log(f"PROCESSING CONTIG: {contig}")
            chunk_keys = []
            for path in prediction_files:
                with PolishPredictionStore(path, "r") as store:
                    if contig not in store.contigs():
                        continue
                    for key, start, end in store.chunk_keys(contig):
                        chunk_keys.append((path, key, start, end))
            sequence = create_consensus_sequence(contig, chunk_keys, threads,
                                                 stitcher=stitcher)
            _log(f"FINISHED {contig}, POLISHED SEQUENCE LENGTH: {len(sequence)}")
            if sequence:
                fasta.write(">" + contig + "\n")
                fasta.write(sequence + "\n")
    return output_path
