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


def _filter_part(region_start: int, positions, indices, bases):
    """One sub-chunk's kept (pos, idx, base) arrays after the invalid-key
    filter and the overlap-buffer skip (Stitch.py:64-74)."""
    buffer_positions = PolishImageOptions.MIN_IMAGE_OVERLAP * 2
    positions = np.asarray(positions, np.int64)
    indices = np.asarray(indices, np.int64)
    bases = np.asarray(bases, np.int64)
    mask = (indices >= 0) & (positions >= 0)
    if region_start > 0:
        mask &= positions > region_start + buffer_positions
    if not mask.any():
        return None
    return positions[mask], indices[mask], bases[mask]


def _stitch_filtered(parts):
    """Concat pre-filtered parts (in chunk order) -> stable lexsort ->
    last-of-group selection -> decoded sequence. The reference's per-base
    dict insert (last chunk wins per (pos, index) key, Stitch.py:36-94)
    as numpy throughput."""
    if not parts:
        return -1, -1, ""
    pos = np.concatenate([p[0] for p in parts])
    idx = np.concatenate([p[1] for p in parts])
    base = np.concatenate([p[2] for p in parts])
    order = np.lexsort((idx, pos))  # stable: ties keep arrival order
    sp, si, sb = pos[order], idx[order], base[order]
    last = np.empty(len(sp), bool)  # last write per key == dict overwrite
    last[-1] = True
    np.logical_or(sp[1:] != sp[:-1], si[1:] != si[:-1], out=last[:-1])
    kept = sb[last]
    sequence = _DECODE[kept[kept != 0]].tobytes().decode()
    return int(sp[0]), int(sp[-1]), sequence


def small_chunk_stitch(contig: str,
                       chunk_keys: List[Tuple[str, str, int, int]]):
    """Stitch.py:36-94: (pos,index)-keyed de-dup with overlap-buffer skip.

    Vectorized: the reference's per-base dict insert (last chunk wins per
    (pos, index) key) becomes filter -> stable lexsort -> last-of-group
    selection, so stitching a contig is numpy throughput instead of a
    Python loop (and needs no process pool)."""
    parts = []
    stores: Dict[str, PolishPredictionStore] = {}  # one open per file
    try:
        for file_name, chunk_key, _st, _end in chunk_keys:
            store = stores.get(file_name)
            if store is None:
                store = stores[file_name] = PolishPredictionStore(
                    file_name, "r")
            for bases, positions, indices in store.read_chunks(contig,
                                                               chunk_key):
                part = _filter_part(_st, positions, indices, bases)
                if part is not None:
                    parts.append(part)
    finally:
        for store in stores.values():
            store.close()
    return _stitch_filtered(parts)


class StreamingStitcher:
    """Stage-3 stitch running BEHIND the consensus stream (contig
    watermark), removing the post-hoc store-read stitch pass entirely.

    The streamer feeds flushed predictions (post-device) straight from
    memory; when every interval of the next contig (natural order) has
    been encoded AND all its sequences flushed, that contig is stitched
    and appended to the FASTA — by the stream's end only the final
    contig's write remains. Output is byte-identical to the staged
    perform_stitch (CI-enforced, tests/test_polish.py): parts are ordered
    (region_start, region_end, str(chunk_id)), matching the staged
    (start, end)-sorted chunk keys with string-sorted sub-chunks
    (datastore.read_chunks)."""

    def __init__(self, intervals, output_path: str):
        import threading
        # note_interval (stream consumer thread) and add (store flusher
        # thread) both advance the watermark — one coarse lock serializes
        # them (stitch work only happens when a contig completes)
        self._mutex = threading.Lock()
        self._totals: Dict[str, int] = {}
        for contig, _s, _e in intervals:
            self._totals[contig] = self._totals.get(contig, 0) + 1
        self._order = sorted(self._totals, key=natural_key)
        self._seen: Dict[str, int] = {c: 0 for c in self._order}
        self._exp_seqs: Dict[str, int] = {c: 0 for c in self._order}
        self._flushed: Dict[str, int] = {c: 0 for c in self._order}
        self._parts: Dict[str, list] = {c: [] for c in self._order}
        self._head = 0
        os.makedirs(os.path.dirname(os.path.abspath(output_path)),
                    exist_ok=True)
        self.path = output_path
        self._fh = open(output_path, "w")

    def note_interval(self, contig: str, n_seqs: int) -> None:
        """Every interval reports (empty ones too) — the watermark needs
        complete per-contig accounting."""
        with self._mutex:
            self._seen[contig] += 1
            self._exp_seqs[contig] += n_seqs
            self._advance()

    def add(self, contig: str, start: int, end: int, chunk_id: int,
            position, index, bases) -> None:
        with self._mutex:
            self._parts[contig].append(
                (start, end, str(chunk_id),
                 _filter_part(start, position, index, bases)))
            self._flushed[contig] += 1
            self._advance()

    def _complete(self, contig: str) -> bool:
        return (self._seen[contig] == self._totals[contig]
                and self._flushed[contig] == self._exp_seqs[contig])

    def _advance(self) -> None:
        while self._head < len(self._order):
            contig = self._order[self._head]
            if not self._complete(contig):
                return
            self._head += 1
            entries = sorted(self._parts.pop(contig),
                             key=lambda e: (e[0], e[1], e[2]))
            _log(f"PROCESSING CONTIG: {contig}")
            _, _, seq = _stitch_filtered(
                [e[3] for e in entries if e[3] is not None])
            _log(f"FINISHED {contig}, POLISHED SEQUENCE LENGTH: {len(seq)}")
            if seq:
                self._fh.write(">" + contig + "\n")
                self._fh.write(seq + "\n")

    def finish(self) -> str:
        with self._mutex:
            self._advance()
        if self._head != len(self._order):
            missing = [c for c in self._order if not self._complete(c)]
            raise RuntimeError(
                f"streamed stitch incomplete: contigs {missing[:5]} never "
                f"finalized")
        self._fh.close()
        return self.path

    def abort(self) -> None:
        """Failure path: close and delete the partial FASTA."""
        try:
            self._fh.close()
        except Exception:
            pass
        try:
            os.remove(self.path)
        except OSError:
            pass


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
