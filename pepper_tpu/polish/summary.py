"""Polishing pileup encoder — parity with the reference SummaryGenerator
(pepper/modules/src/pileup_summary/summary_generator.cpp).

10-feature per-position base-frequency pileup with insert-column expansion
(genomic_pos = (position, insert_index) pairs), coverage-normalized into
uint8 (x/max(1,cov) * 254, truncating), plus train labels from a truth-read
alignment. Quirks preserved deliberately:
  - feature order: A/C/G/T REVERSE first (cols 0-3), then forward (4-7),
    then gap rev(8)/fwd(9) -- get_feature_index(base, is_reverse) maps
    reverse to 0-3 (summary_generator.cpp:16-32);
  - REF_SKIP and PAD are treated as DELETE (case fallthrough :103);
  - a D op of length k adds k to coverage at the op's START position
    (coverage[ref_position], not ref_position+i, :110);
  - truth inserts longer than the read-observed longest insert are
    truncated; shorter ones are '#'-padded (:180-188).
"""
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from pepper_tpu.io.bam_reader import TrimmedRead
from pepper_tpu.io.sam import OP_M, OP_EQ, OP_X, OP_I, OP_D, OP_N, OP_S, OP_P
from pepper_tpu.options import PolishImageOptions

_MATCH = (OP_M, OP_EQ, OP_X)
_DELETE_LIKE = (OP_D, OP_N, OP_P)  # reference case fallthrough

MAX_COLOR = PolishImageOptions.MAX_COLOR_VALUE  # 254


def get_feature_index(base: str, is_reverse: bool) -> int:
    base = base.upper()
    order = "ACGT"
    if is_reverse:
        return order.index(base) if base in order else 8
    return order.index(base) + 4 if base in order else 9


def get_labels(base: str) -> int:
    return {"A": 1, "C": 2, "G": 3, "T": 4}.get(base.upper(), 0)


def check_base(base: str) -> bool:
    return base.upper() in "ACGT*#"


class PolishSummary:
    """One region's pileup state (reference SummaryGenerator)."""

    def __init__(self, ref_seq: str, chromosome_name: str, ref_start: int,
                 ref_end: int):
        self.ref_seq = ref_seq
        self.chromosome_name = chromosome_name
        self.ref_start = ref_start
        self.ref_end = ref_end
        L = ref_end - ref_start + 1
        self._base = np.zeros((L, 10), dtype=np.float64)
        self._coverage = np.zeros(L, dtype=np.float64)
        self._longest_insert = np.zeros(L, dtype=np.int64)
        self._inserts: Dict[Tuple[int, int, int], float] = {}
        self._base_labels: Dict[int, str] = {}
        self._insert_labels: Dict[Tuple[int, int], str] = {}
        # outputs
        self.image: List[List[int]] = []
        self.labels: List[int] = []
        self.genomic_pos: List[Tuple[int, int]] = []
        self.bad_label_positions: List[int] = []

    # ------------------------------------------------------------- pileup
    def iterate_over_read(self, read: TrimmedRead, region_start: int,
                          region_end: int) -> None:
        """summary_generator.cpp:47-121."""
        read_index = 0
        ref_position = read.pos
        rev = read.is_reverse
        rs, re_ = self.ref_start, self.ref_end
        for op, length in read.cigar_tuples:
            if ref_position > region_end:
                break
            if op in _MATCH:
                start_i = 0
                if ref_position < rs:
                    start_i = min(rs - ref_position, length)
                    read_index += start_i
                    ref_position += start_i
                n = length - start_i
                lo = ref_position
                hi = min(ref_position + n - 1, re_)
                if hi >= lo:
                    k = hi - lo + 1
                    idx = np.arange(lo - rs, lo - rs + k)
                    bases = np.frombuffer(
                        read.sequence[read_index:read_index + k].encode(),
                        dtype=np.uint8)
                    cols = np.full(k, 9 if not rev else 8, dtype=np.int64)
                    order = b"ACGT"
                    for bi, byte in enumerate(order):
                        cols[bases == byte] = bi + (0 if rev else 4)
                    np.add.at(self._base, (idx, cols), 1.0)
                    self._coverage[idx] += 1.0
                read_index += n
                ref_position += n
            elif op == OP_I:
                anchor = ref_position - 1
                if rs <= anchor <= re_:
                    alt = read.sequence[read_index:read_index + length]
                    aidx = anchor - rs
                    for i, b in enumerate(alt):
                        key = (aidx, i, get_feature_index(b, rev))
                        self._inserts[key] = self._inserts.get(key, 0.0) + 1.0
                    self._longest_insert[aidx] = max(
                        self._longest_insert[aidx], len(alt))
                read_index += length
            elif op in _DELETE_LIKE:
                lo = max(ref_position, rs)
                hi = min(ref_position + length - 1, re_)
                if hi >= lo:
                    col = get_feature_index("*", rev)
                    idx = np.arange(lo - rs, hi - rs + 1)
                    np.add.at(self._base, (idx, np.full(len(idx), col)), 1.0)
                    # quirk: coverage bumps at the op start, once per base
                    if rs <= ref_position <= re_:
                        self._coverage[ref_position - rs] += float(hi - lo + 1)
                ref_position += length
            elif op == OP_S:
                read_index += length
            # OP_H: nothing

    # ------------------------------------------------------------- labels
    def generate_labels(self, read: TrimmedRead, region_start: int,
                        region_end: int) -> None:
        """summary_generator.cpp:142-216 (truth-read walk)."""
        read_index = 0
        ref_position = read.pos
        rs = self.ref_start
        for op, length in read.cigar_tuples:
            if ref_position > region_end:
                break
            if op in _MATCH:
                start_i = 0
                if ref_position < rs:
                    start_i = min(rs - ref_position, length)
                    read_index += start_i
                    ref_position += start_i
                for _ in range(start_i, length):
                    if rs <= ref_position <= self.ref_end:
                        self._base_labels[ref_position] = \
                            read.sequence[read_index]
                    read_index += 1
                    ref_position += 1
            elif op == OP_I:
                anchor = ref_position - 1
                if rs <= anchor <= self.ref_end:
                    alt = read.sequence[read_index:read_index + length]
                    for i in range(int(self._longest_insert[anchor - rs])):
                        self._insert_labels[(anchor, i)] = (
                            alt[i] if i < len(alt) else "#")
                read_index += length
            elif op in _DELETE_LIKE:
                if rs <= ref_position <= self.ref_end:
                    for i in range(length):
                        if rs <= ref_position + i <= self.ref_end:
                            self._base_labels[ref_position + i] = "*"
                ref_position += length
            elif op == OP_S:
                read_index += length

    # -------------------------------------------------------------- image
    def _generate_image(self, start_pos: int, end_pos: int) -> None:
        """summary_generator.cpp:274-306: counts normalized by coverage."""
        rs = self.ref_start
        for pos in range(start_pos, end_pos + 1):
            i = pos - rs
            cov = max(1.0, self._coverage[i])
            row = (self._base[i] / cov * MAX_COLOR).astype(np.uint8)
            self.image.append(row.tolist())
            for ii in range(int(self._longest_insert[i])):
                ins_row = [
                    int(np.uint8(self._inserts.get((i, ii, j), 0.0) / cov
                                 * MAX_COLOR))
                    for j in range(10)]
                self.image.append(ins_row)

    def generate_summary(self, reads: List[TrimmedRead], start_pos: int,
                         end_pos: int) -> None:
        """Inference-mode entry (summary_generator.cpp:370-392)."""
        for read in reads:
            if read.mapping_quality > 0:
                self.iterate_over_read(read, start_pos, end_pos)
        for pos in range(start_pos, end_pos + 1):
            self.genomic_pos.append((pos, 0))
            for ii in range(int(self._longest_insert[pos - self.ref_start])):
                self.genomic_pos.append((pos, ii + 1))
        self._generate_image(start_pos, end_pos)

    def generate_train_summary(self, reads: List[TrimmedRead],
                               start_pos: int, end_pos: int,
                               truth_read: TrimmedRead) -> None:
        """Train-mode entry (summary_generator.cpp:310-367)."""
        for read in reads:
            if read.mapping_quality > 0:
                self.iterate_over_read(read, start_pos, end_pos)
        self.generate_labels(truth_read, start_pos, end_pos + 1)
        rs = self.ref_start
        for pos in range(start_pos, end_pos + 1):
            i = pos - rs
            base_label = self._base_labels.get(pos, "\x00")
            if self._coverage[i] > 0:
                self.labels.append(get_labels(base_label))
            else:
                self.labels.append(get_labels("*"))
            if not check_base(base_label):
                self.bad_label_positions.append(len(self.labels))
            self.genomic_pos.append((pos, 0))
            for ii in range(int(self._longest_insert[i])):
                self.genomic_pos.append((pos, ii + 1))
                ins_label = self._insert_labels.get((pos, ii))
                if ins_label:
                    self.labels.append(get_labels(ins_label))
                    if not check_base(ins_label):
                        self.bad_label_positions.append(len(self.labels))
                else:
                    self.labels.append(get_labels("#"))
        self.bad_label_positions.append(len(self.labels))
        self._generate_image(start_pos, end_pos)


# ------------------------------------------------------------- chunking
def chunk_expanded_arrays(image: np.ndarray, positions: np.ndarray,
                          indices: np.ndarray, chunk_size: int,
                          chunk_overlap: int):
    """Array-backed twin of chunk_images for the native encoder's output
    (image [P,10] uint8, positions [P] int64, indices [P] int32). Returns
    (images, labels, pos_idx, chunk_ids) where each pos_idx entry is an
    int64 [chunk_size, 2] array of (position, insert_index) rows — the
    same values chunk_images emits as tuple lists, padding included.
    tests/test_polish_native.py asserts equality against the oracle."""
    n = len(positions)
    chunk_start, chunk_id = 0, 0
    chunk_end = min(n, chunk_size)
    images, labels, pos_idx, chunk_ids = [], [], [], []
    while True:
        img = image[chunk_start:chunk_end]
        pi = np.stack([positions[chunk_start:chunk_end].astype(np.int64),
                       indices[chunk_start:chunk_end].astype(np.int64)],
                      axis=1)
        padding = chunk_size - (chunk_end - chunk_start)
        if padding > 0:
            img = np.concatenate(
                [img, np.zeros((padding, image.shape[1]), image.dtype)])
            pi = np.concatenate(
                [pi, np.full((padding, 2), -1, np.int64)])
        images.append(img)
        labels.append(np.zeros(chunk_size, np.int64))
        pos_idx.append(pi)
        chunk_ids.append(chunk_id)
        chunk_id += 1
        if chunk_end == n:
            break
        chunk_start = chunk_end - chunk_overlap
        chunk_end = min(n, chunk_start + chunk_size)
    return images, labels, pos_idx, chunk_ids


def chunk_images(summary: PolishSummary, chunk_size: int, chunk_overlap: int):
    """AlignmentSummarizer.chunk_images (pepper/.../AlignmentSummarizer.py:19-56)."""
    chunk_start = 0
    chunk_id = 0
    chunk_end = min(len(summary.genomic_pos), chunk_size)
    images, labels, positions, chunk_ids = [], [], [], []
    while True:
        image_chunk = summary.image[chunk_start:chunk_end]
        pos_chunk = summary.genomic_pos[chunk_start:chunk_end]
        label_chunk = [0] * (chunk_end - chunk_start)
        padding = chunk_size - len(image_chunk)
        if padding > 0:
            label_chunk = label_chunk + [0] * padding
            pos_chunk = pos_chunk + [(-1, -1)] * padding
            image_chunk = image_chunk + \
                [[0] * PolishImageOptions.IMAGE_HEIGHT] * padding
        images.append(image_chunk)
        labels.append(label_chunk)
        positions.append(pos_chunk)
        chunk_ids.append(chunk_id)
        chunk_id += 1
        if chunk_end == len(summary.genomic_pos):
            break
        chunk_start = chunk_end - chunk_overlap
        chunk_end = min(len(summary.genomic_pos), chunk_start + chunk_size)
    return images, labels, positions, chunk_ids


def chunk_images_train(summary: PolishSummary, chunk_size: int,
                       chunk_overlap: int):
    """AlignmentSummarizer.chunk_images_train (:59-103): avoids chunks
    crossing bad-label positions; pads by shifting the window left."""
    images, labels, positions, chunk_ids = [], [], [], []
    bad_indices = summary.bad_label_positions
    chunk_start = 0
    chunk_id = 0
    for i in range(len(bad_indices)):
        chunk_end = min(chunk_start + chunk_size, bad_indices[i])
        while True:
            if chunk_end - chunk_start != chunk_size:
                padding = chunk_size - (chunk_end - chunk_start)
                chunk_start -= padding
                if chunk_start < 0:
                    break
                if i > 0 and chunk_start < bad_indices[i - 1]:
                    break
            images.append(summary.image[chunk_start:chunk_end])
            positions.append(summary.genomic_pos[chunk_start:chunk_end])
            labels.append(summary.labels[chunk_start:chunk_end])
            chunk_ids.append(chunk_id)
            chunk_id += 1
            if chunk_end == bad_indices[i]:
                break
            chunk_start = chunk_end - chunk_overlap
            chunk_end = min(bad_indices[i], chunk_start + chunk_size)
        chunk_start = chunk_end + 1
    return images, labels, positions, chunk_ids
