"""Alternate alignment-based stitcher (reference StitchV2.py:50-164).

Instead of (position,index)-keyed de-dup, overlapping consensus chunks are
merged by locally aligning the overlap (same scoring as the realigner:
4/6/8/2), splicing at the first confident anchor (first match run >= 5);
unalignable overlaps fall back to joining with 10 'N's. Present-but-unused
in the reference (perform_stitch imports Stitch); exposed here via
`pepper ... stitch --stitcher v2` for parity.
"""
import ctypes
from typing import List, Tuple

from pepper_tpu.native import bamio
from pepper_tpu.polish import realign
from pepper_tpu.io.sam import OP_M, OP_I, OP_D, OP_S


def _align_overlap(ref_seq: str, query: str):
    """-> (ops [(op,len)], ref_offset) or None when no alignment."""
    lib = realign._lib()
    if lib is None:
        return None
    cap = 4096
    ops = (ctypes.c_uint8 * cap)()
    lens = (ctypes.c_int32 * cap)()
    ref_off = ctypes.c_int32(0)
    n = lib.ssw_align_one(ref_seq.encode(), len(ref_seq), query.encode(),
                          len(query), ctypes.byref(ref_off), ops, lens, cap)
    if n <= 0:
        return None
    return [(int(ops[i]), int(lens[i])) for i in range(n)], int(ref_off.value)


def get_confident_positions(cigar: List[Tuple[int, int]], ref_begin: int):
    """First match run >= 5 -> (ref_index, read_index) (StitchV2.py:50-93)."""
    ref_index = ref_begin
    read_index = 0
    for op, length in cigar:
        if op == OP_M and length >= 5:
            return ref_index, read_index
        if op in (OP_S, OP_I):
            read_index += length
        elif op == OP_D:
            ref_index += length
        elif op == OP_M:
            ref_index += length
            read_index += length
    return -1, -1


def alignment_stitch(sequence_chunks: List[Tuple[str, int, int, str]]
                     ) -> Tuple[str, int, int, str]:
    """Merge (contig, start, end, sequence) chunks (StitchV2.py:96-164)."""
    sequence_chunks = sorted(sequence_chunks, key=lambda e: (e[1], e[2]))
    contig, running_start, running_end, running_sequence = sequence_chunks[0]
    for _, this_start, this_end, this_sequence in sequence_chunks[1:]:
        if this_start < running_end:
            overlap_bases = running_end - this_start
            reference_sequence = running_sequence[-overlap_bases:]
            read_sequence = this_sequence[:overlap_bases]
            result = _align_overlap(reference_sequence, read_sequence)
            anchored = False
            if result is not None:
                cigar, ref_begin = result
                pos_a, pos_b = get_confident_positions(cigar, ref_begin)
                if pos_a != -1 and pos_b != -1:
                    left = running_sequence[:-overlap_bases]
                    overlap = reference_sequence[:pos_a]
                    right = this_sequence[pos_b:]
                    running_sequence = left + overlap + right
                    anchored = True
            if not anchored:
                running_sequence = running_sequence + 10 * "N" + this_sequence
            running_end = this_end
        else:
            # gap before this chunk (e.g. low coverage) — plain concat
            running_sequence = running_sequence + this_sequence
            running_end = this_end
    return contig, running_start, running_end, running_sequence
