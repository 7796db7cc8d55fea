"""Polish stage 1 — pileup image generation over 1kb draft intervals.

Parity: pepper/modules/python/ImageGenerationUI.py (1kb intervals with
±100bp overlap, i %% threads striping, per-worker HDF file) and
AlignmentSummarizer.create_summary (reservoir downsampling, truth-read
conflict resolution in train mode, 1000-length chunking with 50 overlap).

Read realignment: the reference SSW-realigns reads to the draft before the
pileup (AlignmentSummarizer.py:159-177). Controlled here by
`realignment_flag`; pepper_tpu.polish.realign provides the aligner.
"""
import concurrent.futures
import itertools
import os
import sys
import time
from datetime import datetime
from operator import itemgetter
from typing import List, Optional, Tuple

import numpy as np

from pepper_tpu.io.bam_reader import BamReader
from pepper_tpu.io.fasta import FastaReader
from pepper_tpu.options import AlignerOptions, PolishImageOptions
from pepper_tpu.pipelines.make_images import (get_chromosome_list,
                                              reservoir_downsample)
from pepper_tpu.polish.datastore import PolishImageStore
from pepper_tpu.polish.summary import (PolishSummary, chunk_images,
                                       chunk_images_train)


def _log(msg: str) -> None:
    sys.stderr.write("[" + datetime.now().strftime("%m-%d-%Y %H:%M:%S")
                     + "] INFO: " + msg + "\n")
    sys.stderr.flush()


def build_polish_intervals(draft_fasta: str, bam: str,
                           region: Optional[str] = None,
                           max_size: int = 1000
                           ) -> List[Tuple[str, int, int]]:
    """1kb intervals ±MIN_IMAGE_OVERLAP (ImageGenerationUI.py:256-272)."""
    chr_list = get_chromosome_list(region, draft_fasta, bam)
    overlap = PolishImageOptions.MIN_IMAGE_OVERLAP
    intervals = []
    with FastaReader(draft_fasta) as fa:
        for chr_name, reg in chr_list:
            length = fa.get_chromosome_sequence_length(chr_name)
            if not reg:
                interval_start, interval_end = 0, length - 1
            else:
                interval_start = max(0, reg[0])
                interval_end = min(reg[1], length - 1)
            for pos in range(interval_start, interval_end, max_size):
                pos_start = max(interval_start, pos - overlap)
                pos_end = min(interval_end, pos + max_size + overlap)
                intervals.append((chr_name, pos_start, pos_end))
    return intervals


def remove_conflicting_regions(regions, region_start, region_end,
                               min_length=PolishImageOptions.SEQ_LENGTH,
                               length_ratio=2.0, overlap_fraction=0.5):
    """Medaka-derived truth-alignment filter (AlignmentSummarizer.py:116-157)."""
    for reg_a, reg_b in itertools.combinations(regions, 2):
        el1, el2 = sorted((reg_a, reg_b), key=itemgetter(0))
        if el1[1] > el2[0]:
            ovlp_start, ovlp_end = el2[0], el1[1]
        else:
            continue
        s, l = sorted((reg_a, reg_b),
                      key=lambda element: (element[1] - element[0]))
        length_ratio_ij = (l[1] - l[0]) / max(1, (s[1] - s[0]))
        overlap_fraction_ij = (ovlp_end - ovlp_start) / max(1, (s[1] - s[0]))
        if length_ratio_ij < length_ratio:
            if overlap_fraction_ij >= overlap_fraction:
                s[3] = False
                l[3] = False
            else:
                el1[1] = ovlp_start
                el2[0] = ovlp_end
        else:
            if overlap_fraction_ij >= overlap_fraction:
                s[3] = False
            else:
                el2[0] = ovlp_end
    for al in regions:
        al[0] = max(region_start, al[0])
        al[1] = min(region_end, al[1])
    filtered = [al for al in regions if (al[3] and al[1] - al[0] >= min_length)]
    filtered.sort(key=itemgetter(0))
    return filtered


def create_polish_summary(bam: BamReader, fasta: FastaReader,
                          chromosome: str, region_start: int, region_end: int,
                          train_mode: bool = False,
                          truth_bam: Optional[BamReader] = None,
                          downsample_rate: float = 1.0,
                          realignment_flag: bool = True):
    """AlignmentSummarizer.create_summary (pepper/.../AlignmentSummarizer.py:179-362)."""
    from pepper_tpu.polish import realign
    all_images, all_labels, all_positions, all_chunk_ids = [], [], [], []
    seq_len = PolishImageOptions.SEQ_LENGTH
    seq_overlap = PolishImageOptions.SEQ_OVERLAP
    max_reads = PolishImageOptions.MAX_READS_IN_REGION

    if not train_mode and not os.environ.get("PEPPER_TPU_NO_NATIVE"):
        # fused native path: fetch + downsample + realign + pileup run in
        # one C++ call with the GIL released (polish_encode.cpp); the
        # Python branch below stays as the tested oracle
        from pepper_tpu.native import polish_encoder
        if polish_encoder.available():
            from pepper_tpu.polish.summary import chunk_expanded_arrays
            ref_end = region_end + AlignerOptions.ALIGNMENT_SAFE_BASES
            realign_ref = fasta.get_reference_sequence(
                chromosome, region_start, ref_end)
            result = polish_encoder.polish_encode_native(
                bam, chromosome, region_start, region_end, realign_ref,
                realignment_flag, max_reads=max_reads)
            if result is None:
                return [], [], [], []
            image, positions, indices = result
            return chunk_expanded_arrays(image, positions, indices,
                                         seq_len, seq_overlap)

    def realigned(reads, start, end):
        if not realignment_flag or not reads:
            return reads
        ref_end = end + AlignerOptions.ALIGNMENT_SAFE_BASES
        ref_seq = fasta.get_reference_sequence(chromosome, start, ref_end)
        return realign.align_reads_to_reference(reads, ref_seq, start)

    if train_mode:
        truth_reads = truth_bam.get_reads(chromosome, region_start,
                                          region_end, True, 60, 0)
        truth_reads = realigned(truth_reads, region_start, region_end)
        truth_regions = [[r.pos, r.pos_end - 1, r, True] for r in truth_reads]
        truth_regions = remove_conflicting_regions(
            truth_regions, region_start, region_end)
        if not truth_regions:
            return [], [], [], []
        for t_start, t_end, truth_read, is_kept in truth_regions:
            if not is_kept:
                continue
            ref_seq = fasta.get_reference_sequence(chromosome, t_start,
                                                   t_end + 1)
            reads = bam.get_reads(chromosome, max(0, t_start), t_end,
                                  False, 0, 0)
            if not reads:
                continue
            reads = reservoir_downsample(reads, downsample_rate,
                                         max_reads=max_reads)
            reads = realigned(reads, t_start, t_end)
            summary = PolishSummary(ref_seq, chromosome, t_start, t_end)
            summary.generate_train_summary(reads, t_start, t_end, truth_read)
            images, labels, positions, chunk_ids = chunk_images_train(
                summary, seq_len, seq_overlap)
            all_images.extend(images)
            all_labels.extend(labels)
            all_positions.extend(positions)
            all_chunk_ids.extend(chunk_ids)
    else:
        reads = bam.get_reads(chromosome, max(0, region_start), region_end,
                              False, 0, 0)
        if not reads:
            return [], [], [], []
        reads = reservoir_downsample(reads, 1.0, max_reads=max_reads)
        reads = realigned(reads, region_start, region_end)
        ref_seq = fasta.get_reference_sequence(chromosome, region_start,
                                               region_end + 1)
        summary = PolishSummary(ref_seq, chromosome, region_start, region_end)
        summary.generate_summary(reads, region_start, region_end)
        images, labels, positions, chunk_ids = chunk_images(
            summary, seq_len, seq_overlap)
        all_images.extend(images)
        all_labels.extend(labels)
        all_positions.extend(positions)
        all_chunk_ids.extend(chunk_ids)
    return all_images, all_labels, all_positions, all_chunk_ids


def split_position_index(positions_i):
    """(position, index) halves of one chunk's coordinate payload, which is
    an [N, 2] array on the native path and (pos, idx) pairs on the oracle
    path. Shared by the staged worker and the fused stream."""
    if isinstance(positions_i, np.ndarray):
        return positions_i[:, 0], positions_i[:, 1]
    position, index = zip(*positions_i)
    return np.asarray(position), np.asarray(index)


def _worker(args, all_intervals, total_threads: int, thread_id: int) -> int:
    (output_path, bam_file, draft_file, truth_bam_file, train_mode,
     downsample_rate, realignment_flag) = args
    timestr = time.strftime("%m%d%Y_%H%M%S")
    file_name = os.path.join(
        output_path, f"pepper_polish_images_thread_{thread_id}_{timestr}.hdf")
    intervals = [r for i, r in enumerate(all_intervals)
                 if i % total_threads == thread_id]
    with BamReader(bam_file) as bam, FastaReader(draft_file) as fasta, \
            PolishImageStore(file_name, "w") as store:
        truth = BamReader(truth_bam_file) if truth_bam_file else None
        try:
            for chr_name, start, end in intervals:
                images, labels, positions, chunk_ids = create_polish_summary(
                    bam, fasta, chr_name, start, end, train_mode, truth,
                    downsample_rate, realignment_flag)
                region = (chr_name, start, end)
                for i, image in enumerate(images):
                    position, index = split_position_index(positions[i])
                    name = f"{chr_name}_{start}_{end}_{chunk_ids[i]}"
                    store.write_summary(region, image, labels[i], position,
                                        index, chunk_ids[i], name)
        finally:
            if truth:
                truth.close()
    return thread_id


def generate_polish_images(bam_file: str, draft_file: str, output_dir: str,
                           region: Optional[str] = None, threads: int = 1,
                           train_mode: bool = False,
                           truth_bam: Optional[str] = None,
                           downsample_rate: float = 1.0,
                           realignment_flag: bool = True) -> str:
    os.makedirs(output_dir, exist_ok=True)
    intervals = build_polish_intervals(draft_file, bam_file, region)
    _log(f"TOTAL INTERVALS: {len(intervals)}")
    args = (output_dir, bam_file, draft_file, truth_bam, train_mode,
            downsample_rate, realignment_flag)
    t0 = time.time()
    if threads <= 1:
        _worker(args, intervals, 1, 0)
    else:
        # share-nothing threads, not fork: the fused native encoder
        # (polish_encode.cpp) releases the GIL for the whole
        # fetch+realign+pileup, and fork after JAX init risks deadlock
        with concurrent.futures.ThreadPoolExecutor(max_workers=threads) as pool:
            futures = [pool.submit(_worker, args, intervals, threads, tid)
                       for tid in range(threads)]
            for fut in concurrent.futures.as_completed(futures):
                exc = fut.exception()
                if exc is not None:
                    raise RuntimeError(f"polish image shard failed: {exc}") \
                        from exc
    _log(f"FINISHED IMAGE GENERATION [{time.time() - t0:.1f}s]")
    return output_dir


def create_polish_summaries_multi(bam: BamReader, fasta: FastaReader,
                                  chromosome: str, intervals,
                                  realignment_flag: bool = True):
    """Native multi-interval twin of create_polish_summary for the
    streamed producer: ONE BAM fetch + decode serves a group of
    contiguous intervals (polish_encode_multi), removing the
    read_length/interval_length decode amplification. Returns one
    (images, labels, positions, chunk_ids) tuple per interval —
    bit-identical to per-interval create_polish_summary calls
    (tests/test_polish_native.py). Falls back to per-interval calls
    when the native library is unavailable."""
    from pepper_tpu.native import polish_encoder
    if os.environ.get("PEPPER_TPU_NO_NATIVE") or \
            not polish_encoder.available():
        return [create_polish_summary(bam, fasta, chromosome, s, e,
                                      realignment_flag=realignment_flag)
                for s, e in intervals]
    from pepper_tpu.polish.summary import chunk_expanded_arrays
    seq_len = PolishImageOptions.SEQ_LENGTH
    seq_overlap = PolishImageOptions.SEQ_OVERLAP
    max_reads = PolishImageOptions.MAX_READS_IN_REGION
    safe = AlignerOptions.ALIGNMENT_SAFE_BASES
    contig_len = fasta.get_chromosome_sequence_length(chromosome)
    span_start = min(s for s, _e in intervals)
    span_ref_end = max(e for _s, e in intervals) + safe
    span_ref = fasta.get_reference_sequence(chromosome, span_start,
                                            span_ref_end)
    # the realignment ref length each per-interval call would have seen
    # (get_reference_sequence clips [start, stop) to the contig)
    ref_lens = [max(0, min(e + safe, contig_len) - s)
                for s, e in intervals]
    results = polish_encoder.polish_encode_multi_native(
        bam, chromosome, intervals, span_ref, span_start, ref_lens,
        realignment_flag, max_reads=max_reads)
    out = []
    for res in results:
        if res is None:
            out.append(([], [], [], []))
            continue
        image, positions, indices = res
        out.append(chunk_expanded_arrays(image, positions, indices,
                                         seq_len, seq_overlap))
    return out
