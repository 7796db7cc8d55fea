"""Stage 3 — prediction post-processing into candidate variants + VCFs.

Parity source: pepper_variant/modules/python/CandidateFinder.py (homopolymer
repeat annotation, Margin-SNP list + DeepVariant list with per-type p-value
thresholds and frequency overrides, positional de-dup) and FindCandidates.py
(driver + 5-VCF output + telemetry counts).
"""
import concurrent.futures
import os
import sys
import time
from collections import defaultdict
from datetime import datetime
from typing import Dict, List, Optional, Tuple

import numpy as np

from pepper_tpu.io.fasta import FastaReader
from pepper_tpu.io.vcf import VCFWriteEngine
from pepper_tpu.options import PipelineConfig
from pepper_tpu.pipelines.datastore import (PredictionStore,
                                            iter_prediction_batches)
from pepper_tpu.runtime.inference import image_files


def repeat_annotation(sequence: str, kmer_size: int) -> List[int]:
    """k-mer repeat counts per position (CandidateFinder.py:279-297).

    For kmer_size=1 (the only size the live candidate path uses) the
    reference's O(n^2) scan reduces exactly to per-position homopolymer
    run length: every position inside a maximal run of length L observes
    max(1, L) — computed here in one O(n) pass."""
    n = len(sequence)
    if kmer_size == 1:
        out = [1] * n
        i = 0
        while i < n:
            j = i + 1
            while j < n and sequence[j] == sequence[i]:
                j += 1
            if j - i > 1:
                out[i:j] = [j - i] * (j - i)
            i = j
        return out
    max_observed = [1] * n
    for i in range(n - (kmer_size - 1)):
        kmer_count = 0
        end_index = i + (kmer_size - 1)
        for j in range(i, n, kmer_size):
            if sequence[i:i + kmer_size] == sequence[j:j + kmer_size]:
                kmer_count += 1
            else:
                break
            end_index = j + kmer_size
        for k in range(i, min(n, end_index)):
            max_observed[k] = max(max_observed[k], kmer_count)
    return max_observed


_ACGT = frozenset("ACGT")


def _valid_allele(allele: str) -> bool:
    if len(allele) == 1:  # the overwhelmingly common case (SNPs)
        return allele in _ACGT
    return not (set(allele) - _ACGT)


class _ContigSpanCache:
    """One FASTA fetch per (contig, batch position span) instead of three
    per candidate: candidates arrive batch-grouped and position-ordered, so
    a single span read serves every up/downstream slice in the batch."""

    def __init__(self, fasta: FastaReader):
        self._fasta = fasta
        self._contig: Optional[str] = None
        self._lo = 0
        self._seq = ""

    _AHEAD = 1 << 16   # over-fetch on miss: positions ascend within regions

    def load(self, contig: str, lo: int, hi: int) -> None:
        lo = max(0, lo)
        if (contig == self._contig and self._lo <= lo
                and hi <= self._lo + len(self._seq)):
            return
        self._contig, self._lo = contig, lo
        self._seq = self._fasta.get_reference_sequence(
            contig, lo, max(hi, lo + self._AHEAD)).upper()

    def slice(self, lo: int, hi: int) -> str:
        """[lo, hi) clamped to the loaded span (contig-end truncation has
        the same effect as the reference's per-call clamping)."""
        lo = max(lo, self._lo)
        return self._seq[lo - self._lo:hi - self._lo]


def small_chunk_stitch(config: PipelineConfig,
                       file_chunks: List[Tuple[str, str]]):
    """Per-(file,batch) candidate selection (CandidateFinder.py:356-531)."""
    fasta = FastaReader(config.fasta)
    span = _ContigSpanCache(fasta)
    margin_list = []
    deepvariant_list = []
    for file_name, batch_key in file_chunks:
        with PredictionStore(file_name, "r") as store:
            batch = store.read_batch(batch_key)
        # vectorized per-row reductions + one bulk tolist(): touching numpy
        # scalars per candidate dominated this stage
        all_genotypes = np.argmax(batch.base_prediction, axis=1).tolist()
        all_values = batch.base_prediction[
            np.arange(len(all_genotypes)), all_genotypes].tolist()
        all_non_alt = np.maximum(batch.base_prediction[:, 1],
                                 batch.base_prediction[:, 2]).tolist()
        all_preds = batch.base_prediction.tolist()
        all_positions = np.asarray(batch.positions).tolist()
        all_depths = np.asarray(batch.depths).tolist()
        freq_rows = np.atleast_2d(np.asarray(batch.candidate_frequency))
        all_freqs = (freq_rows.tolist() if freq_rows.shape[0] == len(all_preds)
                     else [[int(f)] for f in np.ravel(
                         batch.candidate_frequency).tolist()])
        for i in range(len(batch.contigs)):
            contig = batch.contigs[i]
            position = all_positions[i]
            depth = all_depths[i]
            cand_strings = batch.candidates[i]
            cand_freqs = all_freqs[i]
            prediction_base = all_preds[i]

            span.load(contig, position - 10, position + 10)
            reference_base = span.slice(position, position + 1)
            reference_upstream = span.slice(position, position + 10)
            reference_downstream = span.slice(max(0, position - 10), position)
            full_sequence = reference_downstream + reference_upstream

            homopolymer_repeats = repeat_annotation(full_sequence, 1)
            position_index = len(reference_downstream)
            up = min(len(homopolymer_repeats), position_index + 4)
            down = max(0, position_index - 5)
            candidate_in_repeat = max(homopolymer_repeats[down:up]) >= 5

            if reference_base not in "ACGT":
                continue

            predicted_genotype = all_genotypes[i]
            genotype = ([0, 0], [0, 1], [1, 1])[predicted_genotype]
            prediction_value = all_values[i]

            # Margin list: SNPs only, non-hom-ref prediction
            alt_alleles, support = [], []
            for alt_allele, freq in zip(cand_strings, cand_freqs):
                alt_type, allele = alt_allele[0], alt_allele[1:]
                if not _valid_allele(allele):
                    continue
                if alt_type == "1" and predicted_genotype != 0:
                    alt_alleles.append(allele)
                    support.append(freq)
            if alt_alleles:
                margin_list.append((
                    contig, position, position + 1, reference_base,
                    alt_alleles, genotype, depth, support,
                    prediction_value, prediction_base))

            # DeepVariant list: per-type p-value gates + freq overrides
            alt_alleles, support = [], []
            reference_allele = reference_base
            non_alt_predictions = []
            for alt_allele, freq in zip(cand_strings, cand_freqs):
                alt_type, allele = alt_allele[0], alt_allele[1:]
                if not _valid_allele(allele):
                    continue
                vaf = freq / depth if depth else 0.0
                non_alt_prediction = all_non_alt[i]
                non_alt_predictions.append(non_alt_prediction)
                if alt_type == "1":
                    if (not candidate_in_repeat
                            and non_alt_prediction >= config.snp_p_value):
                        alt_alleles.append(allele); support.append(freq)
                    elif (candidate_in_repeat
                          and non_alt_prediction >= config.snp_p_value_in_lc):
                        alt_alleles.append(allele); support.append(freq)
                    elif 0 < config.report_snp_above_freq <= vaf:
                        alt_alleles.append(allele); support.append(freq)
                elif alt_type == "2":
                    if (not candidate_in_repeat
                            and non_alt_prediction >= config.insert_p_value):
                        alt_alleles.append(allele); support.append(freq)
                    elif (candidate_in_repeat
                          and non_alt_prediction >= config.insert_p_value_in_lc):
                        alt_alleles.append(allele); support.append(freq)
                    elif 0 < config.report_indel_above_freq <= vaf:
                        alt_alleles.append(allele); support.append(freq)
                elif alt_type == "3":
                    if (not candidate_in_repeat
                            and non_alt_prediction >= config.delete_p_value):
                        alt_alleles.append(reference_allele)
                        reference_allele = allele
                        support.append(freq)
                    elif (candidate_in_repeat
                          and non_alt_prediction >= config.delete_p_value_in_lc):
                        alt_alleles.append(reference_allele)
                        reference_allele = allele
                        support.append(freq)
                    elif 0 < config.report_indel_above_freq <= vaf:
                        alt_alleles.append(allele); support.append(freq)
            if alt_alleles:
                deepvariant_list.append((
                    contig, position, position + len(reference_allele),
                    reference_allele, alt_alleles, genotype, depth, support,
                    prediction_value, prediction_base,
                    non_alt_predictions, candidate_in_repeat))
    fasta.close()
    return margin_list, deepvariant_list


def _chunks(pairs: List, size: int) -> List[List]:
    return [pairs[i:i + size] for i in range(0, len(pairs), size)]


def collect_candidate_lists(config: PipelineConfig,
                            pairs: List[Tuple[str, str]]):
    """Raw (margin, dv) candidate lists over (file, batch) pairs, fanned out
    over the process pool (CandidateFinder.find_candidates:532-547)."""
    margin_all, dv_all = [], []
    # the pool pays fork + result-pickling costs; below ~4 batches per
    # worker a single pass through the (already vectorized) loop is faster
    if config.threads > 1 and len(pairs) >= 4 * config.threads:
        chunk_size = max(2, len(pairs) // config.threads + 1)
        with concurrent.futures.ProcessPoolExecutor(
                max_workers=config.threads) as pool:
            futures = [pool.submit(small_chunk_stitch, config, c)
                       for c in _chunks(pairs, chunk_size)]
            for fut in concurrent.futures.as_completed(futures):
                exc = fut.exception()
                if exc is not None:
                    raise RuntimeError(
                        f"candidate-finding shard failed: {exc}") from exc
                m, d = fut.result()
                margin_all.extend(m)
                dv_all.extend(d)
    else:
        margin_all, dv_all = small_chunk_stitch(config, pairs)
    return margin_all, dv_all


def aggregate_candidates(margin_all: list, dv_all: list):
    """Global sort + positional de-dup into per-site dicts
    (CandidateFinder.find_candidates:548-581). Input list order only needs
    to be stable within a (contig, position) key — each key is produced by
    exactly one batch, so any concatenation of per-worker/per-host shard
    lists aggregates identically."""
    margin_all = sorted(margin_all, key=lambda x: (x[0], x[1]))
    dv_all = sorted(dv_all, key=lambda x: (x[0], x[1]))

    margin_dict = defaultdict(list)
    margin_alts = defaultdict(list)
    for cand in margin_all:
        key, pair = (cand[0], cand[1]), (cand[3], cand[4][0])
        if pair in margin_alts[key]:
            continue
        margin_alts[key].append(pair)
        margin_dict[key].append(cand)

    contigs = []
    dv_dict = defaultdict(list)
    dv_alts = defaultdict(list)
    for cand in dv_all:
        if cand[0] not in contigs:
            contigs.append(cand[0])
        key, pair = (cand[0], cand[1]), (cand[3], cand[4][0])
        if pair in dv_alts[key]:
            continue
        dv_alts[key].append(pair)
        dv_dict[key].append(cand)
    return contigs, margin_dict, dv_dict


def find_candidates(config: PipelineConfig, prediction_files: List[str]):
    """Single-host aggregation (CandidateFinder.find_candidates:532-581)."""
    pairs = list(iter_prediction_batches(prediction_files))
    margin_all, dv_all = collect_candidate_lists(config, pairs)
    return aggregate_candidates(margin_all, dv_all)


def _log(msg: str) -> None:
    sys.stderr.write("[" + datetime.now().strftime("%m-%d-%Y %H:%M:%S")
                     + "] INFO: " + msg + "\n")
    sys.stderr.flush()


def process_candidates(config: PipelineConfig, input_dir: str,
                       output_dir: str,
                       shard_batches_by_host: bool = False) -> Dict[str, str]:
    """Stage-3 driver (FindCandidates.candidate_finder). Returns VCF paths.

    Multi-host: every host selects candidates over its shard of prediction
    batches; the lists are gathered through the shared output dir
    (multihost.gather_candidate_lists — the pipeline's one sync point) and
    host 0 assembles the global 5-VCF set. Non-zero hosts return {}.

    shard_batches_by_host: stripe (file, batch) pairs across hosts — for
    standalone runs on a shared prediction dir. Inside call_variant each
    host's input_dir already holds only its own predictions."""
    from pepper_tpu.parallel import multihost

    multihost.initialize_from_config(config)
    os.makedirs(output_dir, exist_ok=True)
    prediction_files = image_files(input_dir) or sorted(
        os.path.join(input_dir, f) for f in os.listdir(input_dir)
        if f.endswith("hdf"))
    t0 = time.time()
    _log("STARTING CANDIDATE FINDING.")
    pairs = list(iter_prediction_batches(prediction_files))
    if shard_batches_by_host and multihost.host_count() > 1:
        pairs = multihost.host_shard(pairs)
        _log(f"HOST {multihost.host_index()}/{multihost.host_count()}: "
             f"{len(pairs)} PREDICTION BATCHES IN SHARD")
    margin_all, dv_all = collect_candidate_lists(config, pairs)
    gathered = multihost.gather_candidate_lists(output_dir, margin_all,
                                                dv_all)
    if gathered is None:  # non-zero host: shard shipped, host 0 writes VCFs
        _log(f"HOST {multihost.host_index()}: CANDIDATE SHARD COMPLETE "
             f"[{time.time() - t0:.1f}s]")
        return {}
    contigs, _margin, dv_candidates = aggregate_candidates(*gathered)

    with FastaReader(config.fasta) as fa:
        fasta_contigs = [(name, fa.get_chromosome_sequence_length(name))
                         for name in fa.get_chromosome_names()]
    writer = VCFWriteEngine(fasta_contigs, config.sample_name,
                            output_dir if output_dir.endswith("/")
                            else output_dir + "/")
    totals = writer.write_vcf_records(dv_candidates, config)
    writer.close()
    _log(f"TOTAL CANDIDATES FOUND: {totals[0]}")
    _log(f"TOTAL VARIANTS IN PEPPER: {totals[1]}")
    _log(f"TOTAL VARIANTS SELECTED FOR RE-GENOTYPING: {totals[2]}")
    _log(f"TOTAL SNP VARIANTS SELECTED FOR RE-GENOTYPING: {totals[3]}")
    _log(f"TOTAL INDEL VARIANTS SELECTED FOR RE-GENOTYPING: {totals[4]}")
    _log(f"TOTAL TIME SPENT ON CANDIDATE FINDING: {time.time() - t0:.1f}s")
    return writer.paths
