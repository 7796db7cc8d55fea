"""End-to-end pipeline tests using the oracle ('--dry') backend.

Reproduces the reference's only integration-test mechanism
(predict_distributed_cpu_fake.py): labeled images' type labels become
one-hot predictions, exercising images -> predictions -> candidates -> VCF
without a trained model. Planted variants must come back as correctly
genotyped VCF records.
"""
import os

import numpy as np
import pytest

from pepper_tpu.io.vcf import read_vcf
from pepper_tpu.options import PipelineConfig
from pepper_tpu.pipelines.find_candidates import process_candidates
from pepper_tpu.pipelines.make_images import generate_images
from pepper_tpu.pipelines.merge_variants import merge_variants
from pepper_tpu.presets import set_parameters
from pepper_tpu.runtime.inference import run_inference
from tests.util.synth import (plant_variants, random_genome, simulate_reads,
                              write_dataset, write_truth_vcf)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("e2e"))
    genome = random_genome(20000, seed=11)
    variants = plant_variants(dict(genome), n_snp=6, n_ins=3, n_del=3, seed=17)
    records = simulate_reads(genome, variants, coverage=40, seed=23)
    fasta, bam = write_dataset(tmp, genome, records)
    truth = write_truth_vcf(os.path.join(tmp, "truth.vcf"), genome, variants)
    return dict(tmp=tmp, genome=genome, variants=variants, fasta=fasta,
                bam=bam, truth=truth)


def make_config(dataset, **over) -> PipelineConfig:
    config = PipelineConfig(
        bam=dataset["bam"], fasta=dataset["fasta"],
        output_dir=dataset["tmp"] + "/out/",
        sub_command="call_variant", ont_r9_guppy5_sup=True,
        threads=1, dry=True, train_mode=True, truth_vcf=dataset["truth"],
        random_draw_probability=1.0)
    config = set_parameters(config)
    for k, v in over.items():
        setattr(config, k, v)
    return config


@pytest.fixture(scope="module")
def pipeline_outputs(dataset):
    config = make_config(dataset)
    image_dir = dataset["tmp"] + "/images/"
    pred_dir = dataset["tmp"] + "/preds/"
    out_dir = dataset["tmp"] + "/out/"
    config.image_output_directory = image_dir
    generate_images(config)
    run_inference(config, image_dir, pred_dir)
    paths = process_candidates(config, pred_dir, out_dir)
    return config, paths


def test_images_written(pipeline_outputs, dataset):
    config, _ = pipeline_outputs
    files = os.listdir(config.image_output_directory)
    assert any(f.endswith(".hdf5") for f in files)


def test_planted_variants_called(pipeline_outputs, dataset):
    _, paths = pipeline_outputs
    records = read_vcf(paths["full"])
    by_pos = {(r.contig, r.pos): r for r in records}
    missed = []
    for v in dataset["variants"]:
        rec = by_pos.get((v.contig, v.pos))
        if rec is None:
            missed.append(v)
            continue
        # allele must match the planted variant
        assert v.alt in rec.alts, (v, rec)
        want_gt = sorted(v.genotype)
        got_gt = sorted(rec.genotype())
        alt_index = rec.alts.index(v.alt) + 1
        want = [0, alt_index] if want_gt == [0, 1] else [alt_index, alt_index]
        assert got_gt == want, (v, rec)
    assert not missed, f"planted variants missing from VCF: {missed}"


def test_five_vcf_split_files_exist(pipeline_outputs):
    _, paths = pipeline_outputs
    for key, path in paths.items():
        assert os.path.isfile(path), key
        assert os.path.isfile(path + ".tbi"), key
    # with oracle confidence=1.0, qual is high: nothing should fail cutoffs
    pepper_records = read_vcf(paths["pepper"])
    assert pepper_records, "high-confidence calls should stay in PEPPER set"


def test_no_false_positives_with_oracle(pipeline_outputs, dataset):
    _, paths = pipeline_outputs
    planted = {(v.contig, v.pos) for v in dataset["variants"]}
    for rec in read_vcf(paths["full"]):
        if rec.genotype() != [0, 0]:
            assert (rec.contig, rec.pos) in planted, rec


def test_merge_variants_positional_overlay(pipeline_outputs, dataset):
    config, paths = pipeline_outputs
    out = merge_variants(paths["pepper"], paths["full"], None, None,
                         dataset["tmp"])
    merged = read_vcf(out)
    assert merged
    # every merged record that exists in the DV file carries C=DV
    for rec in merged:
        c = rec.samples[0][rec.format.index("C")]
        assert c == "DV"  # overlaying full onto pepper: all positions match


def test_run_inference_empty_dir(dataset, tmp_path):
    config = make_config(dataset)
    empty = str(tmp_path / "noimages")
    os.makedirs(empty)
    out = run_inference(config, empty, str(tmp_path / "preds"))
    assert os.path.isfile(out)


def test_multi_contig_pipeline(tmp_path):
    """Two contigs end to end: per-contig candidates, VCF ordering, tabix."""
    tmp = str(tmp_path)
    genome = random_genome(8000, seed=101, n_contigs=2)
    variants = plant_variants(dict(genome), n_snp=3, n_ins=1, n_del=1,
                              seed=103)
    records = simulate_reads(genome, variants, coverage=35, seed=107)
    fasta, bam = write_dataset(tmp, genome, records)
    truth = write_truth_vcf(os.path.join(tmp, "truth.vcf"), genome, variants)
    from pepper_tpu.presets import set_parameters
    config = set_parameters(PipelineConfig(
        bam=bam, fasta=fasta, output_dir=tmp + "/out/",
        sub_command="call_variant", ont_r9_guppy5_sup=True, threads=1,
        dry=True, train_mode=True, truth_vcf=truth,
        random_draw_probability=1.0,
        image_output_directory=tmp + "/images/"))
    generate_images(config)
    run_inference(config, tmp + "/images/", tmp + "/preds/")
    paths = process_candidates(config, tmp + "/preds/", tmp + "/out/")
    records_out = read_vcf(paths["full"])
    contigs_seen = {r.contig for r in records_out}
    assert contigs_seen == {"contig1", "contig2"}
    by_pos = {(r.contig, r.pos): r for r in records_out}
    for v in variants:
        assert (v.contig, v.pos) in by_pos, v
        assert v.alt in by_pos[(v.contig, v.pos)].alts


def test_region_bed_restricts_output(tmp_path, dataset):
    """Train-mode bed intersection: only candidates inside the bed appear."""
    tmp = str(tmp_path)
    bed = os.path.join(tmp, "regions.bed")
    with open(bed, "w") as fh:
        fh.write("contig1\t0\t10000\n")
    config = make_config(dataset, region_bed=bed)
    config.image_output_directory = tmp + "/images/"
    generate_images(config)
    run_inference(config, tmp + "/images/", tmp + "/preds/")
    paths = process_candidates(config, tmp + "/preds/", tmp + "/out/")
    recs = read_vcf(paths["full"])
    assert recs, "bed-restricted run should still find in-bed variants"
    assert all(r.pos < 10000 for r in recs)
    in_bed = [v for v in dataset["variants"] if v.pos < 9900]
    by_pos = {(r.contig, r.pos) for r in recs}
    for v in in_bed:
        assert (v.contig, v.pos) in by_pos


def test_stage3_pool_after_jax_init(tmp_path, dataset):
    """Staged stage 3's process pool must be fork-safe: it runs AFTER
    device inference initialized JAX in the parent. The pool uses a spawn
    context (find_candidates.collect_candidate_lists); with fork it can
    deadlock on XLA runtime state. Asserts the pooled result matches the
    serial path exactly."""
    import jax
    import jax.numpy as jnp

    from pepper_tpu.pipelines import find_candidates as fc
    from pepper_tpu.pipelines.datastore import (PredictionStore,
                                                iter_prediction_batches)

    # initialize JAX in this process (the hazard the spawn context avoids)
    jax.jit(lambda x: x + 1)(jnp.ones((4,))).block_until_ready()

    pred_path = str(tmp_path / "preds.hdf")
    rng = np.random.default_rng(31)
    with PredictionStore(pred_path, "w") as store:
        for b in range(16):
            positions = np.arange(200 + 400 * b, 200 + 400 * b + 3)
            n = len(positions)
            preds = np.full((n, 3), 0.01)
            preds[:, 1] = 0.98
            store.write_prediction(
                b, ["contig1"] * n, positions,
                np.full(n, 30, np.uint8),
                [[ "1" + "ACGT"[int(rng.integers(4))] ] for _ in range(n)],
                np.full((n, 1), 25, np.uint8), preds)

    config = make_config(dataset, threads=2)
    pairs = list(iter_prediction_batches([pred_path]))
    assert len(pairs) >= 4 * config.threads, "pool path must be exercised"
    pooled = fc.collect_candidate_lists(config, pairs)
    config.threads = 1
    serial = fc.collect_candidate_lists(config, pairs)
    assert sorted(pooled[0]) == sorted(serial[0])
    assert sorted(pooled[1]) == sorted(serial[1])
    assert pooled[1], "synthetic batches should produce DV candidates"


def test_vectorized_gates_match_scalar_loop(tmp_path):
    """The single-allele vectorized gate fast path (find_candidates.py)
    produces exactly the same (margin, deepvariant) lists as the scalar
    reference-parity loop over fuzzed candidates spanning every gate:
    SNP/INS/DEL types, low-complexity spans, invalid ref bases and
    alleles, zero depths, freq overrides, and unknown type codes."""
    from pepper_tpu.io.fasta import write_fasta
    from pepper_tpu.io.fasta import FastaReader
    from pepper_tpu.pipelines import find_candidates as fc
    from tests.util.synth import random_genome

    rng = np.random.default_rng(5)
    seq = list(random_genome(3000, seed=6)[0][1])
    for start in range(100, 2900, 300):          # homopolymers -> in_repeat
        seq[start:start + 7] = "T" * 7
    for start in range(250, 2900, 500):          # invalid reference bases
        seq[start] = "N"
    fasta_path = str(tmp_path / "ref.fa")
    write_fasta(fasta_path, [("chr1", "".join(seq))])

    n = 500
    positions = np.sort(rng.choice(np.arange(10, 2990), n, replace=False))
    alleles = ["1A", "1C", "1G", "1T", "2AT", "2ACG", "3AA", "3ACTG",
               "1N", "2AN", "3AN", "0A", "4T", "1", "2"]
    contigs = ["chr1"] * n
    cand_lists = [[str(rng.choice(alleles))] for _ in range(n)]
    depths = [int(rng.integers(0, 50)) for _ in range(n)]
    freqs = [[int(rng.integers(0, max(1, d) + 1))] for d in depths]
    preds = rng.random((n, 3)) ** 3
    preds /= preds.sum(axis=1, keepdims=True)

    config = set_parameters(PipelineConfig(
        sub_command="find_candidates", ont_r9_guppy5_sup=True))
    config.report_snp_above_freq = 0.2       # exercise the freq overrides
    config.report_indel_above_freq = 0.15

    def run():
        with FastaReader(fasta_path) as fa:
            span = fc._ContigSpanCache(fa)
            margin, dv = [], []
            fc.batch_candidates(config, span, contigs, positions, depths,
                                cand_lists, freqs, preds, margin, dv)
        return margin, dv

    fast = run()
    fc._FORCE_LOOP = True
    try:
        slow = run()
    finally:
        fc._FORCE_LOOP = False
    assert fast[0] == slow[0]
    assert fast[1] == slow[1]
    assert fast[0] and fast[1], "fuzz should produce non-empty lists"
