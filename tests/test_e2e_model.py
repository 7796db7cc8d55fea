"""Real-model end-to-end variant pipeline test (no --dry oracle).

Mirrors the reference's quickstart-with-model contract
(docs/quickstart/variant_calling_docker_quickstart.md:55-123): train a
small model on labeled synthetic images, run non-dry call_variant with it,
and assert planted-variant recall plus 5-file-split sanity. Under the test
conftest's 8 virtual CPU devices this drives the mesh-sharded DeviceRunner
branch — the production inference path (bf16 gating, int8 transfer, tail
padding) that the dry tests bypass.
"""
import glob
import os

import numpy as np
import pytest

import jax

from pepper_tpu.options import PipelineConfig
from pepper_tpu.pipelines.call_variant import call_variant
from pepper_tpu.pipelines.make_images import generate_images
from pepper_tpu.presets import set_parameters
from pepper_tpu.io.vcf import read_vcf
from tests.util.synth import (plant_variants, random_genome, simulate_reads,
                              write_dataset, write_truth_vcf)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("e2e"))
    genome = random_genome(60000, seed=61)
    variants = plant_variants(dict(genome), 25, 6, 6, seed=62)
    records = simulate_reads(genome, variants, coverage=35, seed=63,
                             error_rate=0.02)
    fasta, bam = write_dataset(tmp, genome, records)
    truth = write_truth_vcf(tmp + "/truth.vcf", genome, variants)

    config = set_parameters(PipelineConfig(
        bam=bam, fasta=fasta, output_dir=tmp,
        sub_command="make_train_images", ont_r9_guppy5_sup=True, threads=1,
        train_mode=True, truth_vcf=truth, random_draw_probability=1.0,
        image_output_directory=tmp + "/train_images/"))
    generate_images(config)

    from pepper_tpu.train.variant_train import train
    model_path = train(tmp + "/train_images/", tmp + "/train_images/",
                       tmp + "/models/", batch_size=32, epoch_limit=6,
                       step_size=25, lr=3e-4)
    return dict(tmp=tmp, fasta=fasta, bam=bam, model=model_path,
                variants=variants)


def _run(trained, out_name, **over):
    out_dir = trained["tmp"] + f"/{out_name}/"
    config = set_parameters(PipelineConfig(
        bam=trained["bam"], fasta=trained["fasta"], output_dir=out_dir,
        model_path=trained["model"], sub_command="call_variant",
        ont_r9_guppy5_sup=True, threads=2, region_size=20000))
    for k, v in over.items():
        setattr(config, k, v)
    paths = call_variant(config)
    return out_dir, paths


@pytest.mark.slow
def test_trained_model_call_variant_recall(trained):
    out_dir, paths = _run(trained, "out_stream")
    assert set(paths) == {"full", "pepper", "vc", "vc_snp", "vc_indel"}
    for p in paths.values():
        assert os.path.isfile(p), p
        assert os.path.isfile(p + ".tbi"), p + ".tbi"

    full = read_vcf(paths["full"])
    assert full, "no records in FULL VCF"
    # every record in the split files also appears in FULL
    n_split = sum(len(read_vcf(paths[k])) for k in ("pepper", "vc"))
    assert n_split == len(full)

    # recall on planted variants: the trained model must call most
    # non-hom-ref sites non-refCall at the planted SNP positions
    called = {(r.contig, r.pos) for r in full
              if "PASS" in r.filters and r.genotype() != [0, 0]}
    snps = [v for v in trained["variants"]
            if len(v.ref) == 1 and len(v.alt) == 1]
    hit = sum((v.contig, v.pos) in called for v in snps)
    recall = hit / len(snps)
    assert recall >= 0.6, f"planted-SNP recall {recall:.2f} ({hit}/{len(snps)})"


@pytest.mark.slow
def test_trained_model_staged_equals_streamed(trained):
    """The staged (run_inference on files) and streamed paths agree with a
    REAL model — covers DeviceRunner through both callers."""
    out_s, paths_s = _run(trained, "out_staged", streaming=False)
    out_f, paths_f = _run(trained, "out_fused")
    for key in paths_s:
        assert open(paths_s[key], "rb").read() == \
            open(paths_f[key], "rb").read(), f"{key} differs"


@pytest.mark.slow
def test_trained_model_multidevice_matches_forced_single(trained, monkeypatch):
    """The mesh-sharded DeviceRunner branch (8 CPU devices via conftest)
    agrees with single-device execution."""
    assert jax.local_device_count() >= 8  # conftest forces the virtual mesh
    out_multi, paths_multi = _run(trained, "out_multidev")

    import pepper_tpu.runtime.streaming as streaming

    real_count = jax.local_device_count
    monkeypatch.setattr(jax, "local_device_count", lambda *a: 1)
    try:
        out_single, paths_single = _run(trained, "out_singledev")
    finally:
        monkeypatch.setattr(jax, "local_device_count", real_count)
    for key in paths_multi:
        assert open(paths_multi[key], "rb").read() == \
            open(paths_single[key], "rb").read(), f"{key} differs"
