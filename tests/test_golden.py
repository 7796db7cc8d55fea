"""Golden-output regression test (the reference's de-facto QA strategy,
SURVEY.md §4: pinned datasets + expected outputs).

A fixed-seed synthetic dataset runs through the full oracle pipeline; the
FULL VCF's records must equal the committed golden byte-for-byte. Any
semantic change to IO, encoder, thresholds, or VCF emission shows up here.
Regenerate deliberately with:
    python tests/test_golden.py --regenerate
"""
import os
import sys

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "quickstart_full.vcf")


def _run_pipeline(tmp):
    from pepper_tpu.io.vcf import read_vcf
    from pepper_tpu.options import PipelineConfig
    from pepper_tpu.pipelines.find_candidates import process_candidates
    from pepper_tpu.pipelines.make_images import generate_images
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.runtime.inference import run_inference
    from pepper_tpu.io.bgzf import BGZFReader
    from tests.util.synth import (plant_variants, random_genome,
                                  simulate_reads, write_dataset,
                                  write_truth_vcf)
    genome = random_genome(25000, seed=2024)
    variants = plant_variants(dict(genome), n_snp=8, n_ins=4, n_del=4,
                              seed=2025)
    records = simulate_reads(genome, variants, coverage=35, seed=2026,
                             error_rate=0.04)
    fasta, bam = write_dataset(tmp, genome, records)
    truth = write_truth_vcf(os.path.join(tmp, "truth.vcf"), genome, variants)
    config = set_parameters(PipelineConfig(
        bam=bam, fasta=fasta, output_dir=tmp + "/out/",
        sub_command="call_variant", ont_r9_guppy5_sup=True, threads=1,
        dry=True, train_mode=True, truth_vcf=truth,
        random_draw_probability=1.0,
        image_output_directory=tmp + "/images/"))
    generate_images(config)
    run_inference(config, tmp + "/images/", tmp + "/preds/")
    paths = process_candidates(config, tmp + "/preds/", tmp + "/out/")
    return BGZFReader(paths["full"]).read_all().decode()


def test_full_vcf_matches_golden(tmp_path):
    got = _run_pipeline(str(tmp_path))
    assert os.path.isfile(GOLDEN), "golden missing — run --regenerate"
    want = open(GOLDEN).read()
    assert got == want, "FULL VCF diverged from the golden output"


if __name__ == "__main__":
    if "--regenerate" in sys.argv:
        import tempfile
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        text = _run_pipeline(tempfile.mkdtemp())
        open(GOLDEN, "w").write(text)
        print(f"golden written: {GOLDEN} "
              f"({sum(1 for l in text.splitlines() if not l.startswith('#'))}"
              f" records)")
