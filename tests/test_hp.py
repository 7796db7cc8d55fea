"""PEPPER-HP (48-feature dual-haplotype) encoder and pipeline tests."""
import os

import numpy as np
import pytest

from pepper_tpu.encode.region_encoder_hp import RegionalSummaryHP, _feature_index_hp
from pepper_tpu.io.sam import OP_M, OP_I, OP_D, FLAG_REVERSE
from pepper_tpu.io.bam_reader import TrimmedRead
from tests.util.synth import (plant_variants, random_genome, simulate_reads,
                              write_dataset, write_truth_vcf)


def mk_hp_read(pos, seq, cigar, hp_tag, quals=None, reverse=False, name="r"):
    quals = quals if quals is not None else [30] * len(seq)
    ref_len = sum(l for op, l in cigar if op in (OP_M, OP_D))
    return TrimmedRead(query_name=name, pos=pos, pos_end=pos + ref_len,
                       sequence=seq, base_qualities=list(quals),
                       cigar_tuples=list(cigar), mapping_quality=60,
                       flags=FLAG_REVERSE if reverse else 0, hp_tag=hp_tag,
                       bad_indices=[])


KW = dict(min_snp_baseq=1, min_indel_baseq=1, snp_freq_threshold=0.10,
          insert_freq_threshold=0.15, delete_freq_threshold=0.15,
          min_coverage_threshold=2, snp_candidate_freq_threshold=0.10,
          indel_candidate_freq_threshold=0.10,
          candidate_support_threshold=2, skip_indels=False,
          candidate_region_start=0, candidate_region_end=10**12)


def test_feature_index_hp_blocks():
    assert _feature_index_hp("A", "C", False, 1) == 9
    assert _feature_index_hp("A", "C", True, 1) == 20
    assert _feature_index_hp("A", "C", False, 2) == 31
    assert _feature_index_hp("A", "C", True, 2) == 42
    assert _feature_index_hp("N", "C", False, 1) == -1


def test_hp_routing_snp_supports():
    ref = "ACGT" * 25
    site = 50  # 'G'
    reads = []
    # hp1 reads support T, hp2 reads support ref, hp0 read supports T
    for i in range(3):
        seq = ref[40:site] + "T" + ref[site + 1:70]
        reads.append(mk_hp_read(40, seq, [(OP_M, len(seq))], hp_tag=1,
                                name=f"h1_{i}"))
    for i in range(3):
        reads.append(mk_hp_read(40, ref[40:70], [(OP_M, 30)], hp_tag=2,
                                name=f"h2_{i}"))
    seq = ref[40:site] + "T" + ref[site + 1:70]
    reads.append(mk_hp_read(40, seq, [(OP_M, len(seq))], hp_tag=0, name="h0"))

    rs = RegionalSummaryHP("c1", 0, 99, ref)
    out = rs.generate_summary(reads, **KW)
    assert len(out) == 1
    c = out[0]
    assert c.candidates == ["1T"]
    img = c.image
    mid = 10  # window 21, mid = 20//2
    # midpoint: HP1 fwd support = 3 (hp1) + 1 (hp0) = 4; HP2 fwd = 1 (hp0)
    assert img[mid, 5] == 4
    assert img[mid, 27] == 1
    assert img[mid, 16] == 0 and img[mid, 38] == 0
    # REFF blocks: HP1 gets hp1+hp0 = 4 reads, HP2 gets hp2+hp0 = 4 reads
    assert img[mid, 4] == -4
    assert img[mid, 26] == -4
    # matching-base column (G fwd) per block: HP1 sees 0 matching... hp2
    # reads match ref G -> block2 col 29+3=32 gets -3... and hp0/hp1 mismatch
    assert img[mid, 32] == -3
    assert img[mid, 10] == 0   # no hp1-block read matches the ref base


def test_hp_positive_indel_counts():
    ref = "ACGT" * 10
    anchor = 19
    reads = []
    for i in range(4):
        seq = ref[5:anchor + 1] + "GG" + ref[anchor + 1:35]
        reads.append(mk_hp_read(5, seq, [(OP_M, anchor + 1 - 5), (OP_I, 2),
                                         (OP_M, 35 - anchor - 1)],
                                hp_tag=1, name=f"i{i}"))
    rs = RegionalSummaryHP("c1", 0, 39, ref)
    out = rs.generate_summary(reads, **KW)
    ins = [c for c in out if c.candidates[0].startswith("2")]
    assert len(ins) == 1
    img = ins[0].image
    mid = 10
    assert img[mid, 2] == 3          # allele length
    assert img[mid, 6] == 4          # HP1 fwd support
    assert img[mid, 28] == 0         # HP2 untouched
    # insert count column is POSITIVE in HP mode (hp1 fwd I = col 12)
    assert img[mid, 12] == 4


def test_hp_pipeline_end_to_end_dry(tmp_path):
    from pepper_tpu.options import PipelineConfig
    from pepper_tpu.pipelines.find_candidates import process_candidates
    from pepper_tpu.pipelines.make_images import generate_images
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.runtime.inference import run_inference
    from pepper_tpu.io.vcf import read_vcf

    tmp = str(tmp_path)
    genome = random_genome(15000, seed=81)
    variants = plant_variants(dict(genome), 5, 2, 2, seed=82)
    records = simulate_reads(genome, variants, coverage=35, seed=83,
                             hp_tags=True)
    fasta, bam = write_dataset(tmp, genome, records)
    truth = write_truth_vcf(tmp + "/truth.vcf", genome, variants)
    config = set_parameters(PipelineConfig(
        bam=bam, fasta=fasta, output_dir=tmp + "/out/",
        sub_command="call_variant", ont_r9_guppy5_sup=True, threads=1,
        dry=True, train_mode=True, truth_vcf=truth, use_hp_info=True,
        random_draw_probability=1.0,
        image_output_directory=tmp + "/images/"))
    generate_images(config)
    # HP image files carry the _hp suffix and 21x48 images
    files = [f for f in os.listdir(tmp + "/images/") if "_hp" in f]
    assert files
    from pepper_tpu.pipelines.datastore import ImageStore
    with ImageStore(tmp + "/images/" + files[0]) as store:
        s = store.read_summary(store.summary_names()[0])
        assert s["images"].shape[1:] == (21, 48)

    run_inference(config, tmp + "/images/", tmp + "/preds/")
    paths = process_candidates(config, tmp + "/preds/", tmp + "/out/")
    by_pos = {(r.contig, r.pos): r for r in read_vcf(paths["full"])}
    missed = [v for v in variants
              if (v.contig, v.pos) not in by_pos
              or v.alt not in by_pos[(v.contig, v.pos)].alts]
    assert not missed, missed


@pytest.mark.slow
def test_hp_pipeline_real_model_e2e(tmp_path):
    """Non-dry HP run: a small 48-feature model trained on HP images runs
    the full pipeline through DeviceRunner (feature width 48, bf16/padding
    branches) and must recall the planted SNPs — the reference's
    first-class second pass (SetParameters.py:285-288,
    predict_distributed_cpu.py:162-165)."""
    from pepper_tpu.io.vcf import read_vcf
    from pepper_tpu.options import PipelineConfig
    from pepper_tpu.pipelines.call_variant import call_variant
    from pepper_tpu.pipelines.make_images import generate_images
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.train.variant_train import train

    tmp = str(tmp_path)
    genome = random_genome(50000, seed=85)
    variants = plant_variants(dict(genome), 20, 5, 5, seed=86)
    records = simulate_reads(genome, variants, coverage=35, seed=87,
                             error_rate=0.02, hp_tags=True)
    fasta, bam = write_dataset(tmp, genome, records)
    truth = write_truth_vcf(tmp + "/truth.vcf", genome, variants)

    train_cfg = set_parameters(PipelineConfig(
        bam=bam, fasta=fasta, output_dir=tmp,
        sub_command="make_train_images", ont_r9_guppy5_sup=True, threads=1,
        train_mode=True, truth_vcf=truth, use_hp_info=True,
        random_draw_probability=1.0,
        image_output_directory=tmp + "/hp_train_images/"))
    generate_images(train_cfg)
    model_path = train(tmp + "/hp_train_images/", tmp + "/hp_train_images/",
                       tmp + "/hp_models/", batch_size=32, epoch_limit=6,
                       step_size=25, lr=3e-4)

    out_dir = tmp + "/hp_out/"
    config = set_parameters(PipelineConfig(
        bam=bam, fasta=fasta, output_dir=out_dir, model_path=model_path,
        sub_command="call_variant", ont_r9_guppy5_sup=True, threads=2,
        use_hp_info=True, region_size=20000))
    paths = call_variant(config)
    assert set(paths) == {"full", "pepper", "vc", "vc_snp", "vc_indel"}
    for p in paths.values():
        assert os.path.isfile(p), p

    full = read_vcf(paths["full"])
    assert full, "no records in FULL VCF"
    called = {(r.contig, r.pos) for r in full
              if "PASS" in r.filters and r.genotype() != [0, 0]}
    snps = [v for v in variants if len(v.ref) == 1 and len(v.alt) == 1]
    hit = sum((v.contig, v.pos) in called for v in snps)
    recall = hit / len(snps)
    assert recall >= 0.6, f"planted-SNP recall {recall:.2f} ({hit}/{len(snps)})"
