"""Aux subsystem tests: train CLIs, hyperband, helpers, multihost sharding."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pepper_tpu.train.hyperband import run_hyperband, sample_config
from pepper_tpu.utils.pileup_debug import render_pileup
from pepper_tpu.utils.vcf_stats import compare_vcfs, vcf_stats
from tests.test_region_encoder import mk_read
from pepper_tpu.io.sam import OP_M, OP_D


def test_hyperband_converges_with_fake_trainer():
    calls = []

    def fake_train(config, epochs, run_dir):
        # quadratic bowl around lr=1e-3: closer lr -> higher accuracy
        accuracy = 100.0 - abs(np.log10(config["lr"]) + 3) * 10
        calls.append((config, epochs))
        return accuracy, run_dir

    best = run_hyperband("x", "y", "/tmp/hb", max_epochs=9, eta=3, seed=1,
                         train_fn=fake_train)
    assert best["accuracy"] > 80
    assert abs(np.log10(best["lr"]) + 3) < 2.0
    assert len(calls) > 5


def test_sample_config_ranges():
    rng = np.random.RandomState(0)
    for _ in range(20):
        c = sample_config(rng)
        assert 1e-5 <= c["lr"] <= 1e-2
        assert 1e-7 <= c["weight_decay"] <= 1e-4


def test_render_pileup_marks():
    ref = "ACGTACGTAC"
    reads = [
        mk_read(0, ref, [(OP_M, 10)], name="match"),
        mk_read(0, "ACGTTCGTAC", [(OP_M, 10)], name="mm"),
        mk_read(0, ref[:4] + ref[6:], [(OP_M, 4), (OP_D, 2), (OP_M, 4)],
                name="del"),
    ]
    text = render_pileup(ref, 0, reads)
    assert "REF ACGTACGTAC" in text
    assert ".........." in text           # full match row
    assert "....T....." in text           # mismatch marked
    assert "....**...." in text           # deletion marked


def test_vcf_stats_and_compare(tmp_path):
    vcf = tmp_path / "a.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        "c1\t10\t.\tA\tT\t60\tPASS\t.\tGT\t0/1\n"
        "c1\t20\t.\tAT\tA\t60\tPASS\t.\tGT\t1/1\n"
        "c1\t30\t.\tG\tGC\t60\trefCall\t.\tGT\t0/0\n")
    stats = vcf_stats(str(vcf))
    assert stats["total"] == 3
    assert stats["kinds"] == {"SNP": 1, "DELETE": 1, "INSERT": 1}
    assert stats["genotypes"]["0/1"] == 1
    vcf_b = tmp_path / "b.vcf"
    vcf_b.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        "c1\t10\t.\tA\tT\t60\tPASS\t.\tGT\t0/1\n"
        "c1\t40\t.\tC\tG\t60\tPASS\t.\tGT\t0/1\n")
    cmp_res = compare_vcfs(str(vcf), str(vcf_b))
    assert cmp_res["shared"] == 1
    assert cmp_res["only_a"] == 2 and cmp_res["only_b"] == 1
    assert cmp_res["genotype_concordance"] == 1.0


def test_host_shard_single_host():
    from pepper_tpu.parallel.multihost import host_count, host_shard
    assert host_count() == 1
    assert host_shard([1, 2, 3]) == [1, 2, 3]


def _run_cli(module, *args):
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", module, *args], capture_output=True,
        text=True, env=env, timeout=240)


def test_train_cli_help_and_errors():
    for module in ("pepper_tpu.cli.pepper_variant_train_main",
                   "pepper_tpu.cli.pepper_train_main",
                   "pepper_tpu.cli.pepper_variant_main",
                   "pepper_tpu.cli.pepper_main"):
        proc = _run_cli(module, "--help")
        assert proc.returncode == 0, proc.stderr
        assert "usage" in proc.stdout.lower()
    # missing required flag -> argparse error exit 2
    proc = _run_cli("pepper_tpu.cli.pepper_variant_train_main", "train_model")
    assert proc.returncode == 2


@pytest.mark.skipif(not os.path.isfile(
    "/root/reference/pepper_variant/modules/python/ExcludeContigs.py"),
    reason="reference not mounted")
def test_excluded_contig_patterns_cover_reference_list():
    """Our pattern rules must exclude every contig in the reference's
    verbatim list and no canonical human contigs."""
    from pepper_tpu.pipelines.make_images import is_excluded_human_contig
    ns = {}
    exec(open("/root/reference/pepper_variant/modules/python/"
              "ExcludeContigs.py").read(), ns)
    missed = [c for c in ns["EXCLUDED_HUMAN_CONTIGS"]
              if not is_excluded_human_contig(c)]
    assert not missed, missed[:10]
    canonical = ([f"chr{i}" for i in range(1, 23)]
                 + ["chrX", "chrY", "chrM"]
                 + [str(i) for i in range(1, 23)] + ["X", "Y", "MT"])
    assert not [c for c in canonical if is_excluded_human_contig(c)]


def test_contig_range_region_syntax(tmp_path):
    from pepper_tpu.pipelines.make_images import get_chromosome_list
    out = get_chromosome_list("chr1-3", "unused", "unused")
    assert out == [("chr1", None), ("chr2", None), ("chr3", None)]
    out = get_chromosome_list("chr20:100-200,chr21", "unused", "unused")
    assert out == [("chr20", (100, 200)), ("chr21", None)]
    out = get_chromosome_list("contig1", "unused", "unused")
    assert out == [("contig1", None)]


def test_hyperband_persists_results_json(tmp_path):
    def fake_train(config, epochs, run_dir):
        return 50.0 + np.log10(config["lr"]), run_dir

    run_hyperband("x", "y", str(tmp_path), max_epochs=3, eta=3, seed=2,
                  train_fn=fake_train)
    results_file = tmp_path / "hyperband_results.json"
    assert results_file.is_file()
    results = json.loads(results_file.read_text())
    assert results and all(
        {"accuracy", "iterations", "params", "model_path"} <= set(r)
        for r in results)
    # the inspection helper consumes the same file
    from pepper_tpu.utils.hyperband_result import load_results, print_results
    print_results(load_results(str(results_file)), min_iterations=1)


def test_merge_train_image_index(tmp_path):
    import h5py
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for name, regions in [("a.hdf5", {"r1": 3, "r2": 2}), ("b.hdf5", {"q": 4})]:
        with h5py.File(img_dir / name, "w") as fh:
            for region, n in regions.items():
                fh.create_dataset(f"summaries/{region}/images",
                                  data=np.zeros((n, 33, 26), np.int8))
    from pepper_tpu.utils.train_image_index import merge_image_index
    out = merge_image_index(str(img_dir), str(tmp_path / "out"),
                            verbose=False)
    with h5py.File(out, "r") as fh:
        keys = sorted(fh.keys(), key=int)
        assert len(keys) == 9
        src, region, row = fh["0"][()].decode().split(",")
        assert src.endswith("a.hdf5") and region in ("r1", "r2")
        assert row == "0"


def test_vcf_vaf_split(tmp_path, capsys):
    vcf = tmp_path / "v.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        "c1\t10\t.\tA\tT\t60\tPASS\t.\tGT:VAF\t0/1:0.5\n"
        "c1\t20\t.\tA\tT,G\t60\tPASS\t.\tGT:VAF\t1/1:0.8,0.1\n"
        "c1\t30\t.\tG\tC\t60\trefCall\t.\tGT:VAF\t0/0:0.05\n")
    from pepper_tpu.utils.vcf_vaf import collect_vafs, main
    stats = collect_vafs(str(vcf))
    # rec1 alt T is genotyped (true), rec2 T true / G false, rec3 filtered out
    assert sorted(stats["true"]) == [0.5, 0.8]
    assert stats["false"] == [0.1]
    assert stats["total_records"] == 3 and stats["total_alts"] == 4
    assert main(["-v", str(vcf), "--no_plot"]) == 0
    out = capsys.readouterr().out
    assert "Total true alleles:\t 2" in out


def test_download_models_file_manifest(tmp_path):
    """Offline download_models: file:// manifest + injectable fetch
    (reference pepper/modules/python/download_model.py:10-27)."""
    from pepper_tpu.utils.download_model import download_models, parse_manifest

    model_a = tmp_path / "srcA.bin"
    model_a.write_bytes(b"model-a-bytes")
    model_b = tmp_path / "srcB.bin"
    model_b.write_bytes(b"model-b-bytes")
    manifest = tmp_path / "manifest.csv"
    manifest.write_text(
        f"PEPPER_A,file://{model_a}\n\nPEPPER_B,file://{model_b}\n")

    out = tmp_path / "models"
    paths = download_models(str(out), manifest_url=f"file://{manifest}")
    assert [os.path.basename(p) for p in paths] == ["PEPPER_A.pkl",
                                                    "PEPPER_B.pkl"]
    assert (out / "PEPPER_A.pkl").read_bytes() == b"model-a-bytes"
    assert not (out / "pepper_model_description.csv").exists()

    # idempotent: existing models are kept, not re-fetched
    (out / "PEPPER_A.pkl").write_bytes(b"custom")
    fetched = []

    def spy(url, dest):
        fetched.append(url)
        from pepper_tpu.utils.download_model import urllib_fetcher
        urllib_fetcher(url, dest)

    download_models(str(out), manifest_url=f"file://{manifest}", fetcher=spy)
    assert (out / "PEPPER_A.pkl").read_bytes() == b"custom"
    assert fetched == [f"file://{manifest}"]  # both models already present

    assert parse_manifest("a,http://x\n") == [("a", "http://x")]


def test_persistent_compile_cache_configured(tmp_path, monkeypatch):
    """The XLA persistent cache (analog of the reference's cached ONNX
    export, predict_distributed_cpu.py:177-186) is actually configured."""
    import pepper_tpu.runtime.compile_cache as cc

    monkeypatch.setattr(cc, "_configured", False)
    monkeypatch.setenv("PEPPER_TPU_CACHE_DIR", str(tmp_path / "xla"))
    path = cc.enable_persistent_cache()
    assert path == str(tmp_path / "xla")
    import jax
    assert jax.config.jax_compilation_cache_dir == path
    assert os.path.isdir(path)
    # disabled by env sentinel
    monkeypatch.setattr(cc, "_configured", False)
    monkeypatch.setenv("PEPPER_TPU_CACHE_DIR", "off")
    assert cc.enable_persistent_cache() is None
