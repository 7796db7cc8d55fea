"""Multi-host scale-out tests: 2 local processes stand in for 2 hosts.

The contract (SURVEY.md §5.8, parallel/multihost.py): regions are striped
across hosts, each host runs the full image->inference->candidate pipeline
share-nothing, per-host candidate lists are gathered through the shared
output dir, and host 0 writes global VCFs byte-identical to a 1-host run.
"""
import glob
import json
import os
import subprocess
import sys

import pytest

from tests.util.synth import (plant_variants, random_genome, simulate_reads,
                              write_dataset, write_truth_vcf)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize may pin a TPU
sys.path.insert(0, {repo!r})
from pepper_tpu.options import PipelineConfig
from pepper_tpu.presets import set_parameters
from pepper_tpu.pipelines.call_variant import call_variant

config = PipelineConfig(**json.load(open(sys.argv[1])))
call_variant(set_parameters(config))
"""


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("mh"))
    genome = random_genome(60000, seed=31)
    variants = plant_variants(dict(genome), 24, 6, 6, seed=32)
    records = simulate_reads(genome, variants, coverage=35, seed=33)
    fasta, bam = write_dataset(tmp, genome, records)
    truth = write_truth_vcf(os.path.join(tmp, "truth.vcf"), genome, variants)
    return dict(tmp=tmp, fasta=fasta, bam=bam, truth=truth)


def _base_config(dataset, out_dir):
    return dict(bam=dataset["bam"], fasta=dataset["fasta"],
                output_dir=out_dir, sub_command="call_variant",
                ont_r9_guppy5_sup=True, threads=1, dry=True, train_mode=True,
                truth_vcf=dataset["truth"], random_draw_probability=1.0,
                region_size=10000)


def _run_host(dataset, out_dir, tag, **over):
    cfg = _base_config(dataset, out_dir)
    cfg.update(over)
    cfg_path = os.path.join(dataset["tmp"], f"config_{tag}.json")
    with open(cfg_path, "w") as fh:
        json.dump(cfg, fh)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.Popen(
        [sys.executable, "-c", _DRIVER.format(repo=REPO), cfg_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)


def _vcf_bytes(out_dir):
    paths = sorted(glob.glob(os.path.join(out_dir, "*.vcf.gz")))
    assert len(paths) == 5, paths
    return {os.path.basename(p): open(p, "rb").read() for p in paths}


def test_two_host_run_matches_single_host_byte_identical(dataset):
    # 1-process reference run
    out1 = os.path.join(dataset["tmp"], "out_1host/")
    proc = _run_host(dataset, out1, "single")
    _, err = proc.communicate(timeout=600)
    assert proc.returncode == 0, err.decode()[-3000:]

    # same pipeline as 2 concurrent host processes sharing the output dir
    out2 = os.path.join(dataset["tmp"], "out_2host/")
    h1 = _run_host(dataset, out2, "h1", num_hosts=2, host_id=1)
    h0 = _run_host(dataset, out2, "h0", num_hosts=2, host_id=0)
    _, err1 = h1.communicate(timeout=600)
    _, err0 = h0.communicate(timeout=600)
    assert h1.returncode == 0, err1.decode()[-3000:]
    assert h0.returncode == 0, err0.decode()[-3000:]

    single = _vcf_bytes(out1)
    double = _vcf_bytes(out2)
    assert single.keys() == double.keys()
    for name in single:
        assert single[name] == double[name], \
            f"{name} differs between 1-host and 2-host runs"
    # the gather cleaned up its shard files
    assert not glob.glob(os.path.join(out2, ".pepper_candidates_host_*"))
    # both hosts produced VCF records (not a degenerate empty run)
    from pepper_tpu.io.vcf import read_vcf
    full = [p for p in glob.glob(out1 + "*.vcf.gz") if "FULL" in p][0]
    assert len(read_vcf(full)) >= 10


@pytest.fixture(scope="module")
def trained_model(dataset):
    """A small REAL model (non-dry DeviceRunner path) for the production-
    configuration multi-host test; accuracy is irrelevant to byte-identity,
    so training is short."""
    import jax
    from pepper_tpu.options import PipelineConfig
    from pepper_tpu.pipelines.make_images import generate_images
    from pepper_tpu.presets import set_parameters

    tmp = dataset["tmp"]
    config = set_parameters(PipelineConfig(
        bam=dataset["bam"], fasta=dataset["fasta"], output_dir=tmp,
        sub_command="make_train_images", ont_r9_guppy5_sup=True, threads=1,
        train_mode=True, truth_vcf=dataset["truth"],
        random_draw_probability=1.0,
        image_output_directory=tmp + "/mh_train_images/"))
    generate_images(config)
    from pepper_tpu.train.variant_train import train
    return train(tmp + "/mh_train_images/", tmp + "/mh_train_images/",
                 tmp + "/mh_models/", batch_size=32, epoch_limit=2,
                 step_size=50, lr=3e-4)


@pytest.mark.slow
def test_two_host_streamed_real_model_byte_identical(dataset, trained_model):
    """The PRODUCTION configuration under 2 hosts: streaming fused
    stage 1+2+3 with a real model through DeviceRunner, host-sharded
    intervals, candidate gather — byte-identical to the 1-host run.
    (The dry/staged variant is covered above; this covers
    stream_inference + gather_candidate_lists end to end.)"""
    over = dict(dry=False, train_mode=False, streaming=True, threads=2,
                model_path=trained_model)
    out1 = os.path.join(dataset["tmp"], "out_1host_stream/")
    proc = _run_host(dataset, out1, "stream_single", **over)
    _, err = proc.communicate(timeout=900)
    assert proc.returncode == 0, err.decode()[-3000:]

    out2 = os.path.join(dataset["tmp"], "out_2host_stream/")
    h1 = _run_host(dataset, out2, "stream_h1", num_hosts=2, host_id=1,
                   **over)
    h0 = _run_host(dataset, out2, "stream_h0", num_hosts=2, host_id=0,
                   **over)
    _, err1 = h1.communicate(timeout=900)
    _, err0 = h0.communicate(timeout=900)
    assert h1.returncode == 0, err1.decode()[-3000:]
    assert h0.returncode == 0, err0.decode()[-3000:]

    single = _vcf_bytes(out1)
    double = _vcf_bytes(out2)
    assert single.keys() == double.keys()
    for name in single:
        assert single[name] == double[name], \
            f"{name} differs between 1-host and 2-host streamed runs"
    from pepper_tpu.io.vcf import read_vcf
    full = [p for p in glob.glob(out1 + "*.vcf.gz") if "FULL" in p][0]
    assert len(read_vcf(full)) >= 10


def test_host_shard_striping_and_tags(monkeypatch):
    from pepper_tpu.parallel import multihost as mh

    monkeypatch.setattr(mh, "_num_hosts", 3)
    monkeypatch.setattr(mh, "_host_id", 1)
    assert mh.host_count() == 3 and mh.host_index() == 1
    assert mh.host_shard(list(range(10))) == [1, 4, 7]
    assert mh.host_tag() == "host_1_"
    monkeypatch.setattr(mh, "_num_hosts", None)
    monkeypatch.setattr(mh, "_host_id", None)
    assert mh.host_shard(list(range(3))) == [0, 1, 2]
    assert mh.host_tag() == ""


def test_gather_candidate_lists_roundtrip(tmp_path, monkeypatch):
    from pepper_tpu.parallel import multihost as mh

    # host 1 ships its shard…
    monkeypatch.setattr(mh, "_num_hosts", 2)
    monkeypatch.setattr(mh, "_host_id", 1)
    m1 = [("chr1", 5, 6, "A", ["T"], [0, 1], 30, [10], 0.9, [0.1, 0.9, 0.0])]
    d1 = [("chr1", 5, 6, "A", ["T"], [0, 1], 30, [10], 0.9,
           [0.1, 0.9, 0.0], [0.9], False)]
    assert mh.gather_candidate_lists(str(tmp_path), m1, d1) is None
    # …host 0 merges it with its own
    monkeypatch.setattr(mh, "_host_id", 0)
    m0, d0 = [("chr1", 2, 3, "C", ["G"], [1, 1], 25, [20], 0.8,
               [0.0, 0.1, 0.9])], []
    merged_m, merged_d = mh.gather_candidate_lists(str(tmp_path), m0, d0,
                                                   timeout=5)
    assert merged_m == m0 + m1
    assert merged_d == d1
    assert not list(tmp_path.glob(".pepper_candidates_host_*"))

    # timeout raises instead of hanging forever
    with pytest.raises(TimeoutError):
        mh.gather_candidate_lists(str(tmp_path), [], [], timeout=0.3)


def test_multihost_cli_flags_parse():
    from pepper_tpu.cli.pepper_variant_main import build_parser, \
        config_from_args

    args = build_parser().parse_args(
        ["call_variant", "-b", "x.bam", "-f", "x.fa", "-o", "out",
         "--ont_r9_guppy5_sup", "--num_hosts", "4", "--host_id", "2"])
    config = config_from_args(args)
    assert config.num_hosts == 4 and config.host_id == 2
    assert config.coordinator_address is None


def test_initialize_validates_host_id(monkeypatch):
    import importlib

    from pepper_tpu.parallel import multihost as mh
    importlib.reload(mh)
    with pytest.raises(ValueError):
        mh.initialize(num_processes=2)          # missing host_id
    importlib.reload(mh)
    with pytest.raises(ValueError):
        mh.initialize(num_processes=2, process_id=5)  # out of range
    importlib.reload(mh)
    mh.initialize(num_processes=2, process_id=1)
    assert (mh.host_count(), mh.host_index()) == (2, 1)
    mh.initialize(num_processes=8, process_id=7)  # idempotent: first wins
    assert (mh.host_count(), mh.host_index()) == (2, 1)
    importlib.reload(mh)


def test_two_process_distributed_training_matches_single(tmp_path):
    """The training analog of the reference's only live DDP path
    (pepper/.../train_distributed.py:253-286): 2 jax.distributed processes
    run gradient-synced train steps over DistributedSampler-style disjoint
    shards of each global batch; final params match a 1-process run over
    the same global mesh size on the concatenated data."""
    import socket

    import numpy as np

    rng = np.random.RandomState(17)
    data_dir = str(tmp_path)
    np.save(data_dir + "/images.npy",
            rng.randint(-125, 126, (64, 33, 26)).astype(np.int8))
    np.save(data_dir + "/labels.npy", rng.randint(0, 3, 64))

    driver = os.path.join(REPO, "tests", "util", "mh_train_driver.py")
    steps = "4"

    def run_single():
        out = data_dir + "/single.npz"
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4")
        p = subprocess.run(
            [sys.executable, driver, "0", "1", "-", data_dir, steps, out],
            env=env, capture_output=True, timeout=600)
        assert p.returncode == 0, p.stderr.decode()[-3000:]
        return out

    def run_pair():
        with socket.socket() as s:   # free port for the coordinator
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coord = f"127.0.0.1:{port}"
        outs = [data_dir + f"/mh{r}.npz" for r in range(2)]
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        procs = [subprocess.Popen(
            [sys.executable, driver, str(r), "2", coord, data_dir, steps,
             outs[r]], env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE) for r in range(2)]
        for r, p in enumerate(procs):
            _, err = p.communicate(timeout=600)
            assert p.returncode == 0, err.decode()[-3000:]
        return outs

    single = np.load(run_single())
    mh0, mh1 = (np.load(o) for o in run_pair())

    # gradient sync proven: params match the 1-process run (up to the
    # cross-process psum's float reduction order — observed max diff
    # ~3e-5 over a handful of elements) and both processes hold the
    # same replicated params bit-exactly
    keys = [k for k in single.files if k != "__losses__"]
    assert keys
    for k in keys:
        np.testing.assert_allclose(mh0[k], single[k], rtol=5e-3, atol=1e-4,
                                   err_msg=k)
        np.testing.assert_array_equal(mh0[k], mh1[k], err_msg=k)
    np.testing.assert_allclose(mh0["__losses__"], single["__losses__"],
                               rtol=1e-4)
