"""Fused encode->inference streaming tests (runtime/streaming.py).

Contract: the streamed pipeline produces VCFs byte-identical to the staged
pipeline (same candidates, same predictions, same aggregation), while never
materializing the full image set — the stage-1 HDF5 is optional.
"""
import glob
import os

import jax
import numpy as np
import pytest

from pepper_tpu.models.checkpoint import save_checkpoint
from pepper_tpu.models.variant_model import init_variant_params
from pepper_tpu.options import PipelineConfig
from pepper_tpu.pipelines.call_variant import call_variant
from pepper_tpu.presets import set_parameters
from tests.util.synth import (plant_variants, random_genome, simulate_reads,
                              write_dataset)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("stream"))
    genome = random_genome(50000, seed=51)
    variants = plant_variants(dict(genome), 20, 5, 5, seed=52)
    records = simulate_reads(genome, variants, coverage=35, seed=53)
    fasta, bam = write_dataset(tmp, genome, records)
    model = os.path.join(tmp, "model.npz")
    params = init_variant_params(jax.random.PRNGKey(3))
    save_checkpoint(model, jax.tree_util.tree_map(np.asarray, params),
                    {"epochs": 0})
    return dict(tmp=tmp, fasta=fasta, bam=bam, model=model)


def _config(dataset, out_dir, **over):
    config = set_parameters(PipelineConfig(
        bam=dataset["bam"], fasta=dataset["fasta"], output_dir=out_dir,
        model_path=dataset["model"], sub_command="call_variant",
        ont_r9_guppy5_sup=True, threads=2, region_size=10000))
    for k, v in over.items():
        setattr(config, k, v)
    return config


def _vcf_bytes(out_dir):
    paths = sorted(glob.glob(os.path.join(out_dir, "*.vcf.gz")))
    assert len(paths) == 5, paths
    return {os.path.basename(p): open(p, "rb").read() for p in paths}


def test_streamed_matches_staged_byte_identical(dataset):
    out_staged = dataset["tmp"] + "/out_staged/"
    call_variant(_config(dataset, out_staged, streaming=False))

    out_streamed = dataset["tmp"] + "/out_streamed/"
    call_variant(_config(dataset, out_streamed))

    staged, streamed = _vcf_bytes(out_staged), _vcf_bytes(out_streamed)
    assert staged.keys() == streamed.keys()
    for name in staged:
        assert staged[name] == streamed[name], f"{name} differs"

    # streaming wrote predictions but no stage-1 images by default
    assert glob.glob(out_streamed + "predictions_*/*.hdf")
    assert not glob.glob(out_streamed + "images_*/*")

    # not a degenerate run
    from pepper_tpu.io.vcf import read_vcf
    full = [p for p in glob.glob(out_staged + "*.vcf.gz") if "FULL" in p][0]
    assert len(read_vcf(full)) >= 5


def test_streaming_image_artifacts_loadable(dataset):
    out_dir = dataset["tmp"] + "/out_artifacts/"
    call_variant(_config(dataset, out_dir, keep_image_artifacts=True))
    image_files = glob.glob(out_dir + "images_*/*.hdf5")
    assert image_files, "keep_image_artifacts wrote no image HDF5"
    # the artifact is a valid stage-1 store: stage 2 can re-run from it
    from pepper_tpu.runtime.inference import load_all_summaries
    data = load_all_summaries(os.path.dirname(image_files[0]) + "/")
    assert data is not None and len(data["contigs"]) > 0
    assert data["images"].dtype == np.int8


def test_streaming_propagates_encode_errors(dataset, tmp_path):
    config = _config(dataset, str(tmp_path) + "/out/")
    config.fasta = dataset["fasta"]
    config.bam = dataset["bam"] + ".does_not_exist"
    with pytest.raises((RuntimeError, FileNotFoundError, OSError)):
        call_variant(config)


def test_streamed_ordered_emission_multi_contig(tmp_path_factory):
    """Ordered VCF emission across contigs whose natural-sort order
    (ctg2 < ctg10) differs from the lexicographic record order
    (ctg10 < ctg2): the streamed single-host run must still be
    byte-identical to the staged run, with ctg10's records first."""
    from pepper_tpu.io.vcf import read_vcf

    tmp = str(tmp_path_factory.mktemp("stream_mc"))
    genomes = []
    for i, name in enumerate(("ctg2", "ctg10")):
        genomes.append((name, random_genome(30000, seed=60 + i)[0][1]))
    variants = plant_variants(dict(genomes), 12, 3, 3, seed=62)
    records = simulate_reads(genomes, variants, coverage=35, seed=63)
    fasta, bam = write_dataset(tmp, genomes, records)
    model = os.path.join(tmp, "model.npz")
    params = init_variant_params(jax.random.PRNGKey(3))
    save_checkpoint(model, jax.tree_util.tree_map(np.asarray, params), {})
    ds = dict(tmp=tmp, fasta=fasta, bam=bam, model=model)

    out_staged = tmp + "/out_staged/"
    call_variant(_config(ds, out_staged, streaming=False))
    out_streamed = tmp + "/out_streamed/"
    call_variant(_config(ds, out_streamed))

    staged, streamed = _vcf_bytes(out_staged), _vcf_bytes(out_streamed)
    for name in staged:
        assert staged[name] == streamed[name], f"{name} differs"

    full = [p for p in glob.glob(out_streamed + "*.vcf.gz")
            if "FULL" in p][0]
    recs = read_vcf(full)
    contig_order = [r.contig for r in recs]
    assert set(contig_order) == {"ctg2", "ctg10"}
    # lexicographic record order: every ctg10 record precedes every ctg2
    assert contig_order == sorted(contig_order)

    # thread-count invariance: watermark emission must not depend on how
    # intervals interleave across producer threads
    out_t4 = tmp + "/out_streamed_t4/"
    call_variant(_config(ds, out_t4, threads=4))
    t4 = _vcf_bytes(out_t4)
    for name in staged:
        assert staged[name] == t4[name], f"{name} differs at threads=4"


def test_metabuffer_run_accounting():
    """_MetaBuffer.take splits interval-run accounting exactly across
    batch boundaries — the bookkeeping the ordered emitter's watermark
    depends on."""
    from pepper_tpu.runtime.streaming import _MetaBuffer

    buf = _MetaBuffer()
    for idx, n in ((7, 3), (2, 5), (9, 4)):
        buf.add("c", np.arange(n), np.ones(n, np.int32),
                [["1A"]] * n, np.ones(n, np.int32),
                np.zeros((n, 33, 26), np.int8), idx)
    assert buf.rows == 12
    meta, rest = buf.take(5)
    assert meta[6] == [(7, 3), (2, 2)]
    assert rest.rows == 7 and rest.runs == [[2, 3], [9, 4]]
    meta2, rest2 = rest.take(7)
    assert meta2[6] == [(2, 3), (9, 4)]
    assert rest2.rows == 0
    # row payloads stay aligned with the accounting
    assert list(meta[1]) == [0, 1, 2, 0, 1]
    assert list(meta2[1]) == [2, 3, 4, 0, 1, 2, 3]


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_streaming_flusher_errors_surface(dataset, tmp_path, monkeypatch):
    """A failure on the flusher thread (prediction-store write, collector
    handoff) must surface as the stream's error — not hang the pipeline or
    be swallowed. (The thread ALSO re-raises by design — fail loudly with
    a traceback at the failure point — hence the filtered warning.)"""
    from pepper_tpu.pipelines import datastore as ds_mod

    def boom(self, *a, **k):
        raise OSError("disk full (simulated)")

    monkeypatch.setattr(ds_mod.PredictionStore, "write_prediction", boom)
    config = _config(dataset, str(tmp_path) + "/out/")
    with pytest.raises(RuntimeError, match="disk full|streaming"):
        call_variant(config)
