"""Per-region resume journal tests (runtime/resume.py, SURVEY §5.4).

The headline scenario: kill -9 a streamed call_variant mid-stream, re-run
the same command, and get byte-identical VCFs WITHOUT re-encoding the
intervals that already completed. The crash is real (os._exit(9) from a
flush-count test hook in a subprocess); the resumed run must log the
replay and delete the journal on success.
"""
import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.util.synth import (plant_variants, random_genome, simulate_reads,
                              write_dataset, write_truth_vcf)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from pepper_tpu.options import PipelineConfig
from pepper_tpu.presets import set_parameters
from pepper_tpu.pipelines.call_variant import call_variant

config = PipelineConfig(**json.load(open(sys.argv[1])))
call_variant(set_parameters(config))
"""


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("resume"))
    genome = random_genome(32000, seed=61)
    variants = plant_variants(dict(genome), 10, 3, 3, seed=62)
    records = simulate_reads(genome, variants, coverage=35, seed=63,
                             error_rate=0.08)
    fasta, bam = write_dataset(tmp, genome, records)
    write_truth_vcf(os.path.join(tmp, "truth.vcf"), genome, variants)
    import jax
    from pepper_tpu.models.checkpoint import save_checkpoint
    from pepper_tpu.models.variant_model import init_variant_params
    params = init_variant_params(jax.random.PRNGKey(3))
    model = os.path.join(tmp, "model.npz")
    save_checkpoint(model, jax.tree_util.tree_map(np.asarray, params), {})
    return dict(tmp=tmp, fasta=fasta, bam=bam, model=model)


def _run(dataset, out_dir, tag, crash_after=0):
    cfg = dict(bam=dataset["bam"], fasta=dataset["fasta"],
               output_dir=out_dir, sub_command="call_variant",
               ont_r9_guppy5_sup=True, threads=2,
               model_path=dataset["model"], region_size=4000)
    cfg_path = os.path.join(dataset["tmp"], f"config_{tag}.json")
    with open(cfg_path, "w") as fh:
        json.dump(cfg, fh)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PEPPER_TPU_MIN_DEVICE_BATCH="64")
    if crash_after:
        env["PEPPER_TPU_TEST_CRASH_AFTER_FLUSH"] = str(crash_after)
    p = subprocess.run(
        [sys.executable, "-c", _DRIVER.format(repo=REPO), cfg_path],
        env=env, capture_output=True, timeout=600)
    return p


def _vcf_bytes(out_dir):
    paths = sorted(glob.glob(os.path.join(out_dir, "*.vcf.gz")))
    assert len(paths) == 5, paths
    return {os.path.basename(p): open(p, "rb").read() for p in paths}


def test_kill9_resume_byte_identical(dataset):
    # uninterrupted reference run
    ref_out = os.path.join(dataset["tmp"], "ref_out/")
    p = _run(dataset, ref_out, "ref")
    assert p.returncode == 0, p.stderr.decode()[-3000:]
    ref = _vcf_bytes(ref_out)

    # crashed run: hard-exits after 2 flushed batches
    out = os.path.join(dataset["tmp"], "crash_out/")
    p = _run(dataset, out, "crash", crash_after=2)
    assert p.returncode == 9, (p.returncode, p.stderr.decode()[-2000:])
    journal = glob.glob(out + "pepper_stream_*resume.journal")
    assert journal, "crashed run must leave its resume journal behind"
    # the partial VCFs of the crashed run are gone or absent (abort path
    # never ran — the process died hard — so files may exist but the
    # resumed run rewrites them from scratch)

    # resumed run: same command, fresh process
    p = _run(dataset, out, "resume")
    assert p.returncode == 0, p.stderr.decode()[-3000:]
    err = p.stderr.decode()
    assert "RESUME:" in err and "INTERVALS REPLAYED FROM JOURNAL" in err, \
        err[-2000:]
    # completed intervals were NOT re-encoded
    replayed = int(err.split("RESUME: ")[1].split("/")[0])
    assert replayed >= 1
    assert _vcf_bytes(out) == ref, \
        "resumed VCFs must be byte-identical to an uninterrupted run"
    assert not glob.glob(out + "pepper_stream_*resume.journal"), \
        "journal must be deleted after a successful run"


def test_double_crash_resume_byte_identical(dataset):
    """A second kill -9 mid-resume must still converge byte-identically:
    the compaction pass drops the first crash's partial rows, so old+new
    partials can never jointly (and falsely) complete an interval."""
    ref_out = os.path.join(dataset["tmp"], "ref2_out/")
    p = _run(dataset, ref_out, "ref2")
    assert p.returncode == 0, p.stderr.decode()[-3000:]
    ref = _vcf_bytes(ref_out)

    out = os.path.join(dataset["tmp"], "crash2_out/")
    p = _run(dataset, out, "crash2a", crash_after=2)
    assert p.returncode == 9, (p.returncode, p.stderr.decode()[-2000:])
    # second crash DURING the resumed run (crash counter only counts
    # newly journaled batches, not replayed ones)
    p = _run(dataset, out, "crash2b", crash_after=1)
    assert p.returncode == 9, (p.returncode, p.stderr.decode()[-2000:])
    p = _run(dataset, out, "resume2")
    assert p.returncode == 0, p.stderr.decode()[-3000:]
    assert "REPLAYED FROM JOURNAL" in p.stderr.decode()
    assert _vcf_bytes(out) == ref, \
        "twice-crashed run must still resume byte-identically"


def test_touched_bam_rejects_journal(dataset):
    """Changing the input BAM after a crash must invalidate the journal:
    replaying stale predictions against new reads would silently corrupt
    the VCF (VERDICT r4 weak #3)."""
    ref_out = os.path.join(dataset["tmp"], "ref3_out/")
    p = _run(dataset, ref_out, "ref3")
    assert p.returncode == 0, p.stderr.decode()[-3000:]
    ref = _vcf_bytes(ref_out)

    out = os.path.join(dataset["tmp"], "crash3_out/")
    p = _run(dataset, out, "crash3", crash_after=2)
    assert p.returncode == 9, (p.returncode, p.stderr.decode()[-2000:])
    os.utime(dataset["bam"])   # same bytes, new mtime = new identity
    p = _run(dataset, out, "resume3")
    assert p.returncode == 0, p.stderr.decode()[-3000:]
    assert "REPLAYED FROM JOURNAL" not in p.stderr.decode(), \
        "journal written against a different BAM identity must be rejected"
    assert _vcf_bytes(out) == ref


def test_record_roundtrip():
    from pepper_tpu.runtime.resume import _decode_record, _encode_record
    assert _decode_record(_encode_record(("total", 7, 123))) \
        == ("total", 7, 123)
    batch = ("batch", ["c1", "c1", "c2"], np.array([5, 9, 11], np.int64),
             np.array([30, 31, 32], np.int32),
             [["1A"], ["2AT", "3G"], []],
             np.array([4, 5, 6], np.int32),
             np.arange(9, dtype=np.float64).reshape(3, 3),
             [(0, 2), (3, 1)])
    kind, contigs, pos, dep, cands, freqs, probs, runs = \
        _decode_record(_encode_record(batch))
    assert (kind, contigs, cands, runs) == \
        ("batch", batch[1], batch[4], [(0, 2), (3, 1)])
    np.testing.assert_array_equal(pos, batch[2])
    np.testing.assert_array_equal(dep, batch[3])
    np.testing.assert_array_equal(freqs, batch[5])
    np.testing.assert_array_equal(probs, batch[6])
    # object dtypes are refused outright (no pickle, no code execution)
    import pytest as _pytest
    with _pytest.raises(TypeError):
        _encode_record(("batch", ["c"], np.array([object()]),
                        np.zeros(1), [[]], np.zeros(1), np.zeros((1, 3)),
                        [(0, 1)]))


def test_compaction_drops_incomplete_partials(tmp_path):
    """After compaction the journal holds only completed intervals; a
    fresh partial flush for a previously-partial interval cannot
    double-count with the stale rows."""
    from pepper_tpu.runtime.resume import (ResumeJournal, compact_journal,
                                           completed_intervals,
                                           load_journal, replay_slices)
    path = str(tmp_path / "j.journal")
    intervals = [("c1", 0, 999), ("c1", 1000, 1999)]
    j = ResumeJournal(path, intervals, "m.npz")
    j.append(("total", 0, 2))
    j.append(("total", 1, 4))
    # interval 0 complete (2 rows), interval 1 partial (3 of 4 rows)
    j.append(("batch", ["c1"] * 5, np.arange(5), np.full(5, 9),
              [["1A"]] * 5, np.arange(5), np.full((5, 3), 0.5),
              [(0, 2), (1, 3)]))
    j.close()
    totals, batches = load_journal(path, intervals, "m.npz")
    comp = completed_intervals(totals, batches)
    assert comp == {0: 2}
    replayed = list(replay_slices(batches, comp))
    compact_journal(path, intervals, "m.npz", (), comp,
                    [("batch",) + tuple(r) for r in replayed])

    # the resumed run re-encodes interval 1 and crashes after a partial
    # flush of 3 NEW rows: 3 old (dropped by compaction) + 3 new must NOT
    # fake-complete the 4-row interval
    j = ResumeJournal(path, intervals, "m.npz")
    j.append(("total", 1, 4))
    j.append(("batch", ["c1"] * 3, np.arange(3), np.full(3, 9),
              [["1A"]] * 3, np.arange(3), np.full((3, 3), 0.5),
              [(1, 3)]))
    j.close()
    totals, batches = load_journal(path, intervals, "m.npz")
    assert completed_intervals(totals, batches) == {0: 2}, \
        "interval 1 has only 3/4 rows flushed in the current generation"


def test_journal_rejects_mismatched_fingerprint(tmp_path):
    from pepper_tpu.runtime.resume import (ResumeJournal, load_journal)
    path = str(tmp_path / "j.journal")
    intervals = [("c1", 0, 999), ("c1", 1000, 1999)]
    j = ResumeJournal(path, intervals, "model_a.npz")
    j.append(("total", 0, 5))
    j.close()
    assert load_journal(path, intervals, "model_a.npz") is not None
    # different model or intervals -> journal ignored
    assert load_journal(path, intervals, "model_b.npz") is None
    assert load_journal(path, intervals[:1], "model_a.npz") is None


def test_journal_drops_torn_tail(tmp_path):
    from pepper_tpu.runtime.resume import ResumeJournal, load_journal
    path = str(tmp_path / "j.journal")
    intervals = [("c1", 0, 999)]
    j = ResumeJournal(path, intervals, "m.npz")
    j.append(("total", 0, 7))
    j.close()
    good = os.path.getsize(path)
    with open(path, "ab") as fh:   # simulate a torn write
        fh.write(b"\x55\x00\x00\x00\x99\x99\x99\x99partial...")
    totals, batches = load_journal(path, intervals, "m.npz")
    assert totals == {0: 7}
    # reopening truncates back to the valid prefix and appends cleanly
    j = ResumeJournal(path, intervals, "m.npz")
    j.append(("total", 1, 3))
    j.close()
    assert os.path.getsize(path) > good
    totals, _ = load_journal(path, intervals, "m.npz")
    assert totals == {0: 7, 1: 3}


def test_replay_slices_order_and_selection():
    from pepper_tpu.runtime.resume import completed_intervals, replay_slices
    # two batches; interval 0 complete (3 rows), interval 1 incomplete
    batches = [
        ("batch", ["c"] * 4, np.arange(4), np.full(4, 9), [["1A"]] * 4,
         np.arange(4), np.full((4, 3), 0.5), [(0, 2), (1, 2)]),
        ("batch", ["c"] * 3, np.arange(4, 7), np.full(3, 9), [["1C"]] * 3,
         np.arange(4, 7), np.full((3, 3), 0.25), [(0, 1), (1, 2)]),
    ]
    totals = {0: 3, 1: 10}
    comp = completed_intervals(totals, batches)
    assert comp == {0: 3}
    out = list(replay_slices(batches, comp))
    assert len(out) == 2
    np.testing.assert_array_equal(out[0][1], [0, 1])   # batch-0 rows of iv 0
    np.testing.assert_array_equal(out[1][1], [4])      # batch-1 row of iv 0
    assert out[0][6] == [(0, 2)] and out[1][6] == [(0, 1)]

# ---------------------------------------------------------------- polish

_POLISH_DRIVER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from pepper_tpu.polish.pipeline import polish
bam, draft, model, out = sys.argv[1:5]
polish(bam, draft, model, out, threads=2, realignment=False)
"""


@pytest.fixture(scope="module")
def polish_dataset(tmp_path_factory):
    from tests.util.synth import simulate_reads_fast
    from pepper_tpu.io.fasta import write_fasta
    from pepper_tpu.io.bam_writer import BamWriter
    tmp = str(tmp_path_factory.mktemp("polish_resume"))
    genome = random_genome(8000, seed=81, n_contigs=4)   # 4 x 2kb contigs
    edits = plant_variants(dict(genome), 8, 2, 2, seed=82)
    edits = [type(v)(v.contig, v.pos, v.ref, v.alt, (1, 1)) for v in edits]
    reads = simulate_reads_fast(genome, edits, coverage=25, read_length=1500,
                                error_rate=0.03, seed=83)
    draft = os.path.join(tmp, "draft.fa")
    write_fasta(draft, genome)
    bam = os.path.join(tmp, "reads.bam")
    with BamWriter(bam, [(n, len(s)) for n, s in genome]) as bw:
        for rec in reads:
            bw.write(rec)
    import jax
    from pepper_tpu.models.checkpoint import save_checkpoint
    from pepper_tpu.models.polish_model import init_polish_params
    params = init_polish_params(jax.random.PRNGKey(4))
    model = os.path.join(tmp, "polish_model.npz")
    save_checkpoint(model, jax.tree_util.tree_map(np.asarray, params), {})
    return dict(tmp=tmp, draft=draft, bam=bam, model=model)


def _run_polish(dataset, out_dir, crash_after=0):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    if crash_after:
        env["PEPPER_TPU_TEST_CRASH_AFTER_POLISH_FLUSH"] = str(crash_after)
    return subprocess.run(
        [sys.executable, "-c", _POLISH_DRIVER.format(repo=REPO),
         dataset["bam"], dataset["draft"], dataset["model"], out_dir],
        env=env, capture_output=True, timeout=600)


def test_polish_kill9_resume_byte_identical(polish_dataset):
    """Streamed polish now has the same crash-safe journal as the variant
    stream: kill -9 mid-run, rerun, byte-identical polished FASTA without
    re-encoding completed intervals (VERDICT r4 weak #4)."""
    ref_out = os.path.join(polish_dataset["tmp"], "ref_out/")
    p = _run_polish(polish_dataset, ref_out)
    assert p.returncode == 0, p.stderr.decode()[-3000:]
    ref = open(ref_out + "PEPPER_pepper_polished.fa", "rb").read()
    assert ref, "reference polish run produced an empty FASTA"

    out = os.path.join(polish_dataset["tmp"], "crash_out/")
    p = _run_polish(polish_dataset, out, crash_after=6)
    assert p.returncode == 9, (p.returncode, p.stderr.decode()[-2000:])
    assert os.path.isfile(out + "pepper_polish_resume.journal"), \
        "crashed polish run must leave its resume journal behind"

    p = _run_polish(polish_dataset, out)
    assert p.returncode == 0, p.stderr.decode()[-3000:]
    err = p.stderr.decode()
    assert "REPLAYED FROM JOURNAL" in err, err[-2000:]
    got = open(out + "PEPPER_pepper_polished.fa", "rb").read()
    assert got == ref, \
        "resumed polished FASTA must be byte-identical to uninterrupted run"
    assert not os.path.isfile(out + "pepper_polish_resume.journal"), \
        "journal must be deleted after a successful run"


def test_pseq_record_roundtrip():
    from pepper_tpu.runtime.resume import _decode_record, _encode_record
    rec = ("pseq", 3, 1000, 2100, 7, np.arange(5, dtype=np.int64),
           np.array([0, 0, 1, 0, 0], np.int32),
           np.array([1, 2, 3, 4, 0], np.uint8))
    kind, idx, start, end, cid, pos, index, bases = \
        _decode_record(_encode_record(rec))
    assert (kind, idx, start, end, cid) == ("pseq", 3, 1000, 2100, 7)
    np.testing.assert_array_equal(pos, rec[5])
    np.testing.assert_array_equal(index, rec[6])
    np.testing.assert_array_equal(bases, rec[7])
