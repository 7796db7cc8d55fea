"""Native VCF sink differentials: byte-identity vs the Python engine.

The Python VCFWriteEngine is the tested oracle (reference parity lives
there); the native sink (native/src/vcf_write.cpp via io/vcf_native.py)
must produce bit-identical .vcf.gz and .tbi files for the same sites —
including float formatting (round + %.6g), BGZF framing, tabix bins and
routing/totals.
"""
import os

import numpy as np
import pytest

from pepper_tpu.io.vcf import VCFWriteEngine, read_vcf
from pepper_tpu.io.vcf_native import (NativeVCFWriteEngine,
                                      native_vcf_available)
from pepper_tpu.options import PipelineConfig
from pepper_tpu.presets import set_parameters

pytestmark = pytest.mark.skipif(not native_vcf_available(),
                                reason="native library unavailable")

CONTIGS = [("chr1", 5_000_000), ("chr2", 3_000_000)]


def options():
    return set_parameters(PipelineConfig(sub_command="find_candidates",
                                         ont_r9_guppy5_sup=True))


def fuzz_sites(rng, n, contig="chr1"):
    """Single-candidate site rows spanning SNPs, insertions, deletions,
    refCalls, repeat flags, extreme probabilities and zero depths."""
    positions = np.sort(rng.choice(np.arange(100, 4_000_000), n,
                                   replace=False))
    bases = "ACGT"
    rows = []
    for pos in positions:
        kind = rng.integers(0, 3)
        if kind == 0:     # SNP
            ref = bases[rng.integers(4)]
            alt = bases[rng.integers(4)]
        elif kind == 1:   # insertion
            ref = bases[rng.integers(4)]
            alt = ref + "".join(bases[rng.integers(4)]
                                for _ in range(rng.integers(1, 8)))
        else:             # deletion (ref longer; the gates' del swap shape)
            alt = bases[rng.integers(4)]
            ref = alt + "".join(bases[rng.integers(4)]
                                for _ in range(rng.integers(1, 12)))
        preds = rng.random(3) ** np.float64(rng.integers(1, 6))
        preds = preds / preds.sum()
        if rng.random() < 0.1:
            preds = np.array([1.0 - 2e-10, 1e-10, 1e-10])  # qual clamp path
        pg = 0 if preds[0] >= preds[1] and preds[0] >= preds[2] else (
            1 if preds[1] >= preds[2] else 2)
        depth = int(rng.integers(0, 90))
        support = int(rng.integers(0, max(1, depth) + 1))
        rows.append(dict(
            contig=contig, pos=int(pos), ref=ref, alt=alt, pg=pg,
            preds=preds, gt_prob=float(preds[pg]),
            nap=float(max(preds[1], preds[2])), depth=depth,
            support=support, in_repeat=bool(rng.random() < 0.3)))
    return rows


def row_tuple(r):
    gt = ([0, 0], [0, 1], [1, 1])[r["pg"]]
    return (r["contig"], r["pos"], r["pos"] + len(r["ref"]), r["ref"],
            [r["alt"]], gt, r["depth"], [r["support"]], r["gt_prob"],
            list(r["preds"]), [r["nap"]], r["in_repeat"])


def read_all_bytes(paths):
    out = {}
    for k, p in paths.items():
        out[k] = open(p, "rb").read()
        out[k + ".tbi"] = open(p + ".tbi", "rb").read()
    return out


def test_fuzz_single_candidate_batch_byte_identity(tmp_path):
    rng = np.random.default_rng(23)
    opts = options()
    rows = fuzz_sites(rng, 4000)

    pydir = str(tmp_path / "py") + "/"
    ntdir = str(tmp_path / "nt") + "/"
    os.makedirs(pydir), os.makedirs(ntdir)
    py = VCFWriteEngine(CONTIGS, "SAMPLE", pydir)
    nt = NativeVCFWriteEngine(CONTIGS, "SAMPLE", ntdir, opts)

    for r in rows:
        py.write_site([row_tuple(r)], opts)
    # native: batched in uneven slices (exercises cross-batch state)
    i = 0
    while i < len(rows):
        j = min(len(rows), i + int(rng.integers(1, 700)))
        chunk = rows[i:j]
        nt.write_sites_batch(
            "chr1", [r["pos"] for r in chunk],
            [r["ref"] for r in chunk], [r["alt"] for r in chunk],
            [r["pg"] for r in chunk], [r["depth"] for r in chunk],
            [r["support"] for r in chunk], [r["gt_prob"] for r in chunk],
            [r["nap"] for r in chunk], [r["in_repeat"] for r in chunk])
        i = j
    assert py.totals == nt.totals
    py.close()
    nt.close()
    pyb, ntb = read_all_bytes(py.paths), read_all_bytes(nt.paths)
    for k in pyb:
        assert pyb[k] == ntb[k], f"{k} differs between engines"
    # sanity: the outputs parse and carry records
    recs = read_vcf(nt.paths["full"])
    assert len(recs) == len(rows)


def test_multi_candidate_and_mixed_order(tmp_path):
    """Multi-candidate sites go through write_site (python renderer into
    the native sink) interleaved with batch calls; bytes still match the
    all-python engine fed the same site sequence."""
    rng = np.random.default_rng(29)
    opts = options()
    rows = fuzz_sites(rng, 300)

    pydir = str(tmp_path / "py") + "/"
    ntdir = str(tmp_path / "nt") + "/"
    os.makedirs(pydir), os.makedirs(ntdir)
    py = VCFWriteEngine(CONTIGS, "SAMPLE", pydir)
    nt = NativeVCFWriteEngine(CONTIGS, "SAMPLE", ntdir, opts)

    for i, r in enumerate(rows):
        if i % 7 == 3:
            # multi-candidate site: two alleles at one position
            r2 = dict(r)
            r2["alt"] = "T" if r["alt"][0] != "T" else "G"
            site = [row_tuple(r), row_tuple(r2)]
            py.write_site(site, opts)
            nt.write_site(site, opts)
        else:
            py.write_site([row_tuple(r)], opts)
            nt.write_sites_batch(
                "chr1", [r["pos"]], [r["ref"]], [r["alt"]], [r["pg"]],
                [r["depth"]], [r["support"]], [r["gt_prob"]], [r["nap"]],
                [r["in_repeat"]])
    assert py.totals == nt.totals
    py.close()
    nt.close()
    pyb, ntb = read_all_bytes(py.paths), read_all_bytes(nt.paths)
    for k in pyb:
        assert pyb[k] == ntb[k], f"{k} differs between engines"


def test_last_position_skip_and_two_contigs(tmp_path):
    """Engine-level last_position de-dup applies across batch boundaries,
    and multiple contigs produce correct multi-ref tabix files."""
    opts = options()
    pydir = str(tmp_path / "py") + "/"
    ntdir = str(tmp_path / "nt") + "/"
    os.makedirs(pydir), os.makedirs(ntdir)
    py = VCFWriteEngine(CONTIGS, "S", pydir)
    nt = NativeVCFWriteEngine(CONTIGS, "S", ntdir, opts)

    def mk(contig, pos, alt="C"):
        return dict(contig=contig, pos=pos, ref="A", alt=alt, pg=1,
                    preds=np.array([0.1, 0.8, 0.1]), gt_prob=0.8, nap=0.8,
                    depth=30, support=12, in_repeat=False)

    seq = [mk("chr1", 100), mk("chr1", 200), mk("chr2", 200),
           mk("chr2", 300)]
    for r in seq:
        py.write_site([row_tuple(r)], opts)
    # duplicate position right at a batch boundary must be skipped
    dup = mk("chr1", 200, alt="G")
    py.write_site([row_tuple(dup)], opts)  # skipped: same pos as previous?
    # (row at chr2 200 after chr1 200: last_position IS 200 -> skipped by
    # the reference's cross-contig quirk; the sequence above already
    # exercises it: chr2:200 is dropped by both engines)

    def batch(contig, rs):
        nt.write_sites_batch(contig, [r["pos"] for r in rs],
                             [r["ref"] for r in rs], [r["alt"] for r in rs],
                             [r["pg"] for r in rs], [r["depth"] for r in rs],
                             [r["support"] for r in rs],
                             [r["gt_prob"] for r in rs],
                             [r["nap"] for r in rs],
                             [r["in_repeat"] for r in rs])

    batch("chr1", seq[:2])
    batch("chr2", seq[2:])
    batch("chr1", [dup])
    assert py.totals == nt.totals
    py.close()
    nt.close()
    pyb, ntb = read_all_bytes(py.paths), read_all_bytes(nt.paths)
    for k in pyb:
        assert pyb[k] == ntb[k], f"{k} differs between engines"
    recs = read_vcf(nt.paths["full"])
    # chr2:200 skipped (last_position == 200, the reference's cross-contig
    # quirk); the trailing chr1:200 dup IS written (last_position is 300
    # by then — last_position is not a per-contig seen-set)
    assert [(r.contig, r.pos) for r in recs] == [
        ("chr1", 100), ("chr1", 200), ("chr2", 300), ("chr1", 200)]


def test_emitter_columnar_matches_tuple_path(tmp_path):
    """The ordered emitter's columnar lane (ColumnarDv -> native batch
    writes, duplicate-position fallback included) produces the same bytes
    as the classic tuple/per-site path over the Python engine — fuzzed
    buckets with same-position multi-candidate sites and cross-batch
    interval splits."""
    from pepper_tpu.pipelines.find_candidates import (ColumnarDv,
                                                      _OrderedEmitter)
    opts = options()
    rng = np.random.default_rng(41)
    intervals = [("chr1", 0, 99_999), ("chr1", 100_000, 199_999),
                 ("chr2", 0, 99_999)]

    def build_blocks():
        """ColumnarDv blocks spanning the intervals, with a couple of
        duplicate positions (multi-candidate sites -> fallback path)."""
        blocks = []
        for contig, lo, n in (("chr1", 50, 300), ("chr1", 100_050, 200),
                              ("chr2", 10, 150)):
            pos = np.sort(rng.choice(np.arange(lo, lo + 60_000), n,
                                     replace=False))
            # duplicate a few positions (same-position second allele)
            dup = pos[rng.integers(0, n, 4)]
            pos = np.sort(np.concatenate([pos, dup]))
            m = len(pos)
            alts = ["ACGT"[int(i)] for i in rng.integers(0, 4, m)]
            preds = rng.random((m, 3)) ** 2
            preds /= preds.sum(1, keepdims=True)
            pg = np.where(
                (preds[:, 0] >= preds[:, 1]) & (preds[:, 0] >= preds[:, 2]),
                0, np.where(preds[:, 1] >= preds[:, 2], 1, 2))
            blocks.append(ColumnarDv(
                contig, pos.astype(np.int64), ["A"] * m, alts,
                pg.astype(np.uint8),
                rng.integers(1, 60, m).astype(np.int32),
                rng.integers(0, 40, m).astype(np.int32),
                preds[np.arange(m), pg],
                np.maximum(preds[:, 1], preds[:, 2]),
                rng.random(m) < 0.25, preds))
        return blocks

    blocks = build_blocks()

    def run(writer, as_tuples):
        em = _OrderedEmitter(writer, opts, intervals)
        for i in range(len(intervals)):
            em.note_interval(i, 1)
        for b in blocks:
            em.gated(b.tuples() if as_tuples else [b],
                     [(0, 0)])   # credit rows separately below
        em.gated([], [(i, 1) for i in range(len(intervals))])
        return em.finish()

    pydir = str(tmp_path / "py") + "/"
    ntdir = str(tmp_path / "nt") + "/"
    os.makedirs(pydir), os.makedirs(ntdir)
    py_tot, py_paths = run(VCFWriteEngine(CONTIGS, "S", pydir), True)
    nt_tot, nt_paths = run(
        NativeVCFWriteEngine(CONTIGS, "S", ntdir, opts), False)
    assert py_tot == nt_tot
    pyb = read_all_bytes(py_paths)
    ntb = read_all_bytes(nt_paths)
    for k in pyb:
        assert pyb[k] == ntb[k], f"{k} differs between emitter paths"
    assert any(nt_tot), "fuzz should write records"
