"""Acceptance-harness tests (pepper_tpu/utils/acceptance.py).

The comparator and diff logic are tested on synthetic VCFs; the full
HG002 quickstart run is exercised only when the pinned data is present
(PEPPER_TPU_ACCEPTANCE_DIR + PEPPER_TPU_ACCEPTANCE_MODEL env vars) and
skips cleanly offline — mirroring the harness's own offline behavior.
"""
import os

import pytest

from pepper_tpu.utils import acceptance


def write_vcf(path, records):
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1"]
    for contig, pos1, ref, alts, gt, filt in records:
        lines.append(f"{contig}\t{pos1}\t.\t{ref}\t{','.join(alts)}\t30\t"
                     f"{filt}\t.\tGT\t{gt}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def test_evaluate_allele_match(tmp_path):
    truth = write_vcf(str(tmp_path / "truth.vcf"), [
        ("chr20", 1000100, "A", ["C"], "0/1", "PASS"),       # SNP hit
        ("chr20", 1000200, "G", ["GTT"], "1/1", "PASS"),     # INDEL hit
        ("chr20", 1000300, "T", ["A"], "0|1", "PASS"),       # SNP missed
        ("chr20", 2000000, "T", ["A"], "0/1", "PASS"),       # out of region
    ])
    ours = write_vcf(str(tmp_path / "ours.vcf"), [
        ("chr20", 1000100, "A", ["C"], "0/1", "PASS"),
        ("chr20", 1000200, "G", ["GTT"], "0/1", "PASS"),
        ("chr20", 1000400, "C", ["G"], "1/1", "PASS"),       # SNP FP
        ("chr20", 1000500, "C", ["G"], "0/0", "refCall"),    # refcall ignored
        ("chr20", 1000600, "C", ["G"], "0/1", "lowQUAL"),    # filtered out
    ])
    rep = acceptance.evaluate(ours, truth, None,
                              region="chr20:1000000-1020000")
    assert rep["SNP"] == dict(truth_total=2, tp=1, fn=1, fp=1, recall=0.5,
                              precision=0.5, f1=0.5)
    assert rep["INDEL"]["tp"] == 1 and rep["INDEL"]["fp"] == 0
    assert rep["INDEL"]["f1"] == 1.0


def test_evaluate_normalizes_padded_alleles(tmp_path):
    """A suffix-padded multiallelic call matches the minimal truth allele,
    and only CALLED alts of a multiallelic record count."""
    truth = write_vcf(str(tmp_path / "truth.vcf"), [
        ("chr20", 1000100, "AT", ["CT"], "0/1", "PASS"),     # = A->C SNP
    ])
    ours = write_vcf(str(tmp_path / "ours.vcf"), [
        ("chr20", 1000100, "A", ["C", "G"], "0/1", "PASS"),  # only C called
    ])
    rep = acceptance.evaluate(ours, truth, None,
                              region="chr20:1000000-1020000")
    assert rep["SNP"]["tp"] == 1
    assert rep["SNP"]["fp"] == 0  # the uncalled G alt does not count


def test_evaluate_bed_restriction(tmp_path):
    truth = write_vcf(str(tmp_path / "truth.vcf"), [
        ("chr20", 1000100, "A", ["C"], "0/1", "PASS"),
        ("chr20", 1000200, "A", ["C"], "0/1", "PASS"),
    ])
    ours = write_vcf(str(tmp_path / "ours.vcf"), [
        ("chr20", 1000100, "A", ["C"], "0/1", "PASS"),
    ])
    bed = str(tmp_path / "conf.bed")
    with open(bed, "w") as fh:
        fh.write("chr20\t1000000\t1000150\n")   # excludes the second truth
    rep = acceptance.evaluate(ours, truth, bed,
                              region="chr20:1000000-1020000")
    assert rep["SNP"]["truth_total"] == 1
    assert rep["SNP"]["recall"] == 1.0


def test_diff_records(tmp_path):
    a = write_vcf(str(tmp_path / "a.vcf"), [
        ("chr20", 10, "A", ["C"], "0/1", "PASS"),
        ("chr20", 20, "G", ["T"], "1/1", "PASS"),
    ])
    b = write_vcf(str(tmp_path / "b.vcf"), [
        ("chr20", 10, "A", ["C"], "0/1", "PASS"),
        ("chr20", 30, "G", ["T"], "1/1", "PASS"),
    ])
    d = acceptance.diff_records(a, b)
    assert d == dict(identical=1, only_ours=1, only_expected=1)


def test_offline_skip_is_clean(tmp_path, capsys):
    """No data, no network: the harness returns 0 (skip), never raises."""
    rc = acceptance.run_acceptance(str(tmp_path / "nodata"), None,
                                   str(tmp_path / "out"))
    assert rc == 0


@pytest.mark.skipif(
    not (os.environ.get("PEPPER_TPU_ACCEPTANCE_DIR")
         and os.environ.get("PEPPER_TPU_ACCEPTANCE_MODEL")),
    reason="quickstart data not available (set PEPPER_TPU_ACCEPTANCE_DIR "
           "and PEPPER_TPU_ACCEPTANCE_MODEL)")
def test_quickstart_acceptance_real_data(tmp_path):
    rc = acceptance.run_acceptance(
        os.environ["PEPPER_TPU_ACCEPTANCE_DIR"],
        os.environ["PEPPER_TPU_ACCEPTANCE_MODEL"],
        str(tmp_path / "out"), threads=2)
    assert rc == 0


def test_verdict_gates_on_record_diff():
    """When an expected VCF is provided, the acceptance bar is record
    equality, not just recall (VERDICT r4 weak #5)."""
    good = {"SNP": dict(recall=1.0), "INDEL": dict(recall=1.0)}
    assert acceptance.acceptance_verdict(good) is True
    assert acceptance.acceptance_verdict(
        good, dict(identical=10, only_ours=0, only_expected=0)) is True
    assert acceptance.acceptance_verdict(
        good, dict(identical=9, only_ours=1, only_expected=0)) is False
    assert acceptance.acceptance_verdict(
        good, dict(identical=9, only_ours=0, only_expected=1)) is False
    low = {"SNP": dict(recall=0.8), "INDEL": dict(recall=1.0)}
    assert acceptance.acceptance_verdict(low) is False
