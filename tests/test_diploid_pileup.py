"""Oracle tests for the diploid-label pileup encoder (the variant package's
SummaryGenerator twin) — pepper_tpu/encode/diploid_pileup.py vs
hand-computed expectations transcribed from
reference pepper_variant/modules/cpp/summary_generator.cpp."""
import numpy as np

from pepper_tpu.encode.diploid_pileup import (DiploidPileupSummary,
                                              check_base, get_feature_index,
                                              get_labels,
                                              get_reference_feature_index)
from pepper_tpu.io.sam import OP_M, OP_I, OP_D, OP_S, OP_N
from tests.test_region_encoder import mk_read


def test_feature_index_strand_layout():
    # summary_generator.cpp:16-32: REVERSE occupies 0-3/8, forward 4-7/9
    assert [get_feature_index(b, True) for b in "ACGT"] == [0, 1, 2, 3]
    assert [get_feature_index(b, False) for b in "ACGT"] == [4, 5, 6, 7]
    assert get_feature_index("*", True) == 8
    assert get_feature_index("N", False) == 9


def test_reference_feature_index():
    assert [get_reference_feature_index(b) for b in "ACGT*N"] == \
        [1, 2, 3, 4, 0, 0]


def test_diploid_label_table():
    # summary_generator.cpp:44-88, symmetric in the two haplotypes
    assert get_labels("*", "*") == 0
    assert get_labels("A", "A") == 1
    assert get_labels("A", "C") == 2 == get_labels("C", "A")
    assert get_labels("A", "T") == 3 == get_labels("T", "A")
    assert get_labels("A", "G") == 4 == get_labels("G", "A")
    assert get_labels("A", "*") == 5 == get_labels("*", "A")
    assert get_labels("C", "C") == 6
    assert get_labels("C", "T") == 7
    assert get_labels("C", "G") == 8
    assert get_labels("C", "*") == 9
    assert get_labels("T", "T") == 10
    assert get_labels("T", "G") == 11 == get_labels("G", "T")
    assert get_labels("T", "*") == 12
    assert get_labels("G", "G") == 13
    assert get_labels("G", "*") == 14
    # unmapped pairs (incl. '#') fall back to 0
    assert get_labels("#", "A") == 0
    assert get_labels("N", "N") == 0
    assert not check_base("") and check_base("#") and check_base("*")


def test_pileup_counts_and_image():
    ref = "ACGTACGTAC"
    s = DiploidPileupSummary(ref, "c1", 0, 9)
    reads = [mk_read(0, ref, [(OP_M, 10)], name="r1"),
             mk_read(0, ref, [(OP_M, 10)], name="r2"),
             mk_read(0, ref, [(OP_M, 10)], reverse=True, name="r3")]
    s.generate_summary(reads, 0, 9)
    assert s.genomic_pos == [(i, 0) for i in range(10)]
    assert s.ref_image == [get_reference_feature_index(b) for b in ref]
    # position 0 = 'A': 2 forward (col 4), 1 reverse (col 0); coverage 3
    row0 = s.image[0]
    assert row0[4] == int(np.uint8(2 / 3 * 254))
    assert row0[0] == int(np.uint8(1 / 3 * 254))
    assert sum(row0) == row0[0] + row0[4]


def test_insert_and_delete_quirks():
    ref = "AAAAAAAAAA"
    s = DiploidPileupSummary(ref, "c1", 0, 9)
    # read with a 2-base insert after pos 2 and a 3-base delete at pos 5
    reads = [mk_read(0, "AAACCAA" + "AA", [(OP_M, 3), (OP_I, 2), (OP_M, 2),
                                           (OP_D, 3), (OP_M, 2)])]
    s.generate_summary(reads, 0, 9)
    # insert columns expand genomic_pos at anchor pos 2
    assert (2, 1) in s.genomic_pos and (2, 2) in s.genomic_pos
    assert len(s.genomic_pos) == 12
    # delete: '*' counted forward (col 9? no: '*' fwd == col 9 is non-ACGT
    # forward bucket) at positions 5,6,7
    star_col = get_feature_index("*", False)
    for pos in (5, 6, 7):
        row = s.image[s.genomic_pos.index((pos, 0))]
        assert row[star_col] > 0
    # quirk: DEL bumps coverage at the op START (pos 5) once per deleted
    # base -> coverage[5] == 1(match-era? no match at 5) + 3
    assert s._coverage[5] == 3.0
    assert 6 not in s._coverage and 7 not in s._coverage
    # inserts never bump coverage: anchor coverage comes from matches only
    assert s._coverage[2] == 1.0


def test_ref_skip_falls_through_to_delete():
    ref = "ACGTACGT"
    s = DiploidPileupSummary(ref, "c1", 0, 7)
    reads = [mk_read(0, "ACGT", [(OP_M, 2), (OP_N, 4), (OP_M, 2)])]
    s.generate_summary(reads, 0, 7)
    star_fwd = get_feature_index("*", False)
    for pos in (2, 3, 4, 5):
        assert s.image[pos][star_fwd] > 0


def test_train_labels_diploid():
    ref = "ACGTACGTAC"
    s = DiploidPileupSummary(ref, "c1", 0, 9)
    reads = [mk_read(0, ref, [(OP_M, 10)])]
    # hp1 truth == ref; hp2 truth has a SNP at pos 4 (A->G)
    t1 = mk_read(0, ref, [(OP_M, 10)], name="t1")
    t2 = mk_read(0, "ACGTGCGTAC", [(OP_M, 10)], name="t2")
    s.generate_train_summary(reads, 0, 9, t1, t2)
    assert len(s.labels) == 10
    assert s.labels[0] == get_labels("A", "A")
    assert s.labels[4] == get_labels("A", "G")
    # all labels valid -> only the final sentinel in bad_label_positions
    assert s.bad_label_positions == [10]


def test_train_labels_uncovered_and_bad():
    ref = "ACGTACGTAC"
    s = DiploidPileupSummary(ref, "c1", 0, 9)
    # reads cover only positions 0-4
    reads = [mk_read(0, "ACGTA", [(OP_M, 5)])]
    # truth covers only positions 0-6 -> 7..9 unlabeled (bad)
    t = mk_read(0, "ACGTACG", [(OP_M, 7)], name="t")
    s.generate_train_summary(reads, 0, 9, t, t)
    # positions 5,6: no coverage -> get_labels('*','*') == 0, label valid
    assert s.labels[5] == 0 and s.labels[6] == 0
    # positions 7-9: missing truth char -> bad (stored as 1-based indices)
    assert s.bad_label_positions == [8, 9, 10, 10]


def test_truth_insert_truncation_and_padding():
    ref = "AAAA"
    s = DiploidPileupSummary(ref, "c1", 0, 3)
    # observed insert of length 2 at anchor 1
    reads = [mk_read(0, "AACCAA", [(OP_M, 2), (OP_I, 2), (OP_M, 2)])]
    # hp1 truth has a 3-base insert (truncated to 2); hp2 has 1 (padded '*')
    t1 = mk_read(0, "AACCCAA", [(OP_M, 2), (OP_I, 3), (OP_M, 2)], name="t1")
    t2 = mk_read(0, "AAGAA", [(OP_M, 2), (OP_I, 1), (OP_M, 2)], name="t2")
    s.generate_train_summary(reads, 0, 3, t1, t2)
    ins_labels = [s.labels[s.genomic_pos.index((1, 1))],
                  s.labels[s.genomic_pos.index((1, 2))]]
    assert ins_labels[0] == get_labels("C", "G")
    assert ins_labels[1] == get_labels("C", "*")


def test_chunk_image_inference_padding():
    ref = "ACGTACGTAC"
    s = DiploidPileupSummary(ref, "c1", 0, 9)
    s.generate_summary([mk_read(0, ref, [(OP_M, 10)])], 0, 9)
    out = s.chunk_image(chunk_size=6, chunk_overlap=2, image_height=10)
    assert out.chunk_ids == [0, 1]
    assert [len(c) for c in out.images] == [6, 6]
    # second chunk starts at 6-2=4, covers 4..9, no padding
    assert out.positions[1][0] == (4, 0)
    # single short region pads on the right
    s2 = DiploidPileupSummary("ACG", "c1", 0, 2)
    s2.generate_summary([mk_read(0, "ACG", [(OP_M, 3)])], 0, 2)
    out2 = s2.chunk_image(chunk_size=6, chunk_overlap=2, image_height=10)
    assert out2.positions[0][3:] == [(-1, -1)] * 3
    assert out2.refs[0][3:] == [0, 0, 0]
    assert out2.images[0][3] == [0] * 10


def test_chunk_image_train_segments():
    ref = "A" * 20
    s = DiploidPileupSummary(ref, "c1", 0, 19)
    reads = [mk_read(0, ref, [(OP_M, 20)])]
    # truth missing position 10 -> bad label splits the region
    t = mk_read(0, "A" * 10, [(OP_M, 10), (OP_D, 1), (OP_M, 0)], name="t")
    t2 = mk_read(0, ref, [(OP_M, 20)], name="t2")
    s.generate_train_summary(reads, 0, 19, t2, t2)
    assert s.bad_label_positions == [20]
    out = s.chunk_image_train(chunk_size=8, chunk_overlap=2, image_height=10,
                              chunk_id_start=5)
    assert out.chunk_ids[0] == 5
    # all chunks exactly chunk_size, last one left-shifted to fit
    assert all(len(c) == 8 for c in out.images)
    assert out.positions[-1][-1] == (19, 0)
    assert all(len(l) == 8 for l in out.labels)
