"""Native local realigner tests (pepper_tpu/native/src/align.cpp)."""
import pytest

from pepper_tpu.io.sam import OP_M, OP_S
from pepper_tpu.native import bamio
from pepper_tpu.polish import realign
from tests.test_region_encoder import mk_read

pytestmark = pytest.mark.skipif(not bamio.available(),
                                reason="native build failed")


def test_realign_perfect_match_recovers_position():
    ref = "ACGTACGTAAGGCCTTACGTACGTGGCC" * 4
    query = ref[20:60]
    read = mk_read(0, query, [(OP_M, len(query))])  # wrong pos on purpose
    out = realign.align_reads_to_reference([read], ref, 1000)[0]
    assert out.pos == 1020
    assert out.cigar_tuples == [(OP_M, 40)]


def test_realign_insert_and_delete():
    ref = "ATCGGCTAAGCTTGCGCATATCGGATCCTTGGAACCAATT"
    # query: ref[5:35] with a 3-base insert after 10 read bases
    query = ref[5:15] + "GGG" + ref[15:35]
    read = mk_read(0, query, [(OP_M, len(query))])
    out = realign.align_reads_to_reference([read], ref, 0)[0]
    assert out.pos == 5
    ops = out.cigar_tuples
    assert (1, 3) in ops              # the insert found
    assert sum(l for op, l in ops if op in (0, 2)) == 30  # ref span

    # query with 4-base deletion
    query2 = ref[2:18] + ref[22:38]
    read2 = mk_read(0, query2, [(OP_M, len(query2))])
    out2 = realign.align_reads_to_reference([read2], ref, 0)[0]
    assert out2.pos == 2
    assert (2, 4) in out2.cigar_tuples


def test_realign_soft_clips_garbage_ends():
    ref = "ACGGATTACACGGATTACACGGATTACA"
    query = "TTTTT" + ref[4:24] + "GGGGG"
    read = mk_read(0, query, [(OP_M, len(query))])
    out = realign.align_reads_to_reference([read], ref, 0)[0]
    assert out.cigar_tuples[0] == (OP_S, 5)
    assert out.cigar_tuples[-1] == (OP_S, 5)
    assert out.pos == 4


def test_realign_no_alignment_keeps_original():
    read = mk_read(7, "TTTT", [(OP_M, 4)])
    out = realign.align_reads_to_reference([read], "CCCCCCCC", 0)[0]
    assert out.pos == 7  # kept as-is
