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


def test_fast_pass_matches_dp_quality_on_noisy_reads():
    """The k-mer fast pass (ssw_align_one_auto) must score within the
    affine-gap model no worse than the full banded DP on reads carrying
    substitutions AND indels (the seed-bounded-band path)."""
    import numpy as np
    from tests.util.synth import random_genome

    rng = np.random.RandomState(17)
    ref = random_genome(1200, seed=18)[0][1]
    bases = "ACGT"

    def score(read, out):
        # affine-gap score of the produced alignment
        s, qi, rp = 0, 0, out.pos
        for op, length in out.cigar_tuples:
            if op == 0:
                for k in range(length):
                    s += 4 if read[qi + k] == ref[rp + k] else -6
                qi += length
                rp += length
            elif op == 1:
                s -= 8 + 2 * (length - 1)
                qi += length
            elif op == 2:
                s -= 8 + 2 * (length - 1)
                rp += length
            elif op == 4:
                qi += length
        return s

    for trial in range(25):
        lo = int(rng.randint(0, 500))
        seq = list(ref[lo:lo + 500])
        for j in range(len(seq) - 1, -1, -1):
            r = rng.rand()
            if r < 0.04:
                seq[j] = bases[rng.randint(4)]
            elif r < 0.05:
                seq.insert(j, bases[rng.randint(4)])
            elif r < 0.06:
                del seq[j]
        seq = "".join(seq)
        read = mk_read(lo, seq, [(OP_M, len(seq))], name=f"t{trial}")
        fast = realign.align_reads_to_reference([read], ref, 0,
                                                band=128)[0]
        slow = realign.align_reads_to_reference([read], ref, 0, band=0)[0]
        # the fast pass may pick a different (gapless or small-band) path,
        # but must not be meaningfully worse than the full DP optimum
        assert score(seq, fast) >= 0.9 * score(seq, slow), trial
