"""Tests for the legacy (dormant-in-reference) C++ candidate finder port.

Semantics under test come from pepper_variant/modules/cpp/candidate_finder.cpp
and candidate_finder_hp.cpp; quirks asserted explicitly (last-position scan
gap, int-truncated frequency, no-gate non-HP path).
"""
import pytest

from pepper_tpu.io.bam_reader import TrimmedRead
from pepper_tpu.io.sam import OP_D, OP_I, OP_M, OP_S
from pepper_tpu.pipelines.candidate_finder_legacy import (
    DECODED_BASE_LABELS, DELETE_ALLELE, INSERT_ALLELE, SNP_ALLELE,
    CandidateFinderCPP, LegacyCandidateFinder, LegacyCandidateFinderHP,
    get_genotype, get_genotype_from_base, get_index_from_base)

REF = "ACGTACGTACGTACGTACGT"  # 20 bp, ref_start == region_start == 0


def read(pos, seq, cigar, name="r", quals=None):
    quals = quals if quals is not None else [30] * len(seq)
    return TrimmedRead(query_name=name, pos=pos, pos_end=pos + len(seq),
                       sequence=seq, base_qualities=quals,
                       cigar_tuples=cigar, mapping_quality=60, flags=0,
                       hp_tag=0, bad_indices=[])


def finder():
    return LegacyCandidateFinder(REF, "chr1", 0, 19, 0, 20)


def snp_reads(n, pos=5, alt="T"):
    # REF[5] == 'C'; full-length match reads with one mismatch at `pos`
    out = []
    for k in range(n):
        seq = REF[:pos] + alt + REF[pos + 1:]
        out.append(read(0, seq, [(OP_M, 20)], name=f"s{k}"))
    return out


def test_consensus_finds_snp_site_and_skips_last_position():
    f = finder()
    reads = snp_reads(4) + [read(0, REF, [(OP_M, 20)], name="wt")]
    # also plant a mismatch at the FINAL region position (19) on every read —
    # the reference's scan loop never tests it (candidate_finder.cpp:331)
    tail = [read(0, REF[:19] + "A", [(OP_M, 20)], name=f"t{k}")
            for k in range(4)]
    positions = f.find_candidates_consensus(reads + tail, 0.4, 0.5, 0.5)
    assert 5 in positions
    assert 19 not in positions


def test_consensus_insert_and_delete_frequencies():
    f = finder()
    ins = [read(0, REF[:10] + "GG" + REF[10:], [(OP_M, 10), (OP_I, 2),
                                                (OP_M, 10)], name=f"i{k}")
           for k in range(3)]
    dele = [read(0, REF[:10] + REF[12:], [(OP_M, 10), (OP_D, 2),
                                          (OP_M, 8)], name=f"d{k}")
            for k in range(3)]
    wt = [read(0, REF, [(OP_M, 20)], name=f"w{k}") for k in range(3)]
    positions = f.find_candidates_consensus(ins + dele + wt, 2.0, 0.3, 0.3)
    assert 9 in positions  # indel anchors mount at pos-1
    positions_hi = finder().find_candidates_consensus(
        ins + dele + wt, 2.0, 0.9, 0.9)
    assert 9 not in positions_hi


def test_find_candidates_snp_branch_no_freq_gate():
    f = finder()
    # ONE read with the SNP — the non-HP path has no frequency gate
    reads = snp_reads(1) + [read(0, REF, [(OP_M, 20)], name="wt")]
    # prediction at position 5: label 'CT' (index 14) with prob .9
    label = DECODED_BASE_LABELS.index("CT")
    predictions = [[0.0] * 28]
    predictions[0][label] = 0.9
    records = f.find_candidates(reads, [5], predictions, [label])
    by_pos = {r.pos_start: r for r in records}
    assert 5 in by_pos
    cands = by_pos[5].candidates
    assert len(cands) == 1
    c = cands[0]
    assert (c.allele.ref, c.allele.alt, c.allele.alt_type) == \
        ("C", "T", SNP_ALLELE)
    assert c.allele_probability == pytest.approx(0.9)
    assert c.genotype == 1  # ref 'C', predicted pair ('C','T') -> het
    assert c.read_support == 1 and c.depth == 2


def test_find_candidates_snp_not_in_prediction_pair_dropped():
    f = finder()
    reads = snp_reads(3)
    label = DECODED_BASE_LABELS.index("AA")  # predicted pair lacks 'T'
    predictions = [[0.0] * 28]
    predictions[0][label] = 0.8
    records = f.find_candidates(reads, [5], predictions, [label])
    # site is candidate_found (record emitted) but no candidate attached
    by_pos = {r.pos_start: r for r in records}
    assert 5 in by_pos and by_pos[5].candidates == []


def test_anchor_base_before_indel_not_a_snp():
    f = finder()
    # mismatch at pos 9 immediately followed by an insert: anchor-base skip
    seq = REF[:9] + "A" + "GG" + REF[10:]
    r = read(0, seq, [(OP_M, 10), (OP_I, 2), (OP_M, 10)])
    records = f.find_candidates([r], [9], [[0.0] * 28], [0])
    cands = [c for rec in records for c in rec.candidates
             if c.allele.alt_type == SNP_ALLELE]
    assert cands == []


def test_genotype_helpers():
    assert get_genotype("RR") == 0
    assert get_genotype("RA") == 1
    assert get_genotype("AA") == 2
    assert get_genotype("AC") == 1
    assert get_genotype_from_base("C", "R", "R") == 0
    assert get_genotype_from_base("C", "R", "T") == 1
    assert get_genotype_from_base("C", "T", "T") == 2
    assert get_genotype_from_base("C", "A", "T") == 1
    assert get_index_from_base("*") == 0 and get_index_from_base("T") == 4


def hp_finder():
    return LegacyCandidateFinderHP(REF, "chr1", 0, 19, 0, 20)


def uniform_hp_predictions(positions, hot=None):
    """5-class count vectors per (position, index=0); `hot` maps position ->
    (winning base index, count)."""
    h1, h2 = [], []
    for p in positions:
        v = [1, 1, 1, 1, 1]
        if hot and p in hot:
            idx, count = hot[p]
            v = [1] * 5
            v[idx] = count
        h1.append(list(v))
        h2.append(list(v))
    return h1, h2


def test_hp_snp_scored_and_filtered():
    f = hp_finder()
    reads = snp_reads(5) + [read(0, REF, [(OP_M, 20)], name="wt")]
    positions = list(range(20))
    indices = [0] * 20
    # haplotype predictions confidently vote T (index 4) at position 5
    h1, h2 = uniform_hp_predictions(positions, hot={5: (4, 96)})
    records = f.find_candidates(reads, positions, indices, h1, h2)
    cands = [c for r in records for c in r.candidates]
    assert len(cands) == 1
    c = cands[0]
    assert c.allele.alt == "T"
    assert c.alt_prob_h1 == pytest.approx(0.96)
    assert c.non_ref_prob == pytest.approx(0.99)  # 1 - P(ref 'C')
    assert c.genotype == 0  # HP finder does not assign genotype here


def test_hp_freq_gate_truncates_to_int():
    f = hp_finder()
    # support 2 of depth 52 -> alt_freq = int(3.84) = 3 < 4 -> gated out
    reads = snp_reads(2) + [read(0, REF, [(OP_M, 20)], name=f"wt{k}")
                            for k in range(50)]
    positions = list(range(20))
    h1, h2 = uniform_hp_predictions(positions, hot={5: (4, 96)})
    records = f.find_candidates(reads, positions, [0] * 20, h1, h2)
    assert [c for r in records for c in r.candidates] == []


def test_hp_freq_based_mode():
    f = hp_finder()
    reads = snp_reads(3) + [read(0, REF, [(OP_M, 20)], name="wt")]
    positions = list(range(20))
    h1, h2 = uniform_hp_predictions(positions)
    records = f.find_candidates(reads, positions, [0] * 20, h1, h2,
                                freq_based=True, freq=0.5)
    cands = [c for r in records for c in r.candidates]
    assert len(cands) == 1  # 3/4 = 0.75 >= 0.5
    records = hp_finder().find_candidates(reads, positions, [0] * 20, h1,
                                          h2, freq_based=True, freq=0.9)
    assert [c for r in records for c in r.candidates] == []


def test_hp_delete_scoring():
    f = hp_finder()
    # 3 reads with a 2bp deletion at ref positions 10-11, 2 wild-type
    dele = [read(0, REF[:10] + REF[12:], [(OP_M, 10), (OP_D, 2),
                                          (OP_M, 8)], name=f"d{k}")
            for k in range(3)]
    wt = [read(0, REF, [(OP_M, 20)], name=f"w{k}") for k in range(2)]
    positions = list(range(20))
    # deletion-ish predictions at positions 10 and 11 (vote '*' = index 0)
    h1, h2 = uniform_hp_predictions(positions, hot={10: (0, 96),
                                                    11: (0, 96)})
    records = f.find_candidates(dele + wt, positions, [0] * 20, h1, h2)
    dels = [c for r in records for c in r.candidates
            if c.allele.alt_type == DELETE_ALLELE]
    assert len(dels) == 1
    assert dels[0].allele.ref == REF[9:12] and dels[0].allele.alt == REF[9]
    assert dels[0].alt_prob_h1 > 0.8  # strong delete signal inside allele


def test_hp_insert_scoring():
    f = hp_finder()
    ins = [read(0, REF[:10] + "GG" + REF[10:], [(OP_M, 10), (OP_I, 2),
                                                (OP_M, 10)], name=f"i{k}")
           for k in range(3)]
    wt = [read(0, REF, [(OP_M, 20)], name=f"w{k}") for k in range(2)]
    # expanded coordinates: two insert slots after position 9
    positions = list(range(10)) + [9, 9] + list(range(10, 20))
    indices = [0] * 10 + [1, 2] + [0] * 10
    h1, h2 = [], []
    for p, i in zip(positions, indices):
        v = [1, 1, 1, 1, 1]
        if p == 9 and i > 0:
            v[get_index_from_base("G")] = 96  # inserted base is G
        h1.append(list(v))
        h2.append(list(v))
    records = f.find_candidates(ins + wt, positions, indices, h1, h2)
    inserts = [c for r in records for c in r.candidates
               if c.allele.alt_type == INSERT_ALLELE]
    assert len(inserts) == 1
    assert inserts[0].allele.alt == REF[9] + "GG"
    assert inserts[0].alt_prob_h1 > 0.8


def test_wrapper_end_to_end(tmp_path):
    from tests.util.synth import (plant_variants, random_genome,
                                  simulate_reads, write_dataset)
    genome = random_genome(4000, seed=11)
    variants = plant_variants(dict(genome), n_snp=3, n_ins=0, n_del=0,
                              seed=12)
    records = simulate_reads(genome, variants, coverage=30, seed=13,
                             error_rate=0.0)
    fasta, bam = write_dataset(str(tmp_path), genome, records)
    contig = genome[0][0]
    hom = [v for v in variants if v.genotype == (1, 1) and v.kind == "snp"]
    assert hom, "need at least one hom-alt SNP planted"
    pos0 = hom[0].pos  # 0-based
    region_start, region_end = max(0, pos0 - 50), pos0 + 50

    cf = CandidateFinderCPP(contig, region_start, region_end)
    positions = list(range(region_start, region_end))
    alt = hom[0].alt
    pair = "".join(sorted(alt + alt))  # e.g. 'TT'
    label = DECODED_BASE_LABELS.index(pair)
    predictions, labels = [], []
    for p in positions:
        vec = [0.0] * 28
        if p == pos0:
            vec[label] = 0.95
            labels.append(label)
        else:
            vec[0] = 0.99
            labels.append(0)
        predictions.append(vec)
    result = cf.find_candidates(bam, fasta, contig, region_start,
                                region_end, positions, predictions, labels,
                                False, 0.0)
    cands = [c for lst in result.values() for c in lst
             if c.pos_start == pos0 and c.allele.alt == alt]
    assert len(cands) == 1
    assert cands[0].genotype == 2  # hom-alt
