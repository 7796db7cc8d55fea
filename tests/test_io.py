"""Tests for the IO foundation: BGZF, FASTA+fai, BAM writer/reader + trimming."""
import gzip
import os
import struct

import pytest

from pepper_tpu.io.bgzf import BGZFReader, BGZFWriter, bgzip_file, iter_blocks
from pepper_tpu.io.fasta import FastaReader, write_fasta
from pepper_tpu.io.bam_writer import BamWriter
from pepper_tpu.io.bam_reader import BamReader
from pepper_tpu.io.sam import SamRecord, OP_M, OP_I, OP_D, OP_S, FLAG_REVERSE, FLAG_DUP
from tests.util.synth import random_genome, plant_variants, simulate_reads, write_dataset


def test_bgzf_roundtrip(tmp_path):
    path = str(tmp_path / "x.gz")
    payload = b"hello bgzf " * 100000  # spans multiple blocks
    with BGZFWriter(path) as w:
        w.write(payload)
    with BGZFReader(path) as r:
        assert r.read_all() == payload
    # BGZF is valid gzip: stdlib can read the concatenated members
    with gzip.open(path, "rb") as gz:
        assert gz.read() == payload


def test_bgzf_virtual_offsets(tmp_path):
    path = str(tmp_path / "x.gz")
    with BGZFWriter(path) as w:
        voffs = []
        for i in range(2000):
            voffs.append(w.virtual_offset)
            w.write(f"item{i:05d}\n".encode())
    r = BGZFReader(path)
    for i in (0, 1, 999, 1999):
        r.seek_virtual(voffs[i])
        assert r.read(10) == f"item{i:05d}\n".encode()


def test_bgzip_file(tmp_path):
    text = str(tmp_path / "a.txt")
    with open(text, "w") as fh:
        fh.write("line\n" * 1000)
    out = str(tmp_path / "a.txt.gz")
    bgzip_file(text, out)
    with gzip.open(out, "rt") as gz:
        assert gz.read() == "line\n" * 1000


def test_fasta_roundtrip(tmp_path):
    path = str(tmp_path / "ref.fa")
    genome = random_genome(1000, seed=3, n_contigs=2)
    write_fasta(path, genome)
    with FastaReader(path) as fr:
        assert fr.get_chromosome_names() == ["contig1", "contig2"]
        assert fr.get_chromosome_sequence_length("contig1") == 1000
        for name, seq in genome:
            assert fr.get_reference_sequence(name, 0, 1000) == seq
            assert fr.get_reference_sequence(name, 100, 250) == seq[100:250]
            # clipping
            assert fr.get_reference_sequence(name, 990, 2000) == seq[990:]


def _mini_bam(tmp_path, records, refs=(("contig1", 10000),)):
    path = str(tmp_path / "t.bam")
    with BamWriter(path, list(refs)) as bw:
        for rec in records:
            bw.write(rec)
    return path


def test_bam_roundtrip_and_region_query(tmp_path):
    genome = random_genome(20000, seed=5)
    variants = plant_variants(dict(genome), 5, 2, 2)
    records = simulate_reads(genome, variants, coverage=10, read_length=500)
    fasta, bam = write_dataset(str(tmp_path), genome, records)
    with BamReader(bam) as br:
        assert br.get_chromosome_sequence_names() == ["contig1"]
        # all reads overlap the whole contig
        reads = br.get_reads("contig1", 0, 20000)
        assert len(reads) == len(records)
        # region query matches brute force
        for start, stop in ((0, 1000), (5000, 6000), (19000, 20000), (9999, 10001)):
            got = {r.query_name for r in br.get_reads("contig1", start, stop)}
            expect = {r.query_name for r in records
                      if r.pos < stop and r.reference_end() > start}
            assert got == expect, (start, stop)


def test_read_trimming_semantics(tmp_path):
    # read spans [100, 120) with an insert at 110 and a delete at 105
    rec = SamRecord("r1", 0, 0, 100, 60,
                    cigar=[(OP_M, 5), (OP_D, 2), (OP_M, 5), (OP_I, 3), (OP_M, 8)],
                    seq="AAAAA" + "CCCCC" + "GGG" + "TTTTTTTT",
                    qual=[20] * 21)
    bam = _mini_bam(tmp_path, [rec])
    with BamReader(bam) as br:
        # untrimmed fetch
        (r,) = br.get_reads("contig1", 0, 1000)
        assert r.pos == 100 and r.pos_end == 120
        assert r.sequence == rec.seq
        assert r.cigar_tuples == rec.cigar
        assert r.bad_indices == [len(rec.seq) + 1]

        # trim to [103, 111]: stop is INCLUSIVE in trimming (bam_handler.cpp:205)
        (r,) = br.get_reads("contig1", 103, 111)
        # kept: M bases at 103,104 -> "AA", D(2) at 105-106, M at 107..111 -> CCCCC,
        # insert anchored at ref_pos 112 > stop -> dropped
        assert r.pos == 103
        assert r.sequence == "AA" + "CCCCC"
        assert r.cigar_tuples == [(OP_M, 2), (OP_D, 2), (OP_M, 5)]
        assert r.pos_end == 103 + 2 + 2 + 5

        # trim to [103, 112]: insert at current_read_pos=112 <= stop -> kept
        (r,) = br.get_reads("contig1", 103, 112)
        assert r.sequence == "AA" + "CCCCC" + "GGG" + "T"
        assert r.cigar_tuples == [(OP_M, 2), (OP_D, 2), (OP_M, 5), (OP_I, 3), (OP_M, 1)]


def test_read_filters(tmp_path):
    base = dict(ref_id=0, pos=100, cigar=[(OP_M, 10)], seq="A" * 10, qual=[20] * 10)
    records = [
        SamRecord("ok", 0, mapq=60, **base),
        SamRecord("dup", FLAG_DUP, mapq=60, **base),
        SamRecord("lowmapq", 0, mapq=3, **base),
        SamRecord("supp", 2048, mapq=60, **base),
    ]
    records.sort(key=lambda r: (r.ref_id, r.pos))
    bam = _mini_bam(tmp_path, records)
    with BamReader(bam) as br:
        names = {r.query_name for r in br.get_reads("contig1", 0, 1000, min_mapq=5)}
        assert names == {"ok"}
        names = {r.query_name for r in br.get_reads("contig1", 0, 1000,
                                                    include_supplementary=True, min_mapq=5)}
        assert names == {"ok", "supp"}


def test_bad_indices_and_hp(tmp_path):
    rec = SamRecord("r1", 0, 0, 100, 60, cigar=[(OP_M, 6)], seq="ACGNTA",
                    qual=[20, 20, 1, 20, 20, 20], tags=[("HP", "i", 2)])
    bam = _mini_bam(tmp_path, [rec])
    with BamReader(bam) as br:
        (r,) = br.get_reads("contig1", 0, 1000, min_baseq=5)
        # index 2 low qual, index 3 is N, sentinel len+1
        assert r.bad_indices == [2, 3, 7]
        assert r.hp_tag == 2


def test_cram_input_rejected_with_clear_error(tmp_path):
    """CRAM is out of scope for the from-spec reader (the reference opens
    it via htslib auto-detection, bam_handler.cpp:7): opening one must
    fail with an actionable message, not a BGZF parse error."""
    import pytest
    from pepper_tpu.io.bam_reader import BamReader
    cram = str(tmp_path / "reads.cram")
    with open(cram, "wb") as fh:
        fh.write(b"CRAM\x03\x00" + b"\x00" * 64)
    with pytest.raises(ValueError, match="CRAM.*samtools view"):
        BamReader(cram)

    from pepper_tpu.options import PipelineConfig
    from pepper_tpu.pipelines.call_variant import validate_inputs
    with pytest.raises(ValueError, match="CRAM"):
        validate_inputs(PipelineConfig(
            bam=cram, fasta="x.fa", sub_command="call_variant"))
