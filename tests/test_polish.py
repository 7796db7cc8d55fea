"""Polish workload tests: encoder semantics, chunking, stitch, and a full
train->polish e2e that must correct planted draft errors."""
import os

import numpy as np
import pytest

from pepper_tpu.io.bam_reader import BamReader
from pepper_tpu.io.fasta import FastaReader, write_fasta
from pepper_tpu.io.bam_writer import BamWriter
from pepper_tpu.io.sam import SamRecord, OP_M, OP_I, OP_D
from pepper_tpu.polish.datastore import PolishPredictionStore
from pepper_tpu.polish.stitch import perform_stitch, small_chunk_stitch
from pepper_tpu.polish.summary import (PolishSummary, chunk_images,
                                       get_feature_index)
from tests.test_region_encoder import mk_read
from tests.util.synth import plant_variants, random_genome, simulate_reads


def test_feature_index_layout():
    # reverse strand occupies 0-3, forward 4-7, gaps 8 (rev) / 9 (fwd)
    assert [get_feature_index(b, True) for b in "ACGT"] == [0, 1, 2, 3]
    assert [get_feature_index(b, False) for b in "ACGT"] == [4, 5, 6, 7]
    assert get_feature_index("*", True) == 8
    assert get_feature_index("*", False) == 9


def test_polish_summary_basic_pileup():
    ref = "ACGTACGTAC"
    s = PolishSummary(ref, "c1", 0, 9)
    reads = [mk_read(0, ref, [(OP_M, 10)], name=f"r{i}") for i in range(4)]
    reads += [mk_read(0, ref, [(OP_M, 10)], reverse=True, name="rv")]
    s.generate_summary(reads, 0, 9)
    assert len(s.image) == 10
    assert s.genomic_pos == [(i, 0) for i in range(10)]
    # position 0: ref A; 4 fwd + 1 rev; coverage 5
    row = s.image[0]
    assert row[4] == int(4 / 5 * 254)   # A fwd
    assert row[0] == int(1 / 5 * 254)   # A rev


def test_polish_summary_insert_columns():
    ref = "ACGTACGT"
    s = PolishSummary(ref, "c1", 0, 7)
    # 2 reads with 2-base insert after pos 3
    reads = [mk_read(0, "ACGTGGACGT", [(OP_M, 4), (OP_I, 2), (OP_M, 4)],
                     name=f"i{i}") for i in range(2)]
    reads += [mk_read(0, ref, [(OP_M, 8)], name="plain")]
    s.generate_summary(reads, 0, 7)
    # genomic_pos gains two insert slots after position 3
    assert (3, 1) in s.genomic_pos and (3, 2) in s.genomic_pos
    assert len(s.image) == 10
    i_row1 = s.image[s.genomic_pos.index((3, 1))]
    # 2 of 3 coverage support 'G' insert fwd -> col 6
    assert i_row1[6] == int(2 / 3 * 254)


def test_polish_summary_delete_and_train_labels():
    ref = "ACGTACGTAC"
    s = PolishSummary(ref, "c1", 0, 9)
    reads = [mk_read(0, "ACGTGTAC" if False else ref[:4] + ref[6:],
                     [(OP_M, 4), (OP_D, 2), (OP_M, 4)], name=f"d{i}")
             for i in range(3)]
    truth = mk_read(0, ref[:4] + ref[6:], [(OP_M, 4), (OP_D, 2), (OP_M, 4)],
                    mapq=60, name="truth")
    s.generate_train_summary(reads, 0, 9, truth)
    # deleted positions labeled 0 ('*'), others their base
    assert s.labels[4] == 0 and s.labels[5] == 0
    assert s.labels[0] == 1  # 'A'
    # gap columns populated at deleted positions (fwd gap col 9)
    assert s.image[4][9] > 0


def test_chunk_images_padding():
    ref = "A" * 30
    s = PolishSummary(ref, "c1", 0, 29)
    s.generate_summary([mk_read(0, ref, [(OP_M, 30)])], 0, 29)
    images, labels, positions, ids = chunk_images(s, chunk_size=20,
                                                  chunk_overlap=5)
    assert ids == [0, 1]
    assert len(images[0]) == 20 and len(images[1]) == 20
    assert positions[1][-5:] == [(-1, -1)] * 5  # padded tail


def test_stitch_overlap_buffer(tmp_path):
    path = str(tmp_path / "pred.hdf")
    with PolishPredictionStore(path, "w") as store:
        # chunk A [0,1000): bases at pos 0..9
        store.write_prediction("ctg", 0, 1000, 0, list(range(10)),
                               [0] * 10, [1] * 10)
        # chunk B [900,2000): _st>0 so pos <= 900+200 skipped
        store.write_prediction("ctg", 900, 2000, 0,
                               list(range(1050, 1160)), [0] * 110,
                               [2] * 110)
    first, last, seq = small_chunk_stitch(
        "ctg", [(path, "ctg-0-1000", 0, 1000),
                (path, "ctg-900-2000", 900, 2000)])
    assert first == 0
    # chunk B positions <= 1100 dropped
    assert seq == "A" * 10 + "C" * (1160 - 1101)


@pytest.fixture(scope="module")
def polish_dataset(tmp_path_factory):
    """Draft with planted errors; reads carry the TRUE sequence (expressed
    as hom-alt variants of the draft); truth BAM = truth-to-draft alignment."""
    tmp = str(tmp_path_factory.mktemp("polish"))
    genome = random_genome(20000, seed=71)          # the DRAFT
    corrections = plant_variants(dict(genome), 12, 5, 5, seed=72)
    corrections = [type(v)(v.contig, v.pos, v.ref, v.alt, (1, 1))
                   for v in corrections]
    reads = simulate_reads(genome, corrections, coverage=30, seed=73,
                           error_rate=0.02)
    draft_fa = os.path.join(tmp, "draft.fa")
    write_fasta(draft_fa, genome)
    bam_path = os.path.join(tmp, "reads.bam")
    refs = [(n, len(s)) for n, s in genome]
    with BamWriter(bam_path, refs) as bw:
        for rec in reads:
            bw.write(rec)
    # truth-to-draft BAM: one long perfect read per contig with the edits
    from tests.util.synth import simulate_reads_fast
    truth_reads = simulate_reads_fast(genome, corrections, coverage=1,
                                      read_length=len(genome[0][1]),
                                      error_rate=0.0, seed=1, mapq=60)
    truth_bam = os.path.join(tmp, "truth.bam")
    with BamWriter(truth_bam, refs) as bw:
        for rec in truth_reads:
            bw.write(rec)
    # the true genome sequence (apply corrections to draft)
    from tests.util.synth import _apply_haplotype
    true_seq, _ = _apply_haplotype(genome[0][1], corrections, 0)
    # truth context around each correction, in TRUTH coordinates
    draft_seq = genome[0][1]
    contexts = []
    shift = 0
    for v in corrections:
        tpos = v.pos + shift
        contexts.append(true_seq[max(0, tpos - 15):tpos + len(v.alt) + 15])
        shift += len(v.alt) - len(v.ref)
    return dict(tmp=tmp, draft=draft_fa, bam=bam_path, truth_bam=truth_bam,
                true_seq=true_seq, draft_seq=draft_seq,
                truth_contexts=contexts)


@pytest.mark.slow
def test_polish_end_to_end_corrects_draft(polish_dataset):
    """Train briefly on the synthetic data, then polish: the polished FASTA
    must be closer to the truth than the draft is."""
    from pepper_tpu.polish.make_images import generate_polish_images
    from pepper_tpu.polish.pipeline import polish
    from pepper_tpu.train.polish_train import train_polish
    tmp = polish_dataset["tmp"]
    train_dir = tmp + "/train_images/"
    generate_polish_images(polish_dataset["bam"], polish_dataset["draft"],
                           train_dir, threads=1, train_mode=True,
                           truth_bam=polish_dataset["truth_bam"],
                           realignment_flag=False)
    model = train_polish(train_dir, train_dir, tmp + "/models/",
                         batch_size=8, epoch_limit=3, lr=3e-4)
    out = polish(polish_dataset["bam"], polish_dataset["draft"], model,
                 tmp + "/out/", threads=1, realignment=False)
    with open(out) as fh:
        lines = fh.read().splitlines()
    polished = "".join(l for l in lines if not l.startswith(">"))
    true_seq = polish_dataset["true_seq"]
    assert len(polished) > 0.95 * len(true_seq)

    # overall identity: all truth 21-mers should be nearly all present
    k = 21
    truth_kmers = {true_seq[i:i + k] for i in range(len(true_seq) - k)}
    polished_kmers = {polished[i:i + k] for i in range(len(polished) - k)}
    identity = len(truth_kmers & polished_kmers) / len(truth_kmers)
    assert identity > 0.95, identity

    # each planted correction: its TRUTH context must appear in the
    # polished output (and, by construction, not in the draft)
    draft_seq = polish_dataset["draft_seq"]
    recovered = 0
    checked = 0
    for ctx in polish_dataset["truth_contexts"]:
        if ctx in draft_seq:
            continue  # context not discriminative, skip
        checked += 1
        if ctx in polished:
            recovered += 1
    assert checked >= 10
    assert recovered / checked >= 0.7, (recovered, checked)


def test_polish_streamed_multi_contig_matches_staged(tmp_path):
    """Contig-watermark stitch across multiple contigs: streamed FASTA ==
    staged FASTA, contigs in natural order, every contig present."""
    import jax

    from pepper_tpu.models.checkpoint import save_checkpoint
    from pepper_tpu.models.polish_model import init_polish_params
    from pepper_tpu.polish.pipeline import polish

    tmp = str(tmp_path)
    genome = random_genome(4000, seed=81, n_contigs=3)
    corrections = plant_variants(dict(genome), 6, 2, 2, seed=82)
    corrections = [type(v)(v.contig, v.pos, v.ref, v.alt, (1, 1))
                   for v in corrections]
    reads = simulate_reads(genome, corrections, coverage=25, seed=83,
                           error_rate=0.02)
    draft_fa = os.path.join(tmp, "draft.fa")
    write_fasta(draft_fa, genome)
    bam_path = os.path.join(tmp, "reads.bam")
    with BamWriter(bam_path, [(n, len(s)) for n, s in genome]) as bw:
        for rec in reads:
            bw.write(rec)
    model = tmp + "/model.npz"
    params = init_polish_params(jax.random.PRNGKey(6))
    save_checkpoint(model, jax.tree_util.tree_map(np.asarray, params), {})

    out_staged = polish(bam_path, draft_fa, model, tmp + "/staged/",
                        threads=2, streaming=False, realignment=False)
    out_streamed = polish(bam_path, draft_fa, model, tmp + "/streamed/",
                          threads=2, streaming=True, realignment=False)
    with open(out_staged) as fh:
        staged = fh.read()
    with open(out_streamed) as fh:
        streamed = fh.read()
    assert staged == streamed
    headers = [l for l in streamed.splitlines() if l.startswith(">")]
    assert headers == [">contig1", ">contig2", ">contig3"]


def test_stitch_v2_alignment_merge():
    from pepper_tpu.polish.stitch_v2 import alignment_stitch
    true = ("ACGGATTACAGGCTTACGGATCCAGATTACAGGCTTAACCGGTTACGATCGATCGGATC"
            "CTAGCTAGCATCGATCGATTTACGGCATCGATCA")
    # two chunks with a 20-base overlap, identical content in the overlap
    a = ("c1", 0, 60, true[:60])
    b = ("c1", 40, len(true), true[40:])
    contig, start, end, seq = alignment_stitch([a, b])
    assert seq == true
    # unalignable overlap -> joined with 10 Ns
    junk = ("c1", 40, 99, "TTTTTTTTTTTTTTTTTTTT")
    _, _, _, seq2 = alignment_stitch([a, junk])
    assert "N" * 10 in seq2
    # disjoint chunks -> plain concat
    c = ("c1", 80, 120, "GGGG")
    _, _, _, seq3 = alignment_stitch([a, ("c1", 70, 80, "AAAA")])
    assert seq3 == true[:60] + "AAAA"


def test_polish_streamed_matches_staged(polish_dataset):
    """The fused pileup->consensus stream (polish/streaming.py) produces a
    polished FASTA identical to the staged images->consensus pipeline, and
    its optional image artifact is a loadable stage-1 store."""
    import glob

    import jax

    from pepper_tpu.models.checkpoint import save_checkpoint
    from pepper_tpu.models.polish_model import init_polish_params
    from pepper_tpu.polish.datastore import PolishImageStore
    from pepper_tpu.polish.pipeline import polish

    tmp = polish_dataset["tmp"]
    model = tmp + "/stream_model.npz"
    params = init_polish_params(jax.random.PRNGKey(5))
    save_checkpoint(model, jax.tree_util.tree_map(np.asarray, params), {})

    out_staged = polish(polish_dataset["bam"], polish_dataset["draft"],
                        model, tmp + "/out_staged/", threads=2,
                        streaming=False)
    out_streamed = polish(polish_dataset["bam"], polish_dataset["draft"],
                          model, tmp + "/out_streamed/", threads=2,
                          streaming=True, keep_image_artifacts=True)
    with open(out_staged) as fh:
        staged = fh.read()
    with open(out_streamed) as fh:
        streamed = fh.read()
    assert staged == streamed
    assert len(staged) > 15000

    artifacts = glob.glob(tmp + "/out_streamed/images_*/*.hdf")
    assert artifacts, "keep_image_artifacts wrote no polish image HDF"
    with PolishImageStore(artifacts[0], "r") as store:
        names = store.summary_names()
        assert names
        s = store.read_summary(names[0])
        assert s["image"].shape[0] == 1000
