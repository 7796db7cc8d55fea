"""Fused native encoder vs Python RegionalSummary: bit-exact parity."""
import numpy as np
import pytest

from pepper_tpu.encode.region_encoder import RegionalSummary, TruthRecord
from pepper_tpu.io.bam_reader import BamReader
from pepper_tpu.io.fasta import FastaReader
from pepper_tpu.io.vcf import get_truth_records
from pepper_tpu.native import encoder
from tests.util.synth import (plant_variants, random_genome, simulate_reads,
                              write_dataset, write_truth_vcf)

pytestmark = pytest.mark.skipif(not encoder.available(),
                                reason="native build failed")

KW = dict(min_snp_baseq=1, min_indel_baseq=1, snp_freq_threshold=0.10,
          insert_freq_threshold=0.15, delete_freq_threshold=0.15,
          min_coverage_threshold=2, snp_candidate_freq_threshold=0.10,
          indel_candidate_freq_threshold=0.10,
          candidate_support_threshold=2, skip_indels=False)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("nenc"))
    genome = random_genome(30000, seed=51)
    variants = plant_variants(dict(genome), 10, 5, 5, seed=52)
    records = simulate_reads(genome, variants, coverage=30, seed=53,
                             error_rate=0.06)
    fasta, bam = write_dataset(tmp, genome, records)
    truth = write_truth_vcf(tmp + "/truth.vcf", genome, variants)
    return dict(fasta=fasta, bam=bam, truth=truth, variants=variants)


def run_both(data, region_start, region_end, train=False, max_reads=5000,
             skip_indels=False):
    kw = dict(KW)
    kw["skip_indels"] = skip_indels
    fetch_stop = region_end + 1 if train else region_end
    with BamReader(data["bam"]) as bam, FastaReader(data["fasta"]) as fa:
        ref_seq = fa.get_reference_sequence("contig1", region_start,
                                            region_end + 1)
        reads = bam.get_reads("contig1", region_start, fetch_stop,
                              False, 5, 1, backend="python")
        from pepper_tpu.pipelines.make_images import reservoir_downsample
        from pepper_tpu.options import AlignerOptions
        allowed = int(min(max_reads, 1.0 * len(reads)))
        if len(reads) > allowed:
            rng = np.random.RandomState(AlignerOptions.RANDOM_SEED)
            sample = []
            for i, read in enumerate(reads):
                if len(sample) < allowed:
                    sample.append(read)
                else:
                    j = rng.randint(0, i + 1)
                    if j < allowed:
                        sample[j] = read
            reads = sample
        rs = RegionalSummary("contig1", region_start, region_end, ref_seq)
        hap1, hap2 = [], []
        if train:
            h1, h2 = get_truth_records(data["truth"], "contig1",
                                       region_start, region_end)
            hap1 = [TruthRecord(*t) for t in h1]
            hap2 = [TruthRecord(*t) for t in h2]
            rs.generate_labels(hap1, hap2)
        py = rs.generate_summary(
            reads, candidate_region_start=region_start + 100,
            candidate_region_end=region_end - 100, train_mode=train, **kw)

        ref_id = bam._ref_ids["contig1"]
        chunks = bam._index.chunks_for(ref_id, region_start, fetch_stop)
        nat = encoder.encode_region_native(
            data["bam"], chunks, ref_id, "contig1", region_start, fetch_stop,
            region_start, region_end, ref_seq,
            include_supplementary=False, min_mapq=5,
            candidate_region_start=region_start + 100,
            candidate_region_end=region_end - 100, train_mode=train,
            hap1=hap1, hap2=hap2, max_reads=max_reads, **kw)
    return py, nat


def assert_equal(py, nat):
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert a.contig == b.contig
        assert a.position == b.position, (a.position, b.position)
        assert a.depth == b.depth
        assert a.candidates == b.candidates
        assert a.candidate_frequency == b.candidate_frequency
        assert a.base_label == b.base_label
        assert a.type_label == b.type_label
        # the native path emits int8 (numpy-astype wrap semantics — the
        # dtype every downstream consumer uses); the Python oracle stays
        # int32, so compare through the same wrap
        np.testing.assert_array_equal(
            np.asarray(a.image).astype(np.int8), b.image)
        assert np.asarray(b.image).dtype == np.int8


def test_inference_mode_parity(data):
    py, nat = run_both(data, 0, 29999)
    assert len(py) > 10
    assert_equal(py, nat)


def test_train_mode_parity(data):
    py, nat = run_both(data, 0, 29999, train=True)
    assert any(c.type_label > 0 for c in py)
    assert_equal(py, nat)


def test_downsampling_parity(data):
    # max_reads small enough to trigger the reservoir (numpy MT parity)
    py, nat = run_both(data, 0, 29999, max_reads=50)
    assert len(py) > 0
    assert_equal(py, nat)


def test_skip_indels_parity(data):
    py, nat = run_both(data, 5000, 25000, skip_indels=True)
    assert_equal(py, nat)
    assert all(c.candidates[0].startswith("1") for c in nat)


def test_hp_native_matches_python_oracle(data):
    """Native HP encoder vs the Python HP oracle: bit-exact."""
    from pepper_tpu.encode.region_encoder_hp import RegionalSummaryHP
    from pepper_tpu.options import ImageOptionsHP
    # regenerate reads WITH hp tags
    import tempfile
    tmp = tempfile.mkdtemp()
    genome = random_genome(20000, seed=61)
    variants = plant_variants(dict(genome), 8, 4, 4, seed=62)
    records = simulate_reads(genome, variants, coverage=30, seed=63,
                             error_rate=0.05, hp_tags=True)
    fasta, bam_path = write_dataset(tmp, genome, records)
    truth = write_truth_vcf(tmp + "/truth.vcf", genome, variants)
    kw = dict(KW)
    region_start, region_end = 0, 19999
    with BamReader(bam_path) as bam, FastaReader(fasta) as fa:
        ref_seq = fa.get_reference_sequence("contig1", region_start,
                                            region_end + 1)
        for train in (False, True):
            fetch_stop = region_end + 1 if train else region_end
            reads = bam.get_reads("contig1", region_start, fetch_stop,
                                  False, 5, 1, backend="python")
            rs = RegionalSummaryHP("contig1", region_start, region_end,
                                   ref_seq)
            hap1, hap2 = [], []
            if train:
                h1, h2 = get_truth_records(truth, "contig1", region_start,
                                           region_end)
                hap1 = [TruthRecord(*t) for t in h1]
                hap2 = [TruthRecord(*t) for t in h2]
                rs.generate_labels(hap1, hap2)
            py = rs.generate_summary(
                reads, candidate_region_start=region_start + 100,
                candidate_region_end=region_end - 100, train_mode=train, **kw)
            ref_id = bam._ref_ids["contig1"]
            chunks = bam._index.chunks_for(ref_id, region_start, fetch_stop)
            nat = encoder.encode_region_native(
                bam_path, chunks, ref_id, "contig1", region_start,
                fetch_stop, region_start, region_end, ref_seq,
                include_supplementary=False, min_mapq=5,
                candidate_region_start=region_start + 100,
                candidate_region_end=region_end - 100, train_mode=train,
                hap1=hap1, hap2=hap2, hp_mode=True,
                window_size=ImageOptionsHP.CANDIDATE_WINDOW_SIZE,
                feature_size=ImageOptionsHP.IMAGE_HEIGHT, **kw)
            assert len(py) > 5
            assert_equal(py, nat)


def test_stack_images_fast_path_matches_np_stack():
    """stack_images must be bit-equal to np.stack for contiguous native
    views, reordered views, and independently-allocated images."""
    import numpy as np
    from pepper_tpu.encode.region_encoder import CandidateImage
    from pepper_tpu.pipelines.datastore import stack_images

    def mk(img):
        return CandidateImage(contig="c", position=0, depth=1,
                              candidates=["A"], candidate_frequency=[1],
                              image=img, base_label=0, type_label=0)

    # .copy() so base owns its data (like the encoder's buffer); a reshape
    # view would chain .base to the flat arange and correctly fall back
    base = np.arange(7 * 4 * 5, dtype=np.int32).reshape(7, 4, 5).copy()
    views = [mk(base[i]) for i in range(1, 6)]      # consecutive rows
    assert np.array_equal(stack_images(views), base[1:6])
    assert stack_images(views).base is base          # zero-copy

    shuffled = [views[2], views[0], views[1]]        # non-consecutive
    assert np.array_equal(stack_images(shuffled),
                          np.stack([c.image for c in shuffled]))

    own = [mk(np.full((4, 5), i, np.int32)) for i in range(3)]
    assert np.array_equal(stack_images(own),
                          np.stack([c.image for c in own]))

    mixed = views[:2] + own[:1]                      # mixed bases
    assert np.array_equal(stack_images(mixed),
                          np.stack([c.image for c in mixed]))
