"""Differential tests against the ACTUAL reference model classes.

Unlike test_models.py's hand-built twins (which could encode the same
misreading twice), these import the reference's own torch modules from the
read-only mount and assert forward/checkpoint parity directly:

  pepper_variant/modules/python/models/simple_model.py          (live)
  pepper_variant/modules/python/models/simple_model_transformers.py
  pepper/modules/python/models/simple_model.py                  (live)
  pepper/modules/python/models/Seq2Seq_atn.py                   (legacy)

Skipped when the reference mount is absent.
"""
import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pepper_tpu.models.checkpoint import (from_torch_state_dict,
                                          load_torch_checkpoint)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount not available")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch.manual_seed(7)


def test_reference_variant_transducer_forward_parity():
    from pepper_variant.modules.python.models.simple_model import \
        TransducerGRU
    from pepper_tpu.models.variant_model import variant_forward

    m = TransducerGRU(image_features=26, gru_layers=1, hidden_size=256,
                      num_classes=28, num_classes_type=3).eval()
    x = torch.randn(4, 33, 26)
    with torch.no_grad():
        want_probs = m(x)                       # inference: softmax
        want_logits = m(x, train_mode=True)     # train: raw type logits
    params = from_torch_state_dict(m.state_dict())
    got_probs = variant_forward(params, jnp.asarray(x.numpy()))
    got_logits = variant_forward(params, jnp.asarray(x.numpy()),
                                 train_mode=True)
    np.testing.assert_allclose(np.asarray(got_probs), want_probs.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               atol=2e-4)


def test_reference_variant_checkpoint_roundtrip(tmp_path):
    """A checkpoint saved exactly as the reference saves it
    (ModelHander.save_model's dict layout) imports losslessly."""
    from pepper_variant.modules.python.models.simple_model import \
        TransducerGRU
    from pepper_tpu.models.variant_model import variant_forward

    m = TransducerGRU(image_features=26, gru_layers=1, hidden_size=256,
                      num_classes=28, num_classes_type=3).eval()
    path = str(tmp_path / "pepper_ref.pkl")
    torch.save({"model_state_dict": m.state_dict(),
                "model_optimizer": {},  # optimizer payload ignored on import
                "hidden_size": 256, "gru_layers": 1, "epochs": 3}, path)
    params, meta = load_torch_checkpoint(path)
    assert meta["hidden_size"] == 256 and meta["epochs"] == 3
    x = torch.randn(2, 33, 26)
    with torch.no_grad():
        want = m(x)
    got = variant_forward(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_reference_variant_transformer_forward_parity():
    from pepper_variant.modules.python.models.simple_model_transformers \
        import TransducerGRU as TransformerModel
    from pepper_tpu.models.variant_transformer import transformer_forward

    m = TransformerModel(image_features=26, gru_layers=1, hidden_size=256,
                         num_classes=3, num_classes_type=3).eval()
    x = torch.randn(3, 33, 26)
    with torch.no_grad():
        want = m(x, None, None)                       # hidden/cell unused
        want_train = m(x, None, None, train_mode=True)  # log-softmax
    params = from_torch_state_dict(m.state_dict())
    got = transformer_forward(params, jnp.asarray(x.numpy()))
    got_train = transformer_forward(params, jnp.asarray(x.numpy()),
                                    train_mode=True)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_train), want_train.numpy(),
                               atol=3e-4)


def test_reference_polish_transducer_forward_and_hidden_carry():
    from pepper.modules.python.models.simple_model import \
        TransducerGRU as PolishModel
    from pepper_tpu.models.polish_model import init_hidden, polish_forward

    m = PolishModel(image_channels=1, image_features=10, gru_layers=1,
                    hidden_size=128, num_classes=5).eval()
    params = from_torch_state_dict(m.state_dict())
    B, T = 2, 100
    x1, x2 = torch.randn(B, T, 10), torch.randn(B, T, 10)
    h0 = m.init_hidden(B, num_layers=1)           # [B, 2, H], all zeros
    with torch.no_grad():
        w1, h1 = m(x1, h0)
        w2, h2 = m(x2, h1)                        # window carry
    g1, gh1 = polish_forward(params, jnp.asarray(x1.numpy()), init_hidden(B))
    g2, gh2 = polish_forward(params, jnp.asarray(x2.numpy()), gh1)
    np.testing.assert_allclose(np.asarray(g1), w1.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), w2.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh2), h2.numpy(), atol=1e-4)


def test_reference_seq2seq_encoder_decoder_parity():
    from pepper.modules.python.models.Seq2Seq_atn import (AttnDecoderRNN,
                                                          EncoderCRNN)
    from pepper_tpu.models.polish_seq2seq import (decoder_forward,
                                                  encoder_forward)

    H, L, C, T = 16, 2, 5, 12
    enc = EncoderCRNN(image_channels=1, gru_layers=L, hidden_size=H).eval()
    dec = AttnDecoderRNN(hidden_size=H, gru_layers=L, num_classes=C,
                         max_length=T, seq_len=T).eval()
    x = torch.randn(3, 1, T, 20)
    h0 = torch.randn(3, 2 * L, H)
    with torch.no_grad():
        want_ctx, want_h = enc(x, h0)
    enc_params = from_torch_state_dict(enc.state_dict())
    got_ctx, got_h = encoder_forward(enc_params, jnp.asarray(x.numpy()),
                                     jnp.asarray(h0.numpy()), gru_layers=L)
    np.testing.assert_allclose(np.asarray(got_ctx), want_ctx.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_h), want_h.numpy(), atol=2e-5)

    onehot = torch.zeros(3, T)
    onehot[:, 4] = 1.0
    dh0 = torch.randn(3, 2 * L, H)
    with torch.no_grad():
        want_logits, want_dh, want_attn = dec(onehot, want_ctx, dh0)
    dec_params = from_torch_state_dict(dec.state_dict())
    got_logits, got_dh, got_attn = decoder_forward(
        dec_params, jnp.asarray(onehot.numpy()), got_ctx,
        jnp.asarray(dh0.numpy()), gru_layers=L)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dh), want_dh.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_attn), want_attn.numpy(),
                               atol=2e-5)


def test_reference_reverse_onehot_parity():
    from pepper.modules.python.models.Seq2Seq_atn import \
        reverse_onehot as ref_reverse
    from pepper_tpu.models.polish_seq2seq import reverse_onehot

    v = torch.tensor([[0.0, 1.0, 0.0], [2.0, 0.0, 0.0]])
    want = ref_reverse(v)
    got = reverse_onehot(jnp.asarray(v.numpy()))
    np.testing.assert_array_equal(np.asarray(got), want.numpy())


def _install_build_stub():
    """Inject a 'pepper_variant.build' stub so the reference's pure-Python
    CandidateFinder imports without its compiled pybind11 module. The stub
    maps FASTA_handler onto our own FastaReader and makes
    CandidateImagePrediction a plain attribute record."""
    import types

    from pepper_tpu.io.fasta import FastaReader

    class CandidateImagePrediction:
        def __init__(self, contig, position, depth, candidates,
                     candidate_frequency, prediction_base, prediction_type):
            self.contig = contig
            self.position = position
            self.depth = depth
            self.candidates = candidates
            self.candidate_frequency = candidate_frequency
            self.prediction_base = prediction_base
            self.prediction_type = prediction_type

    class FASTA_handler:
        def __init__(self, path):
            self._fa = FastaReader(path)

        def get_reference_sequence(self, contig, start, stop):
            return self._fa.get_reference_sequence(contig, start, stop)

    pv = types.SimpleNamespace(CandidateImagePrediction=CandidateImagePrediction,
                               FASTA_handler=FASTA_handler)
    mod = types.ModuleType("pepper_variant.build")
    mod.PEPPER_VARIANT = pv
    sys.modules["pepper_variant.build"] = mod


def _install_h5py_shim(ref_cf):
    """The reference's string parsing assumes h5py 2.x semantics (vlen str
    datasets read back as `str`; fixed-length S stays bytes). Modern h5py
    returns bytes for both, which would silently drop every candidate.
    Shim the module's h5py to its own era's behavior — logic untouched."""
    import types as _types

    import h5py as real_h5py

    def _decode(v):
        if isinstance(v, bytes):
            return v.decode()
        if isinstance(v, np.ndarray) and v.dtype == object:
            return np.array([_decode(x) for x in v.ravel()],
                            dtype=object).reshape(v.shape)
        return v

    class _DsetShim:
        def __init__(self, d):
            self._d = d

        def __getitem__(self, k):
            v = self._d[k]
            return _decode(v) if self._d.dtype == object else v

    class _GroupShim:
        def __init__(self, g):
            self._g = g

        def keys(self):
            return self._g.keys()

        def __getitem__(self, k):
            item = self._g[k]
            return (_DsetShim(item) if isinstance(item, real_h5py.Dataset)
                    else _GroupShim(item))

    class _FileShim(_GroupShim):
        def __init__(self, path, mode):
            super().__init__(real_h5py.File(path, mode))

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            self._g.close()

    ref_cf.h5py = _types.SimpleNamespace(File=_FileShim)


def test_reference_repeat_annotation_parity():
    _install_build_stub()
    from pepper_variant.modules.python.CandidateFinder import \
        repeat_annotation as ref_repeat
    from pepper_tpu.pipelines.find_candidates import repeat_annotation

    rng = np.random.default_rng(5)
    for trial in range(40):
        n = int(rng.integers(1, 30))
        seq = "".join(rng.choice(list("ACGT"), n))
        for k in (1, 2, 3):
            assert repeat_annotation(seq, k) == ref_repeat(seq, k), (seq, k)
    # homopolymer-heavy strings exercise the k=1 fast path
    for seq in ("AAAAA", "AAACCCCCGT", "T", "AGGGGGGGGGGA", "ACACACAC"):
        assert repeat_annotation(seq, 1) == ref_repeat(seq, 1)


def test_reference_check_alleles_parity():
    _install_build_stub()
    from pepper_variant.modules.python.CandidateFinder import check_alleles
    from pepper_tpu.pipelines.find_candidates import _valid_allele

    for allele in ("A", "ACGT", "AXGT", "", "N", "ACGTN", "acgt", "*"):
        # the reference upper()s first; our candidate strings are already
        # upper-case on the live path, so compare on that domain
        assert _valid_allele(allele.upper()) == check_alleles(allele), allele


def test_reference_small_chunk_stitch_differential(tmp_path):
    """THE stage-3 parity test: the reference's own small_chunk_stitch
    (CandidateFinder.py:356-531, compiled module stubbed) and ours produce
    identical (margin, deepvariant) candidate lists from the same
    prediction HDF5 + FASTA."""
    import types

    _install_build_stub()
    import pepper_variant.modules.python.CandidateFinder as ref_cf
    from pepper_variant.modules.python.CandidateFinder import \
        small_chunk_stitch as ref_stitch
    from pepper_tpu.pipelines.find_candidates import collect_candidate_lists

    _install_h5py_shim(ref_cf)
    from pepper_tpu.pipelines.datastore import PredictionStore
    from pepper_tpu.options import PipelineConfig
    from pepper_tpu.presets import set_parameters
    from tests.util.synth import random_genome, write_fasta

    rng = np.random.default_rng(11)
    # genome with planted homopolymer runs so candidate_in_repeat fires
    seq = list(random_genome(4000, seed=12)[0][1])
    for start in range(200, 3800, 400):
        seq[start:start + 6] = "A" * 6
    genome = [("chr1", "".join(seq))]
    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, genome)

    # synthetic predictions: mixed SNP/INS/DEL candidates, some invalid
    # alleles, probabilities spanning the p-value gates
    n = 400
    positions = np.sort(rng.choice(np.arange(20, 3980), n, replace=False))
    contigs, cand_lists, freqs, preds, depths = [], [], [], [], []
    alleles = ["1A", "1C", "1G", "1T", "2AT", "2ACG", "3AA", "3ACT",
               "1N", "2AN"]
    for i in range(n):
        contigs.append("chr1")
        cand_lists.append([str(rng.choice(alleles))])
        depths.append(int(rng.integers(5, 60)))
        freqs.append([int(rng.integers(1, depths[-1] + 1))])
        p = rng.random(3) ** 2
        preds.append(p / p.sum())
    pred_file = str(tmp_path / "preds.hdf")
    with PredictionStore(pred_file, "w") as store:
        store.write_prediction(0, contigs[:200], positions[:200],
                               depths[:200], cand_lists[:200], freqs[:200],
                               np.asarray(preds[:200], np.float64))
        store.write_prediction(1, contigs[200:], positions[200:],
                               depths[200:], cand_lists[200:], freqs[200:],
                               np.asarray(preds[200:], np.float64))

    config = set_parameters(PipelineConfig(
        fasta=fasta, sub_command="call_variant", ont_r9_guppy5_sup=True,
        threads=1))
    pairs = [(pred_file, "batch_0"), (pred_file, "batch_1")]
    ours_margin, ours_dv = collect_candidate_lists(config, pairs)

    options = types.SimpleNamespace(
        fasta=fasta, snp_p_value=config.snp_p_value,
        insert_p_value=config.insert_p_value,
        delete_p_value=config.delete_p_value,
        snp_p_value_in_lc=config.snp_p_value_in_lc,
        insert_p_value_in_lc=config.insert_p_value_in_lc,
        delete_p_value_in_lc=config.delete_p_value_in_lc,
        report_snp_above_freq=config.report_snp_above_freq,
        report_indel_above_freq=config.report_indel_above_freq)
    ref_margin, ref_dv = ref_stitch(options, pairs)

    assert len(ours_margin) == len(ref_margin) > 10
    assert len(ours_dv) == len(ref_dv) > 50

    def norm(t):
        return (str(t[0]), int(t[1]), int(t[2]), str(t[3]),
                [str(a) for a in t[4]], [int(g) for g in t[5]], int(t[6]),
                [int(s) for s in t[7]], round(float(t[8]), 9),
                [round(float(x), 9) for x in t[9]]) + tuple(
                    [[round(float(x), 9) for x in t[10]], bool(t[11])]
                    if len(t) > 10 else [])

    for a, b in zip(ours_margin, ref_margin):
        assert norm(a) == norm(b), (a, b)
    for a, b in zip(ours_dv, ref_dv):
        assert norm(a) == norm(b), (a, b)


def test_reference_polish_stitch_differential(tmp_path, monkeypatch):
    """The reference's own Stitch.small_chunk_stitch (Stitch.py:36-94) and
    ours produce the identical (first_pos, last_pos, sequence) from the
    same prediction HDF5 — overlap-buffer skip, (pos,index) de-dup,
    label decode included."""
    from pepper.modules.python import Stitch as ref_stitch_mod
    from pepper_tpu.polish.datastore import PolishPredictionStore
    from pepper_tpu.polish.stitch import small_chunk_stitch as our_stitch

    # the reference uses the long-removed np.int alias; restore it for the
    # duration of the test (their runtime pinned an older numpy)
    monkeypatch.setattr(np, "int", int, raising=False)

    rng = np.random.default_rng(21)
    path = str(tmp_path / "preds.hdf")
    chunks = [(0, 1000), (900, 1900), (1800, 2800)]
    with PolishPredictionStore(path, "w") as store:
        for ci, (st, en) in enumerate(chunks):
            positions = np.arange(st, en, dtype=np.int64)
            indices = np.zeros(len(positions), dtype=np.int64)
            # sprinkle insert rows and invalid (-1) rows like real output
            ins = rng.choice(len(positions), 30, replace=False)
            indices[ins[:15]] = 1
            indices[ins[15:]] = -1
            bases = rng.integers(0, 5, len(positions)).astype(np.int64)
            store.write_prediction("ctg", st, en, 0, positions, indices,
                                   bases)

    our_keys = [(path, f"ctg-{st}-{en}", st, en) for st, en in chunks]
    ref_keys = [(path, "ctg", st, en) for st, en in chunks]
    ours = our_stitch("ctg", our_keys)
    want = ref_stitch_mod.small_chunk_stitch("ctg", ref_keys)
    assert (int(ours[0]), int(ours[1])) == (int(want[0]), int(want[1]))
    assert ours[2] == want[2]
    assert len(ours[2]) > 1500


@pytest.mark.slow
def test_reference_composed_image_to_vcf_differential(tmp_path):
    """THE composed acceptance differential: the reference's OWN torch
    TransducerGRU forward + the reference's OWN small_chunk_stitch run over
    the SAME image HDF5 our pipeline consumes; the resulting candidate
    lists go through the shared aggregation + VCF assembly and must yield
    record-identical VCFs to our full stage-2->3->VCF pipeline. Catches
    day-one divergence anywhere between image and final record with
    reference code as the oracle (VcfWriter.py:48-218 contract)."""
    import types

    _install_build_stub()
    import pepper_variant.modules.python.CandidateFinder as ref_cf
    _install_h5py_shim(ref_cf)
    from pepper_variant.modules.python.CandidateFinder import \
        small_chunk_stitch as ref_stitch
    from pepper_variant.modules.python.models.simple_model import \
        TransducerGRU

    from pepper_tpu.io.fasta import FastaReader
    from pepper_tpu.io.vcf import VCFWriteEngine, read_vcf
    from pepper_tpu.options import PipelineConfig
    from pepper_tpu.pipelines.datastore import PredictionStore
    from pepper_tpu.pipelines.find_candidates import (aggregate_candidates,
                                                      process_candidates)
    from pepper_tpu.pipelines.make_images import generate_images
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.runtime.inference import load_all_summaries, run_inference
    from tests.util.synth import (plant_variants, random_genome,
                                  simulate_reads, write_dataset)

    tmp = str(tmp_path)
    genome = random_genome(40000, seed=71)
    variants = plant_variants(dict(genome), 15, 4, 4, seed=72)
    records = simulate_reads(genome, variants, coverage=30, seed=73)
    fasta, bam = write_dataset(tmp, genome, records)

    config = set_parameters(PipelineConfig(
        bam=bam, fasta=fasta, output_dir=tmp + "/",
        sub_command="call_variant", ont_r9_guppy5_sup=True, threads=1,
        region_size=10000,
        image_output_directory=tmp + "/images/"))
    generate_images(config)

    # the SAME weights on both sides: a reference-format checkpoint,
    # imported by our loader and loaded natively by torch
    m = TransducerGRU(image_features=26, gru_layers=1, hidden_size=256,
                      num_classes=28, num_classes_type=3).eval()
    ckpt = tmp + "/ref_model.pkl"
    torch.save({"model_state_dict": m.state_dict(), "model_optimizer": {},
                "hidden_size": 256, "gru_layers": 1, "epochs": 1}, ckpt)
    config.model_path = ckpt

    # ---- ours: staged stage 2 + stage 3 + VCF write ----
    pred_dir = tmp + "/preds/"
    run_inference(config, config.image_output_directory, pred_dir)
    ours_paths = process_candidates(config, pred_dir, tmp + "/out_ours/")

    # ---- composed reference: torch forward -> prediction store ->
    # reference small_chunk_stitch -> shared aggregation + VCF write ----
    data = load_all_summaries(config.image_output_directory)
    with torch.no_grad():
        probs = m(torch.from_numpy(
            data["images"].astype(np.float32))).numpy()
    ref_pred = tmp + "/ref_preds.hdf"
    freqs = [[int(np.atleast_1d(f)[0])] for f in data["candidate_frequency"]]
    with PredictionStore(ref_pred, "w") as store:
        store.write_prediction(0, data["contigs"], data["positions"],
                               data["depths"], data["candidates"], freqs,
                               probs.astype(np.float64))
    options = types.SimpleNamespace(
        fasta=fasta, snp_p_value=config.snp_p_value,
        insert_p_value=config.insert_p_value,
        delete_p_value=config.delete_p_value,
        snp_p_value_in_lc=config.snp_p_value_in_lc,
        insert_p_value_in_lc=config.insert_p_value_in_lc,
        delete_p_value_in_lc=config.delete_p_value_in_lc,
        report_snp_above_freq=config.report_snp_above_freq,
        report_indel_above_freq=config.report_indel_above_freq)
    ref_margin, ref_dv = ref_stitch(options, [(ref_pred, "batch_0")])
    assert len(ref_dv) > 20, "composed path found no candidates"
    _contigs, _margin, dv_candidates = aggregate_candidates(ref_margin,
                                                            ref_dv)
    with FastaReader(fasta) as fa:
        fasta_contigs = [(n, fa.get_chromosome_sequence_length(n))
                         for n in fa.get_chromosome_names()]
    out_ref = tmp + "/out_ref/"
    os.makedirs(out_ref)
    writer = VCFWriteEngine(fasta_contigs, config.sample_name, out_ref)
    writer.write_vcf_records(dv_candidates, config)
    writer.close()
    ref_paths = writer.paths

    # ---- record-level comparison (QUAL tolerant to f32-vs-f32 forward
    # noise between torch and XLA; everything else exact) ----
    assert set(ours_paths) == set(ref_paths)
    compared = 0
    for key in ours_paths:
        ours = read_vcf(ours_paths[key])
        ref = read_vcf(ref_paths[key])
        assert len(ours) == len(ref), key
        for a, b in zip(ours, ref):
            assert (a.contig, a.pos, a.ref, tuple(a.alts)) == \
                (b.contig, b.pos, b.ref, tuple(b.alts)), (key, a, b)
            assert a.genotype() == b.genotype(), (key, a, b)
            assert abs(float(a.qual) - float(b.qual)) <= 0.05, (key, a, b)
            compared += 1
    assert compared > 20


@pytest.mark.slow
def test_reference_composed_polish_image_to_fasta_differential(tmp_path,
                                                               monkeypatch):
    """THE composed polish acceptance differential: the reference's OWN
    torch TransducerGRU + the reference's OWN window/vote predict loop
    (models/predict.py:47-97) + the reference's OWN Stitch run over the
    SAME polish image HDF5 our pipeline consumes, with the same weights —
    and must produce the identical polished sequence to our
    consensus+stitch. Catches divergence anywhere between pileup image
    and final FASTA with reference code as the oracle."""
    import types

    # the reference dataloader imports torchvision but never uses the
    # transform at runtime; stub it (not installed in this image)
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.Compose = lambda x: None
    tr.ToTensor = lambda: None
    tv.transforms = tr
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", tr)
    monkeypatch.setattr(np, "int", int, raising=False)  # removed alias

    from pepper.modules.python import Stitch as ref_stitch_mod
    from pepper.modules.python.models import predict as ref_predict_mod
    from pepper.modules.python.models.simple_model import \
        TransducerGRU as RefPolishModel

    from pepper_tpu.models.checkpoint import save_checkpoint
    from pepper_tpu.polish.consensus import call_consensus
    from pepper_tpu.polish.datastore import PolishPredictionStore
    from pepper_tpu.polish.make_images import generate_polish_images
    from pepper_tpu.polish.stitch import perform_stitch
    from tests.util.synth import (plant_variants, random_genome,
                                  simulate_reads, write_dataset)

    tmp = str(tmp_path)
    genome = random_genome(20000, seed=81)          # the DRAFT
    edits = plant_variants(dict(genome), 10, 4, 4, seed=82)
    edits = [type(v)(v.contig, v.pos, v.ref, v.alt, (1, 1)) for v in edits]
    records = simulate_reads(genome, edits, coverage=30, error_rate=0.05,
                             seed=83)
    fasta, bam = write_dataset(tmp, genome, records)

    img_dir = tmp + "/images"
    generate_polish_images(bam, fasta, img_dir, threads=1)

    # same weights on both sides
    m = RefPolishModel(image_channels=1, image_features=10, gru_layers=1,
                       hidden_size=128, num_classes=5).eval()
    ref_ckpt = tmp + "/ref_polish.pkl"
    torch.save({"model_state_dict": m.state_dict(), "model_optimizer": {},
                "hidden_size": 128, "gru_layers": 1, "epochs": 1}, ref_ckpt)
    our_ckpt = tmp + "/polish.npz"
    save_checkpoint(our_ckpt, from_torch_state_dict(m.state_dict()), {})

    # ---- ours: jitted consensus scan + numpy stitch -> FASTA ----
    pred_dir = tmp + "/preds"
    call_consensus(img_dir, our_ckpt, pred_dir)
    out_fa = perform_stitch(pred_dir, tmp + "/ours", threads=1)
    with open(out_fa) as fh:
        lines = fh.read().splitlines()
    assert lines[0] == ">contig1"
    ours_seq = lines[1]

    # ---- composed reference: their predict loop writing through a shim
    # into our store schema, then their small_chunk_stitch ----
    ref_pred = tmp + "/ref_preds.hdf"

    class _ShimStore:
        def __init__(self, filename, mode="w"):
            self._store = PolishPredictionStore(filename, mode)

        def write_prediction(self, contig, contig_start, contig_end,
                             chunk_id, position, index, predicted_bases):
            contig = contig.decode() if isinstance(contig, bytes) \
                else str(contig)
            self._store.write_prediction(
                contig, int(contig_start), int(contig_end), int(chunk_id),
                np.asarray(position), np.asarray(index),
                np.asarray(predicted_bases))

    monkeypatch.setattr(ref_predict_mod, "DataStore", _ShimStore)
    ref_predict_mod.predict(img_dir, ref_pred, ref_ckpt, 64, 0, False)

    with PolishPredictionStore(ref_pred, "r") as store:
        assert store.contigs() == ["contig1"]
        ref_keys = [(ref_pred, "contig1", st, en)
                    for _k, st, en in store.chunk_keys("contig1")]
    ref_keys.sort(key=lambda e: (e[2], e[3]))
    first, last, ref_seq = ref_stitch_mod.small_chunk_stitch(
        "contig1", ref_keys)

    assert ours_seq == ref_seq
    # untrained weights map many positions to the gap label, so the
    # polished sequence is shorter than the draft — but far from empty
    assert len(ours_seq) > 5000


@pytest.mark.slow
def test_reference_composed_hp_image_to_vcf_differential(tmp_path,
                                                         monkeypatch):
    """The composed acceptance differential for PEPPER-HP: the reference's
    OWN torch TransducerGRU at image_features=48 (the reference's HP
    configuration, predict_distributed_cpu.py:162-165) + the reference's
    OWN small_chunk_stitch run over the SAME 48-feature dual-haplotype
    image HDF5 our HP pipeline consumes, and must yield record-identical
    VCFs to our stage-2->3->VCF pipeline.

    Reference quirk: TransducerGRU sizes linear_1 from the GLOBAL
    ImageSizeOptions.CANDIDATE_WINDOW_SIZE (33, simple_model.py:35) even
    though HP windows are ImageSizeOptionsHP.CANDIDATE_WINDOW_SIZE+1 = 21
    wide (Options.py:22, AlignmentSummarizerHP.py:155) — an HP-compatible
    torch model only exists with that constant patched to the HP width,
    which is what we do here (our own model sizes itself from the data)."""
    import types

    _install_build_stub()
    import pepper_variant.modules.python.CandidateFinder as ref_cf
    _install_h5py_shim(ref_cf)
    import pepper_variant.modules.python.models.simple_model as ref_sm
    from pepper_variant.modules.python.CandidateFinder import \
        small_chunk_stitch as ref_stitch
    monkeypatch.setattr(ref_sm.ImageSizeOptions, "CANDIDATE_WINDOW_SIZE", 20)
    TransducerGRU = ref_sm.TransducerGRU

    from pepper_tpu.io.fasta import FastaReader
    from pepper_tpu.io.vcf import VCFWriteEngine, read_vcf
    from pepper_tpu.options import ImageOptionsHP, PipelineConfig
    from pepper_tpu.pipelines.datastore import PredictionStore
    from pepper_tpu.pipelines.find_candidates import (aggregate_candidates,
                                                      process_candidates)
    from pepper_tpu.pipelines.make_images import generate_images
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.runtime.inference import load_all_summaries, run_inference
    from tests.util.synth import (plant_variants, random_genome,
                                  simulate_reads, write_dataset)

    tmp = str(tmp_path)
    genome = random_genome(30000, seed=91)
    variants = plant_variants(dict(genome), 12, 3, 3, seed=92)
    records = simulate_reads(genome, variants, coverage=30, seed=93,
                             hp_tags=True)
    fasta, bam = write_dataset(tmp, genome, records)

    config = set_parameters(PipelineConfig(
        bam=bam, fasta=fasta, output_dir=tmp + "/",
        sub_command="call_variant", ont_r9_guppy5_sup=True, threads=1,
        region_size=10000, use_hp_info=True,
        image_output_directory=tmp + "/images/"))
    generate_images(config)

    window_hp = ImageOptionsHP.CANDIDATE_WINDOW_SIZE + 1
    m = TransducerGRU(image_features=48, gru_layers=1, hidden_size=256,
                      num_classes=28, num_classes_type=3).eval()
    ckpt = tmp + "/ref_hp_model.pkl"
    torch.save({"model_state_dict": m.state_dict(), "model_optimizer": {},
                "hidden_size": 256, "gru_layers": 1, "epochs": 1}, ckpt)
    config.model_path = ckpt

    # ---- ours: staged stage 2 + stage 3 + VCF write ----
    pred_dir = tmp + "/preds/"
    run_inference(config, config.image_output_directory, pred_dir)
    ours_paths = process_candidates(config, pred_dir, tmp + "/out_ours/")

    # ---- composed reference ----
    data = load_all_summaries(config.image_output_directory)
    assert data["images"].shape[1:] == (window_hp, 48)
    with torch.no_grad():
        probs = m(torch.from_numpy(
            data["images"].astype(np.float32))).numpy()
    ref_pred = tmp + "/ref_preds.hdf"
    freqs = [[int(np.atleast_1d(f)[0])] for f in data["candidate_frequency"]]
    with PredictionStore(ref_pred, "w") as store:
        store.write_prediction(0, data["contigs"], data["positions"],
                               data["depths"], data["candidates"], freqs,
                               probs.astype(np.float64))
    options = types.SimpleNamespace(
        fasta=fasta, snp_p_value=config.snp_p_value,
        insert_p_value=config.insert_p_value,
        delete_p_value=config.delete_p_value,
        snp_p_value_in_lc=config.snp_p_value_in_lc,
        insert_p_value_in_lc=config.insert_p_value_in_lc,
        delete_p_value_in_lc=config.delete_p_value_in_lc,
        report_snp_above_freq=config.report_snp_above_freq,
        report_indel_above_freq=config.report_indel_above_freq)
    ref_margin, ref_dv = ref_stitch(options, [(ref_pred, "batch_0")])
    assert len(ref_dv) > 10, "composed HP path found no candidates"
    _contigs, _margin, dv_candidates = aggregate_candidates(ref_margin,
                                                            ref_dv)
    with FastaReader(fasta) as fa:
        fasta_contigs = [(n, fa.get_chromosome_sequence_length(n))
                         for n in fa.get_chromosome_names()]
    out_ref = tmp + "/out_ref/"
    os.makedirs(out_ref)
    writer = VCFWriteEngine(fasta_contigs, config.sample_name, out_ref)
    writer.write_vcf_records(dv_candidates, config)
    writer.close()
    ref_paths = writer.paths

    assert set(ours_paths) == set(ref_paths)
    compared = 0
    for key in ours_paths:
        ours = read_vcf(ours_paths[key])
        ref = read_vcf(ref_paths[key])
        assert len(ours) == len(ref), key
        for a, b in zip(ours, ref):
            assert (a.contig, a.pos, a.ref, tuple(a.alts)) == \
                (b.contig, b.pos, b.ref, tuple(b.alts)), (key, a, b)
            assert a.genotype() == b.genotype(), (key, a, b)
            assert abs(float(a.qual) - float(b.qual)) <= 0.05, (key, a, b)
            compared += 1
    assert compared > 10
