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
