"""Model parity tests: JAX cells vs torch (CPU) with identical weights.

The parity contract: reference torch checkpoints must produce bit-close
outputs through our JAX models (models/checkpoint.py imports them 1:1).
"""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from pepper_tpu.models.checkpoint import (from_torch_state_dict,
                                          load_checkpoint, save_checkpoint)
from pepper_tpu.models.polish_model import init_hidden, polish_forward
from pepper_tpu.models.rnn import gru, lstm
from pepper_tpu.models.variant_model import init_variant_params, variant_forward

torch.manual_seed(0)


def test_lstm_matches_torch():
    B, T, F, H = 3, 33, 26, 16
    m = nn.LSTM(F, H, num_layers=1, bidirectional=True, batch_first=True)
    x = torch.randn(B, T, F)
    with torch.no_grad():
        want, _ = m(x)
    p = from_torch_state_dict(m.state_dict())
    got = lstm(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_gru_matches_torch_with_hidden():
    B, T, F, H = 2, 50, 10, 8
    m = nn.GRU(F, H, num_layers=1, bidirectional=True, batch_first=True)
    x = torch.randn(B, T, F)
    h0 = torch.randn(2, B, H)  # torch layout [dirs, B, H]
    with torch.no_grad():
        want, want_h = m(x, h0)
    p = from_torch_state_dict(m.state_dict())
    # ours takes [B, dirs, H]
    got, got_h = gru(p, jnp.asarray(x.numpy()),
                     jnp.asarray(h0.transpose(0, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h),
                               want_h.transpose(0, 1).numpy(), atol=1e-5)


class TorchVariantModel(nn.Module):
    """Reference-architecture twin built from stock torch layers (test-only
    stand-in for a real reference checkpoint; no reference code imported)."""

    def __init__(self, F=26, H=256, window=33, n_type=3):
        super().__init__()
        self.encoder = nn.LSTM(F, H, num_layers=1, bidirectional=True,
                               batch_first=True)
        self.decoder = nn.LSTM(2 * H, H, num_layers=1, bidirectional=True,
                               batch_first=True)
        self.linear_1 = nn.Linear(2 * H * window, 512)
        self.linear_2 = nn.Linear(512, 512)
        self.linear_3 = nn.Linear(512, 512)
        self.linear_4 = nn.Linear(512, 512)
        self.linear_5 = nn.Linear(512, 512)
        self.output_layer_type = nn.Linear(512, n_type)

    def forward(self, x):
        act = nn.SELU()
        x, _ = self.encoder(x)
        x, _ = self.decoder(x)
        x = torch.flatten(x, 1, 2)
        for lin in (self.linear_1, self.linear_2, self.linear_3,
                    self.linear_4, self.linear_5):
            x = act(lin(x))
        return torch.softmax(self.output_layer_type(x), dim=1)


def test_variant_model_matches_torch():
    m = TorchVariantModel().eval()
    x = torch.randn(4, 33, 26)
    with torch.no_grad():
        want = m(x)
    params = from_torch_state_dict(m.state_dict())
    got = variant_forward(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)
    # DataParallel-prefixed checkpoints convert identically
    pref = {"module." + k: v for k, v in m.state_dict().items()}
    params2 = from_torch_state_dict(pref)
    got2 = variant_forward(params2, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got))


class TorchPolishModel(nn.Module):
    def __init__(self, F=10, H=128, C=5):
        super().__init__()
        self.gru_encoder = nn.GRU(F, H, num_layers=1, bidirectional=True,
                                  batch_first=True)
        self.gru_decoder = nn.GRU(2 * H, H, num_layers=1, bidirectional=True,
                                  batch_first=True)
        self.dense1 = nn.Linear(2 * H, C)

    def forward(self, x, hidden):
        hidden = hidden.transpose(0, 1).contiguous()
        out, h = self.gru_encoder(x, hidden)
        out, h = self.gru_decoder(out, h)
        return self.dense1(out), h.transpose(0, 1).contiguous()


def test_polish_model_matches_torch_and_carries_hidden():
    m = TorchPolishModel().eval()
    params = from_torch_state_dict(m.state_dict())
    B, T = 2, 100
    x1 = torch.randn(B, T, 10)
    x2 = torch.randn(B, T, 10)
    h = torch.zeros(B, 2, 128)
    with torch.no_grad():
        w1, h1 = m(x1, h)
        w2, h2 = m(x2, h1)
    g1, gh1 = polish_forward(params, jnp.asarray(x1.numpy()),
                             init_hidden(B))
    g2, gh2 = polish_forward(params, jnp.asarray(x2.numpy()), gh1)
    np.testing.assert_allclose(np.asarray(g1), w1.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), w2.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh2), h2.numpy(), atol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    params = init_variant_params(jax.random.PRNGKey(0), hidden=8)
    path = str(tmp_path / "model.npz")
    save_checkpoint(path, params, {"epochs": 3, "hidden_size": 8})
    loaded, meta = load_checkpoint(path)
    assert meta == {"epochs": 3, "hidden_size": 8}
    x = jnp.zeros((2, 33, 26))
    np.testing.assert_allclose(np.asarray(variant_forward(params, x)),
                               np.asarray(variant_forward(loaded, x)),
                               atol=1e-6)


def test_torch_pkl_checkpoint_import(tmp_path):
    """A reference-style .pkl (model_state_dict + meta) imports losslessly."""
    m = TorchVariantModel().eval()
    path = str(tmp_path / "ref_model.pkl")
    torch.save({"model_state_dict": m.state_dict(), "hidden_size": 256,
                "gru_layers": 1, "epochs": 7}, path)
    from pepper_tpu.models.checkpoint import load_torch_checkpoint
    params, meta = load_torch_checkpoint(path)
    assert meta["epochs"] == 7
    x = torch.randn(2, 33, 26)
    with torch.no_grad():
        want = m(x)
    got = variant_forward(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


class TorchTransformerModel(nn.Module):
    """Reference-architecture twin of the alternate transformer classifier."""

    def __init__(self, F=26, window=33, n_classes=3, C=4):
        super().__init__()
        self.conv1 = nn.Conv2d(1, C, kernel_size=3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(C)
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(C, C, kernel_size=3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(C)
        layer = nn.TransformerEncoderLayer(d_model=C * F, nhead=8,
                                           batch_first=True)
        self.encoder = nn.TransformerEncoder(layer, num_layers=6)
        self.linear_1 = nn.Linear(C * F * window, 128)
        self.linear_2 = nn.Linear(128, 64)
        self.linear_3 = nn.Linear(64, 32)
        self.linear_4 = nn.Linear(32, 16)
        self.linear_5 = nn.Linear(16, 8)
        self.output_layer = nn.Linear(8, n_classes)

    def forward(self, x):
        x = torch.reshape(x, (x.size(0), 1, x.size(1), x.size(2)))
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        out = self.relu(out + residual)
        out = torch.reshape(out, (out.size(0), out.size(2),
                                  out.size(1) * out.size(3)))
        out = self.encoder(out)
        out = torch.flatten(out, 1, 2)
        for lin in (self.linear_1, self.linear_2, self.linear_3,
                    self.linear_4, self.linear_5):
            out = self.relu(lin(out))
        return torch.softmax(self.output_layer(out), dim=1)


def test_transformer_model_matches_torch():
    from pepper_tpu.models.variant_transformer import transformer_forward
    m = TorchTransformerModel().eval()
    x = torch.randn(3, 33, 26)
    with torch.no_grad():
        want = m(x)
    params = from_torch_state_dict(m.state_dict())
    got = transformer_forward(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-5)


class TorchNoCnnModel(nn.Module):
    """Reference-architecture twin of the no-CNN alternate classifier."""

    def __init__(self, F=26, window=33, n_classes=3, H=128):
        super().__init__()
        self.encoder = nn.LSTM(F, H, num_layers=1, bidirectional=True,
                               batch_first=True)
        self.decoder = nn.LSTM(F, H, num_layers=1, bidirectional=True,
                               batch_first=True)
        self.relu = nn.ReLU()
        self.linear_1 = nn.Linear(2 * H * window, 256)
        self.linear_2 = nn.Linear(256, 128)
        self.linear_3 = nn.Linear(128, 64)
        self.linear_4 = nn.Linear(64, 32)
        self.linear_5 = nn.Linear(32, 16)
        self.output_layer = nn.Linear(16, n_classes)

    def forward(self, x, hidden, cell_state):
        hidden = hidden.transpose(0, 1).contiguous()
        cell_state = cell_state.transpose(0, 1).contiguous()
        _, (hidden, cell_state) = self.encoder(x, (hidden, cell_state))
        out, _ = self.decoder(x, (hidden, cell_state))
        out = torch.flatten(out, 1, 2)
        for lin in (self.linear_1, self.linear_2, self.linear_3,
                    self.linear_4, self.linear_5):
            out = self.relu(lin(out))
        return torch.softmax(self.output_layer(out), dim=1)


def test_no_cnn_model_matches_torch():
    from pepper_tpu.models.variant_no_cnn import init_state, no_cnn_forward
    m = TorchNoCnnModel().eval()
    x = torch.randn(3, 33, 26)
    h = torch.randn(3, 2, 128)
    c = torch.randn(3, 2, 128)
    with torch.no_grad():
        want = m(x, h, c)
    params = from_torch_state_dict(m.state_dict())
    got = no_cnn_forward(params, jnp.asarray(x.numpy()),
                         jnp.asarray(h.numpy()), jnp.asarray(c.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


class _TorchBasicConv2d(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.conv = nn.Conv2d(1, 1, bias=False, **kw)
        self.bn = nn.BatchNorm2d(1, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class _TorchBasicBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 1, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(1)
        self.conv2 = nn.Conv2d(1, 1, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(1)

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + x)  # identity skip (reference downsample quirk)


class _TorchMiniResnet(nn.Module):
    def __init__(self):
        super().__init__()
        self.Context_Conv2d_0a = _TorchBasicConv2d(kernel_size=(1, 4),
                                                   stride=(1, 4))
        self.Context_Conv2d_1a = _TorchBasicConv2d(kernel_size=(1, 1),
                                                   stride=(1, 1))
        self.layer1 = nn.Sequential(_TorchBasicBlock())

    def forward(self, x):
        return self.layer1(self.Context_Conv2d_1a(self.Context_Conv2d_0a(x)))


class _TorchEncoderCNN(nn.Module):
    def __init__(self):
        super().__init__()
        self.cnn = _TorchMiniResnet()

    def forward(self, x):
        return self.cnn(x)


class TorchSeq2SeqEncoder(nn.Module):
    """Reference-architecture twin of the legacy EncoderCRNN."""

    def __init__(self, H=16, L=2):
        super().__init__()
        self.cnn_encoder = _TorchEncoderCNN()
        self.gru = nn.GRU(5, H, num_layers=L, bidirectional=True,
                          batch_first=True)

    def forward(self, x, hidden):
        hidden = hidden.transpose(0, 1).contiguous()
        f = self.cnn_encoder(x)
        B, T = f.size(0), f.size(2)
        out, h = self.gru(f.view(B, T, -1), hidden)
        out = out.view(B, T, 2, -1).sum(2)
        return out, h.transpose(0, 1).contiguous()


class TorchSeq2SeqDecoder(nn.Module):
    """Reference-architecture twin of the legacy AttnDecoderRNN."""

    def __init__(self, H=16, L=2, C=5, seq_len=12):
        super().__init__()
        self.embedding = nn.Embedding(C, H)  # unused by forward (quirk)
        self.attention = nn.Module()
        self.attention.linear_out = nn.Linear(2 * H, H)
        self.gru = nn.GRU(seq_len, H, num_layers=L, bidirectional=True,
                          batch_first=True)
        self.out = nn.Linear(H, C)

    def forward(self, onehot, context, hidden):
        hidden = hidden.transpose(0, 1).contiguous()
        B = onehot.size(0)
        out, h = self.gru(onehot.view(B, 1, -1), hidden)
        out = out.view(B, 1, 2, -1).sum(2)
        T = context.size(1)
        attn = torch.bmm(out, context.transpose(1, 2))
        attn = torch.softmax(attn.view(-1, T), dim=1).view(B, -1, T)
        mix = torch.bmm(attn, context)
        combined = torch.cat((mix, out), dim=2)
        H = out.size(2)
        out = torch.tanh(self.attention.linear_out(
            combined.view(-1, 2 * H))).view(B, -1, H)
        return self.out(out.contiguous().view(-1, H)), \
            h.transpose(0, 1).contiguous(), attn


def test_seq2seq_encoder_matches_torch():
    from pepper_tpu.models.polish_seq2seq import encoder_forward
    m = TorchSeq2SeqEncoder(H=16, L=2).eval()
    x = torch.randn(3, 1, 12, 20)
    h0 = torch.randn(3, 4, 16)
    with torch.no_grad():
        want_out, want_h = m(x, h0)
    params = from_torch_state_dict(m.state_dict())
    got_out, got_h = encoder_forward(params, jnp.asarray(x.numpy()),
                                     jnp.asarray(h0.numpy()), gru_layers=2)
    np.testing.assert_allclose(np.asarray(got_out), want_out.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_h), want_h.numpy(), atol=2e-5)


def test_seq2seq_decoder_matches_torch():
    from pepper_tpu.models.polish_seq2seq import decoder_forward
    m = TorchSeq2SeqDecoder(H=16, L=2, C=5, seq_len=12).eval()
    onehot = torch.zeros(3, 12)
    onehot[:, 4] = 1.0
    context = torch.randn(3, 12, 16)
    h0 = torch.randn(3, 4, 16)
    with torch.no_grad():
        want_logits, want_h, want_attn = m(onehot, context, h0)
    params = from_torch_state_dict(m.state_dict())
    got_logits, got_h, got_attn = decoder_forward(
        params, jnp.asarray(onehot.numpy()), jnp.asarray(context.numpy()),
        jnp.asarray(h0.numpy()), gru_layers=2)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_h), want_h.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_attn), want_attn.numpy(),
                               atol=2e-5)


def test_seq2seq_init_matches_torch_keyset():
    """Freshly-initialized param trees carry exactly the torch key set, so
    native checkpoints and imported reference checkpoints are isomorphic."""
    from pepper_tpu.models.polish_seq2seq import (init_decoder_params,
                                                  init_encoder_params)
    enc = init_encoder_params(jax.random.PRNGKey(0), gru_layers=2,
                              hidden_size=16)
    dec = init_decoder_params(jax.random.PRNGKey(1), hidden_size=16,
                              gru_layers=2, num_classes=5, seq_len=12)

    def flatten(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from flatten(v, prefix + k + ".")
            else:
                yield prefix + k

    want_enc = {k for k in TorchSeq2SeqEncoder(H=16, L=2).state_dict()
                if "num_batches_tracked" not in k}
    want_dec = {k for k in TorchSeq2SeqDecoder(H=16, L=2, C=5,
                                               seq_len=12).state_dict()}
    assert set(flatten(enc)) == want_enc
    assert set(flatten(dec)) == want_dec
