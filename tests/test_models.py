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
