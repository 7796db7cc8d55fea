"""Pallas fused-RNN kernel tests (interpret mode on CPU; real on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pepper_tpu.models.rnn import init_rnn_params, lstm


def _interpret_mode():
    """Context: run fused_lstm's pallas_calls in interpreter mode
    (CPU-safe numerics check)."""
    from unittest import mock

    from jax.experimental import pallas as pl

    import pepper_tpu.ops.fused_lstm as fl
    real_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    return mock.patch.object(fl.pl, "pallas_call", interp_call)


def _fused_interpret(params, x, block_b=8):
    import pepper_tpu.ops.fused_lstm as fl
    with _interpret_mode():
        return fl.fused_bilstm.__wrapped__(params, x, block_b=block_b)


def test_fused_bilstm_matches_scan_interpret():
    p = jax.tree_util.tree_map(
        jnp.asarray, init_rnn_params(jax.random.PRNGKey(0), 26, 256, gates=4))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 33, 26), jnp.float32)
    want = lstm(p, x)
    got = _fused_interpret(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_bilstm_pads_ragged_batch():
    p = jax.tree_util.tree_map(
        jnp.asarray, init_rnn_params(jax.random.PRNGKey(2), 26, 128, gates=4))
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 17, 26), jnp.float32)
    want = lstm(p, x)
    got = _fused_interpret(p, x, block_b=8)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_bilstm_train_forward_matches_scan():
    from pepper_tpu.ops.fused_lstm import fused_bilstm_train
    p = jax.tree_util.tree_map(
        jnp.asarray, init_rnn_params(jax.random.PRNGKey(4), 10, 32, gates=4))
    x = jax.random.normal(jax.random.PRNGKey(5), (6, 12, 10), jnp.float32)
    want = lstm(p, x)
    with _interpret_mode():
        got = fused_bilstm_train(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_bilstm_train_grads_match_scan():
    """The Pallas BPTT backward must match autodiff through the scan —
    grads wrt every param AND wrt x (layer stacking needs dx)."""
    from pepper_tpu.ops.fused_lstm import fused_bilstm_train
    p = jax.tree_util.tree_map(
        jnp.asarray, init_rnn_params(jax.random.PRNGKey(6), 10, 32, gates=4))
    x = jax.random.normal(jax.random.PRNGKey(7), (6, 12, 10), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(8), (6, 12, 64), jnp.float32)

    def loss_scan(p, x):
        return jnp.sum(lstm(p, x) * w)

    def loss_fused(p, x):
        return jnp.sum(fused_bilstm_train(p, x) * w)

    want_p, want_x = jax.grad(loss_scan, argnums=(0, 1))(p, x)
    with _interpret_mode():
        got_p, got_x = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    for k in want_p:
        np.testing.assert_allclose(np.asarray(got_p[k]),
                                   np.asarray(want_p[k]),
                                   atol=5e-4, rtol=1e-3, err_msg=k)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------- fused GRU
def _gru_interpret(params, x, h0, block_b=8):
    from unittest import mock

    import pepper_tpu.ops.fused_gru as fg
    real_call = fg.pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    with mock.patch.object(fg.pl, "pallas_call", interp_call):
        return fg.fused_bigru.__wrapped__(params, x, h0, block_b=block_b)


def test_fused_bigru_matches_scan_interpret():
    from pepper_tpu.models.rnn import gru
    p = jax.tree_util.tree_map(
        jnp.asarray, init_rnn_params(jax.random.PRNGKey(3), 10, 128,
                                     gates=3))
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 100, 10), jnp.float32)
    h0 = jax.random.normal(jax.random.PRNGKey(5), (8, 2, 128), jnp.float32)
    want_out, want_h = gru(p, x, h0)
    got_out, got_h = _gru_interpret(p, x, h0)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               atol=2e-4)


def test_fused_bigru_batch_padding():
    from pepper_tpu.models.rnn import gru
    p = jax.tree_util.tree_map(
        jnp.asarray, init_rnn_params(jax.random.PRNGKey(6), 10, 64,
                                     gates=3))
    x = jax.random.normal(jax.random.PRNGKey(7), (5, 40, 10), jnp.float32)
    h0 = jnp.zeros((5, 2, 64), jnp.float32)
    want_out, want_h = gru(p, x, h0)
    got_out, got_h = _gru_interpret(p, x, h0, block_b=8)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               atol=2e-4)


def test_polish_forward_fused_matches_reference_path():
    """polish_forward(fused_rnn=True) must match the scan path through the
    full 2-layer encoder/decoder + linear head (window-carry contract)."""
    from unittest import mock

    import pepper_tpu.ops.fused_gru as fg
    from pepper_tpu.models.polish_model import (init_polish_params,
                                                polish_forward)
    real_call = fg.pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    p = jax.tree_util.tree_map(
        jnp.asarray, init_polish_params(jax.random.PRNGKey(8)))
    x = jax.random.normal(jax.random.PRNGKey(9), (8, 100, 10), jnp.float32)
    h0 = jax.random.normal(jax.random.PRNGKey(10), (8, 2, 128), jnp.float32)
    want_logits, want_h = polish_forward(p, x, h0)
    with mock.patch.object(fg.pl, "pallas_call", interp_call):
        got_logits, got_h = polish_forward(p, x, h0, fused_rnn=True)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               atol=5e-4)
