"""Pallas fused-RNN kernel tests (interpret mode on CPU; real on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pepper_tpu.models.rnn import init_rnn_params, lstm


def _fused_interpret(params, x, block_b=8):
    """Run the kernel in interpreter mode (CPU-safe numerics check)."""
    from unittest import mock

    from jax.experimental import pallas as pl

    import pepper_tpu.ops.fused_lstm as fl
    real_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    with mock.patch.object(fl.pl, "pallas_call", interp_call):
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
