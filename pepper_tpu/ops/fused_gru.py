"""Pallas fused bidirectional GRU layer with carried hidden state (TPU).

The polish consensus scan runs 19 overlapping windows per sequence, each a
2-layer biGRU over 100 steps with the hidden state carried across windows
(pepper/modules/python/models/predict_distributed_cpu.py:43-63) — the
serial RNN time that dominates the polish device path. Same design as
ops/fused_lstm.py: the recurrence is the INNER grid dimension (TPU grids
run sequentially with automatic pipelining); per (batch-tile, t) step the
t-th input-projection slice streams into VMEM while h lives in VMEM
scratch. Unlike the LSTM kernel, h0 comes in as an input (window carry)
and the final hidden comes back out.

torch-GRU quirk preserved (models/rnn.py _gru_scan): the hidden-side bias
b_hn sits INSIDE the reset-gate product, n = tanh(x_n + r*(h@W_hn^T+b_hn)).
Numerics match rnn.gru; tests/test_pallas_ops.py asserts allclose.
"""
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bigru_step_kernel(xp_f_ref, xp_b_ref, whh_f_ref, whh_b_ref,
                       bhh_f_ref, bhh_b_ref, h0_f_ref, h0_b_ref,
                       out_f_ref, out_b_ref, hN_f_ref, hN_b_ref,
                       h_f, h_b):
    """Grid (batch_tiles, T): one timestep for one batch tile, both
    directions. h scratch persists across the sequential T dimension;
    the final hidden is flushed on the last step."""
    t = pl.program_id(1)
    T = pl.num_programs(1)
    H = whh_f_ref.shape[0]

    @pl.when(t == 0)
    def _():
        h_f[:] = h0_f_ref[:]
        h_b[:] = h0_b_ref[:]

    def gate_update(xp, whh_ref, bhh_ref, h_ref, out_ref, hN_ref):
        # h scratch stays in the input dtype (bf16 in production) for the
        # MXU fast path; gate math runs in f32
        h_prev = h_ref[:].astype(jnp.float32)
        hp = jnp.dot(h_ref[:], whh_ref[:],
                     preferred_element_type=jnp.float32) + bhh_ref[0]
        xpf = xp.astype(jnp.float32)
        r = jax.nn.sigmoid(xpf[:, 0 * H:1 * H] + hp[:, 0 * H:1 * H])
        z = jax.nn.sigmoid(xpf[:, 1 * H:2 * H] + hp[:, 1 * H:2 * H])
        n = jnp.tanh(xpf[:, 2 * H:3 * H] + r * hp[:, 2 * H:3 * H])
        h = ((1.0 - z) * n + z * h_prev).astype(h_ref.dtype)
        h_ref[:] = h
        out_ref[0] = h

        @pl.when(t == T - 1)
        def _():
            hN_ref[:] = h

    gate_update(xp_f_ref[0], whh_f_ref, bhh_f_ref, h_f, out_f_ref, hN_f_ref)
    gate_update(xp_b_ref[0], whh_b_ref, bhh_b_ref, h_b, out_b_ref, hN_b_ref)


@functools.partial(jax.jit, static_argnames=("block_b",))
def fused_bigru(params: Dict, x: jnp.ndarray, h0: jnp.ndarray,
                block_b: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional GRU — drop-in for rnn.gru.

    x: [B, T, F]; h0: [B, 2, H] (dir-major). Returns
    (out [B, T, 2H], h_final [B, 2, H])."""
    B, T, F = x.shape
    H = params["weight_hh_l0"].shape[1]
    pad_b = (-B) % block_b
    if pad_b:
        x = jnp.concatenate([x, jnp.zeros((pad_b, T, F), x.dtype)], axis=0)
        h0 = jnp.concatenate(
            [h0, jnp.zeros((pad_b, 2, H), h0.dtype)], axis=0)
    Bp = x.shape[0]

    # batched input projections (one MXU matmul per direction), time-major
    xp_f = jnp.swapaxes(x @ params["weight_ih_l0"].T
                        + params["bias_ih_l0"], 0, 1)
    xp_b = jnp.swapaxes(x @ params["weight_ih_l0_reverse"].T
                        + params["bias_ih_l0_reverse"], 0, 1)
    whh_f = params["weight_hh_l0"].T          # [H, 3H]
    whh_b = params["weight_hh_l0_reverse"].T
    bhh_f = params["bias_hh_l0"].reshape(1, -1).astype(jnp.float32)
    bhh_b = params["bias_hh_l0_reverse"].reshape(1, -1).astype(jnp.float32)
    h0_f = h0[:, 0].astype(x.dtype)
    h0_b = h0[:, 1].astype(x.dtype)

    grid = (Bp // block_b, T)
    fwd_idx = lambda i, t: (t, i, 0)            # noqa: E731
    rev_idx = lambda i, t: (T - 1 - t, i, 0)    # noqa: E731

    def bspec(width, index_map):
        return pl.BlockSpec((1, block_b, width), index_map,
                            memory_space=pltpu.VMEM)

    spec_w = pl.BlockSpec((H, 3 * H), lambda i, t: (0, 0),
                          memory_space=pltpu.VMEM)
    spec_bias = pl.BlockSpec((1, 3 * H), lambda i, t: (0, 0),
                             memory_space=pltpu.VMEM)
    spec_h0 = pl.BlockSpec((block_b, H), lambda i, t: (i, 0),
                           memory_space=pltpu.VMEM)
    out_f, out_b, hN_f, hN_b = pl.pallas_call(
        _bigru_step_kernel,
        grid=grid,
        in_specs=[bspec(3 * H, fwd_idx), bspec(3 * H, rev_idx),
                  spec_w, spec_w, spec_bias, spec_bias, spec_h0, spec_h0],
        out_specs=[bspec(H, fwd_idx), bspec(H, rev_idx),
                   spec_h0, spec_h0],
        out_shape=[jax.ShapeDtypeStruct((T, Bp, H), x.dtype),
                   jax.ShapeDtypeStruct((T, Bp, H), x.dtype),
                   jax.ShapeDtypeStruct((Bp, H), x.dtype),
                   jax.ShapeDtypeStruct((Bp, H), x.dtype)],
        scratch_shapes=[pltpu.VMEM((block_b, H), x.dtype),
                        pltpu.VMEM((block_b, H), x.dtype)],
    )(xp_f, xp_b, whh_f, whh_b, bhh_f, bhh_b, h0_f, h0_b)
    out = jnp.concatenate([jnp.swapaxes(out_f, 0, 1),
                           jnp.swapaxes(out_b, 0, 1)], axis=-1)
    h_final = jnp.stack([hN_f, hN_b], axis=1)
    return out[:B], h_final[:B].astype(h0.dtype)
