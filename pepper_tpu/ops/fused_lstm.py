"""Pallas fused bidirectional LSTM layer (TPU).

The recurrent loop of the variant classifier's biLSTM is the serial part of
the hot path: per step a [B,H] @ [H,4H] matmul plus gate nonlinearities.
This kernel runs the recurrence as the INNER grid dimension (TPU grids
execute sequentially with automatic pipelining): per (batch-tile, t) step,
pallas streams the t-th input-projection slice into VMEM while h and c live
in VMEM scratch that persists across grid steps. Both directions run in the
same program — the backward direction simply reads/writes its slices
through a reversed index map — so the MXU sees two back-to-back [B,H]@[H,4H]
matmuls per step.

The input projection x @ W_ih^T for all timesteps is one big MXU matmul
done OUTSIDE the kernel. Numerics match pepper_tpu/models/rnn.lstm; tests
assert allclose. Enable via variant_forward(..., fused_rnn=True) or
PEPPER_TPU_FUSED_RNN=1.
"""
import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilstm_step_kernel(xp_f_ref, xp_b_ref, whh_f_ref, whh_b_ref,
                        out_f_ref, out_b_ref, h_f, c_f, h_b, c_b):
    """Grid (batch_tiles, T): one timestep for one batch tile, both
    directions. Scratch h/c persist across the sequential T dimension."""
    t = pl.program_id(1)
    H = whh_f_ref.shape[0]

    @pl.when(t == 0)
    def _():
        h_f[:] = jnp.zeros_like(h_f)
        c_f[:] = jnp.zeros_like(c_f)
        h_b[:] = jnp.zeros_like(h_b)
        c_b[:] = jnp.zeros_like(c_b)

    def gate_update(xp, whh_ref, h_ref, c_ref, out_ref):
        # h scratch stays in the input dtype (bf16 in production) so the
        # recurrent matmul runs the MXU's fast path; the cell state
        # accumulates in f32 for stability
        gates = xp.astype(jnp.float32) + jnp.dot(
            h_ref[:], whh_ref[:], preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
        c_ref[:] = f * c_ref[:] + i * g
        h = (o * jnp.tanh(c_ref[:])).astype(h_ref.dtype)
        h_ref[:] = h
        out_ref[0] = h

    gate_update(xp_f_ref[0], whh_f_ref, h_f, c_f, out_f_ref)
    gate_update(xp_b_ref[0], whh_b_ref, h_b, c_b, out_b_ref)


@functools.partial(jax.jit, static_argnames=("block_b",))
def fused_bilstm(params: Dict, x: jnp.ndarray,
                 block_b: int = 128) -> jnp.ndarray:
    """Bidirectional LSTM with zero init state — drop-in for rnn.lstm.

    x: [B, T, F] float32 -> [B, T, 2H]."""
    B, T, F = x.shape
    H = params["weight_hh_l0"].shape[1]
    pad_b = (-B) % block_b
    if pad_b:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_b, T, F), x.dtype)], axis=0)
    Bp = x.shape[0]

    # batched input projections (one MXU matmul per direction), time-major
    xp_f = jnp.swapaxes(
        x @ params["weight_ih_l0"].T + params["bias_ih_l0"]
        + params["bias_hh_l0"], 0, 1)
    xp_b = jnp.swapaxes(
        x @ params["weight_ih_l0_reverse"].T + params["bias_ih_l0_reverse"]
        + params["bias_hh_l0_reverse"], 0, 1)
    whh_f = params["weight_hh_l0"].T          # [H, 4H]
    whh_b = params["weight_hh_l0_reverse"].T

    grid = (Bp // block_b, T)
    spec_xp_f = pl.BlockSpec((1, block_b, 4 * H), lambda i, t: (t, i, 0),
                             memory_space=pltpu.VMEM)
    spec_xp_b = pl.BlockSpec((1, block_b, 4 * H),
                             lambda i, t: (T - 1 - t, i, 0),
                             memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((H, 4 * H), lambda i, t: (0, 0),
                          memory_space=pltpu.VMEM)
    spec_out_f = pl.BlockSpec((1, block_b, H), lambda i, t: (t, i, 0),
                              memory_space=pltpu.VMEM)
    spec_out_b = pl.BlockSpec((1, block_b, H),
                              lambda i, t: (T - 1 - t, i, 0),
                              memory_space=pltpu.VMEM)
    out_f, out_b = pl.pallas_call(
        _bilstm_step_kernel,
        grid=grid,
        in_specs=[spec_xp_f, spec_xp_b, spec_w, spec_w],
        out_specs=[spec_out_f, spec_out_b],
        out_shape=[jax.ShapeDtypeStruct((T, Bp, H), x.dtype),
                   jax.ShapeDtypeStruct((T, Bp, H), x.dtype)],
        # h in the input dtype (fast MXU path), cell state in f32
        scratch_shapes=[pltpu.VMEM((block_b, H), x.dtype),
                        pltpu.VMEM((block_b, H), jnp.float32),
                        pltpu.VMEM((block_b, H), x.dtype),
                        pltpu.VMEM((block_b, H), jnp.float32)],
    )(xp_f, xp_b, whh_f, whh_b)
    out = jnp.concatenate([jnp.swapaxes(out_f, 0, 1),
                           jnp.swapaxes(out_b, 0, 1)], axis=-1)
    return out[:B]
