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


# ---------------------------------------------------------------- training
# The training path is the same recurrence with a custom VJP: the forward
# kernel additionally streams per-step residuals (gate activations + cell
# states) to HBM, and a second Pallas kernel runs the backpropagation-
# through-time loop in REVERSE grid order with the (dh, dc) carry in VMEM
# scratch, accumulating dW_hh in a VMEM block revisited across the whole
# grid. Input-projection grads (dW_ih, biases, dx) are batched MXU matmuls
# outside the kernel, mirroring the forward's batched input projection.


def _pick_block(B: int) -> int:
    """Batch tile: 128 rows saturates the MXU; small batches round up to
    the f32 sublane multiple (8) so tiny tests don't pad to 128."""
    return 128 if B >= 128 else max(8, -(-B // 8) * 8)


def _bilstm_train_fwd_kernel(xp_f_ref, xp_b_ref, whh_f_ref, whh_b_ref,
                             out_f_ref, out_b_ref, gat_f_ref, gat_b_ref,
                             cs_f_ref, cs_b_ref, h_f, c_f, h_b, c_b):
    """Forward step that also records residuals for the backward pass:
    post-activation gates [B,4H] and the updated cell state [B,H] (f32),
    stored at the ORIGINAL time index for both directions."""
    t = pl.program_id(1)
    H = whh_f_ref.shape[0]

    @pl.when(t == 0)
    def _():
        h_f[:] = jnp.zeros_like(h_f)
        c_f[:] = jnp.zeros_like(c_f)
        h_b[:] = jnp.zeros_like(h_b)
        c_b[:] = jnp.zeros_like(c_b)

    def gate_update(xp, whh_ref, h_ref, c_ref, out_ref, gat_ref, cs_ref):
        gates = xp.astype(jnp.float32) + jnp.dot(
            h_ref[:], whh_ref[:], preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
        gat_ref[0] = jnp.concatenate([i, f, g, o], axis=-1)
        c_ref[:] = f * c_ref[:] + i * g
        cs_ref[0] = c_ref[:]
        h = (o * jnp.tanh(c_ref[:])).astype(h_ref.dtype)
        h_ref[:] = h
        out_ref[0] = h

    gate_update(xp_f_ref[0], whh_f_ref, h_f, c_f, out_f_ref, gat_f_ref,
                cs_f_ref)
    gate_update(xp_b_ref[0], whh_b_ref, h_b, c_b, out_b_ref, gat_b_ref,
                cs_b_ref)


def _bilstm_bwd_kernel(gout_f_ref, gout_b_ref, gat_f_ref, gat_b_ref,
                       cs_f_ref, cs_b_ref, cp_f_ref, cp_b_ref,
                       hp_f_ref, hp_b_ref, whh_f_ref, whh_b_ref,
                       dxp_f_ref, dxp_b_ref, dwhh_f_ref, dwhh_b_ref,
                       dh_f, dc_f, dh_b, dc_b):
    """BPTT step. Grid (batch_tiles, T) where t is the REVERSE step: the
    index maps hand each direction its own time order (fwd dir walks
    T-1..0, bwd dir walks 0..T-1 in original indices). (dh, dc) live in
    VMEM scratch across steps; dW_hh accumulates in a revisited block."""
    i_tile = pl.program_id(0)
    t = pl.program_id(1)
    T = pl.num_programs(1)
    H = whh_f_ref.shape[0]

    @pl.when(t == 0)
    def _():
        dh_f[:] = jnp.zeros_like(dh_f)
        dc_f[:] = jnp.zeros_like(dc_f)
        dh_b[:] = jnp.zeros_like(dh_b)
        dc_b[:] = jnp.zeros_like(dc_b)

    @pl.when(jnp.logical_and(i_tile == 0, t == 0))
    def _():
        dwhh_f_ref[:] = jnp.zeros_like(dwhh_f_ref)
        dwhh_b_ref[:] = jnp.zeros_like(dwhh_b_ref)

    # the last reverse step is each direction's FIRST forward step, whose
    # previous (h, c) was the zero init state
    first_fwd = t == T - 1

    def back(gout_ref, gat_ref, cs_ref, cp_ref, hp_ref, whh_ref,
             dxp_ref, dwhh_ref, dh_s, dc_s):
        gat = gat_ref[0]
        i = gat[:, 0 * H:1 * H]
        f = gat[:, 1 * H:2 * H]
        g = gat[:, 2 * H:3 * H]
        o = gat[:, 3 * H:4 * H]
        cprev = jnp.where(first_fwd, 0.0, cp_ref[0])
        hprev = jnp.where(first_fwd, 0.0, hp_ref[0].astype(jnp.float32))
        dh_tot = gout_ref[0].astype(jnp.float32) + dh_s[:]
        tc = jnp.tanh(cs_ref[0])
        do = dh_tot * tc
        dc_tot = dc_s[:] + dh_tot * o * (1.0 - tc * tc)
        dgates = jnp.concatenate(
            [dc_tot * g * i * (1.0 - i),
             dc_tot * cprev * f * (1.0 - f),
             dc_tot * i * (1.0 - g * g),
             do * o * (1.0 - o)], axis=-1)
        dxp_ref[0] = dgates
        # dh_{prev} = dgates @ W_hh (contract the 4H axes)
        dh_s[:] = jax.lax.dot_general(
            dgates, whh_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dc_s[:] = dc_tot * f
        # d(W_hh^T) += h_prev^T @ dgates
        dwhh_ref[:] += jax.lax.dot_general(
            hprev, dgates, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    back(gout_f_ref, gat_f_ref, cs_f_ref, cp_f_ref, hp_f_ref, whh_f_ref,
         dxp_f_ref, dwhh_f_ref, dh_f, dc_f)
    back(gout_b_ref, gat_b_ref, cs_b_ref, cp_b_ref, hp_b_ref, whh_b_ref,
         dxp_b_ref, dwhh_b_ref, dh_b, dc_b)


def _train_fwd(params: Dict, x: jnp.ndarray):
    """Residual-saving forward. Returns (out [B,T,2H], residuals)."""
    B, T, F = x.shape
    H = params["weight_hh_l0"].shape[1]
    block_b = _pick_block(B)
    pad_b = (-B) % block_b
    if pad_b:
        x = jnp.concatenate([x, jnp.zeros((pad_b, T, F), x.dtype)], axis=0)
    Bp = x.shape[0]

    xp_f = jnp.swapaxes(
        x @ params["weight_ih_l0"].T + params["bias_ih_l0"]
        + params["bias_hh_l0"], 0, 1)
    xp_b = jnp.swapaxes(
        x @ params["weight_ih_l0_reverse"].T + params["bias_ih_l0_reverse"]
        + params["bias_hh_l0_reverse"], 0, 1)
    whh_f = params["weight_hh_l0"].T
    whh_b = params["weight_hh_l0_reverse"].T

    grid = (Bp // block_b, T)
    fwd_idx = lambda i, t: (t, i, 0)            # noqa: E731
    rev_idx = lambda i, t: (T - 1 - t, i, 0)    # noqa: E731

    def bspec(width, index_map):
        return pl.BlockSpec((1, block_b, width), index_map,
                            memory_space=pltpu.VMEM)

    spec_w = pl.BlockSpec((H, 4 * H), lambda i, t: (0, 0),
                          memory_space=pltpu.VMEM)
    out_f, out_b, gat_f, gat_b, cs_f, cs_b = pl.pallas_call(
        _bilstm_train_fwd_kernel,
        grid=grid,
        in_specs=[bspec(4 * H, fwd_idx), bspec(4 * H, rev_idx),
                  spec_w, spec_w],
        out_specs=[bspec(H, fwd_idx), bspec(H, rev_idx),
                   bspec(4 * H, fwd_idx), bspec(4 * H, rev_idx),
                   bspec(H, fwd_idx), bspec(H, rev_idx)],
        out_shape=[jax.ShapeDtypeStruct((T, Bp, H), x.dtype),
                   jax.ShapeDtypeStruct((T, Bp, H), x.dtype),
                   jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.float32),
                   jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.float32),
                   jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
                   jax.ShapeDtypeStruct((T, Bp, H), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((block_b, H), x.dtype),
                        pltpu.VMEM((block_b, H), jnp.float32),
                        pltpu.VMEM((block_b, H), x.dtype),
                        pltpu.VMEM((block_b, H), jnp.float32)],
    )(xp_f, xp_b, whh_f, whh_b)
    out = jnp.concatenate([jnp.swapaxes(out_f, 0, 1),
                           jnp.swapaxes(out_b, 0, 1)], axis=-1)[:B]
    return out, (out_f, out_b, gat_f, gat_b, cs_f, cs_b)


@jax.custom_vjp
def fused_bilstm_train(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """fused_bilstm with a Pallas BPTT backward — same contract as
    rnn.lstm (zero init state, [B,T,F] -> [B,T,2H]), differentiable wrt
    params and x. Tests: tests/test_pallas_ops.py."""
    out, _ = _train_fwd(params, x)
    return out


def _fused_train_fwd_rule(params, x):
    out, res = _train_fwd(params, x)
    return out, (params, x, res)


def _fused_train_bwd_rule(carry, g):
    params, x, res = carry
    out_f, out_b, gat_f, gat_b, cs_f, cs_b = res
    B, T, _ = x.shape
    Bp = out_f.shape[1]
    H = params["weight_hh_l0"].shape[1]
    block_b = _pick_block(B)

    g = g.astype(jnp.float32)
    if Bp != B:
        g = jnp.concatenate(
            [g, jnp.zeros((Bp - B, T, 2 * H), jnp.float32)], axis=0)
    gout_f = jnp.swapaxes(g[..., :H], 0, 1)   # [T,Bp,H], original time idx
    gout_b = jnp.swapaxes(g[..., H:], 0, 1)
    whh_f = params["weight_hh_l0"].astype(jnp.float32).T
    whh_b = params["weight_hh_l0_reverse"].astype(jnp.float32).T

    grid = (Bp // block_b, T)
    # t below is the REVERSE step: fwd dir visits original index T-1-t,
    # bwd dir visits original index t; "prev" is one step earlier in each
    # direction's own forward order (clamped — the kernel zero-masks the
    # first forward step instead of reading out of range).
    f_idx = lambda i, t: (T - 1 - t, i, 0)                       # noqa: E731
    b_idx = lambda i, t: (t, i, 0)                               # noqa: E731
    f_prev = lambda i, t: (jnp.maximum(T - 2 - t, 0), i, 0)      # noqa: E731
    b_prev = lambda i, t: (jnp.minimum(t + 1, T - 1), i, 0)      # noqa: E731

    def bspec(width, index_map):
        return pl.BlockSpec((1, block_b, width), index_map,
                            memory_space=pltpu.VMEM)

    spec_w = pl.BlockSpec((H, 4 * H), lambda i, t: (0, 0),
                          memory_space=pltpu.VMEM)
    dxp_f, dxp_b, dwhh_f, dwhh_b = pl.pallas_call(
        _bilstm_bwd_kernel,
        grid=grid,
        in_specs=[bspec(H, f_idx), bspec(H, b_idx),          # gout
                  bspec(4 * H, f_idx), bspec(4 * H, b_idx),  # gates
                  bspec(H, f_idx), bspec(H, b_idx),          # c_t
                  bspec(H, f_prev), bspec(H, b_prev),        # c_{t-1}
                  bspec(H, f_prev), bspec(H, b_prev),        # h_{t-1}
                  spec_w, spec_w],
        out_specs=[bspec(4 * H, f_idx), bspec(4 * H, b_idx),
                   pl.BlockSpec((H, 4 * H), lambda i, t: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((H, 4 * H), lambda i, t: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.float32),
                   jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.float32),
                   jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
                   jax.ShapeDtypeStruct((H, 4 * H), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((block_b, H), jnp.float32),
                        pltpu.VMEM((block_b, H), jnp.float32),
                        pltpu.VMEM((block_b, H), jnp.float32),
                        pltpu.VMEM((block_b, H), jnp.float32)],
    )(gout_f, gout_b, gat_f, gat_b, cs_f, cs_b, cs_f, cs_b,
      out_f, out_b, whh_f, whh_b)

    dxf = jnp.swapaxes(dxp_f, 0, 1)[:B]   # [B,T,4H] f32
    dxb = jnp.swapaxes(dxp_b, 0, 1)[:B]
    xf = x.astype(jnp.float32)
    dparams = {
        "weight_ih_l0": jnp.einsum("btg,btf->gf", dxf, xf),
        "weight_hh_l0": dwhh_f.T,
        "bias_ih_l0": dxf.sum((0, 1)),
        "bias_hh_l0": dxf.sum((0, 1)),
        "weight_ih_l0_reverse": jnp.einsum("btg,btf->gf", dxb, xf),
        "weight_hh_l0_reverse": dwhh_b.T,
        "bias_ih_l0_reverse": dxb.sum((0, 1)),
        "bias_hh_l0_reverse": dxb.sum((0, 1)),
    }
    dparams = {k: dparams[k].astype(params[k].dtype) for k in params}
    dx = (dxf @ params["weight_ih_l0"].astype(jnp.float32)
          + dxb @ params["weight_ih_l0_reverse"].astype(jnp.float32))
    return dparams, dx.astype(x.dtype)


fused_bilstm_train.defvjp(_fused_train_fwd_rule, _fused_train_bwd_rule)
