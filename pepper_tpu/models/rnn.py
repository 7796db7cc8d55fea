"""Functional RNN cells (LSTM/GRU) with torch parameter layout.

TPU-first layout: the input projection for ALL timesteps is batched into a
single MXU matmul ([B,T,F] @ W_ih^T) outside the scan; the `lax.scan` carries
only the [B,H] @ W_hh^T recurrent matmul and the gate nonlinearities, which
XLA fuses into the scan body. Bidirectional = forward scan + reversed scan,
concatenated on the feature axis.

Parameter names/shapes mirror torch.nn.LSTM/GRU exactly
(weight_ih_l0 [G*H,F], weight_hh_l0 [G*H,H], bias_ih_l0, bias_hh_l0, and
*_reverse for the backward direction; LSTM gate order i,f,g,o; GRU r,z,n)
so reference checkpoints (pepper_variant/modules/python/models/simple_model.py,
pepper/modules/python/models/simple_model.py) convert losslessly.
"""
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def init_rnn_params(key, input_size: int, hidden_size: int, gates: int,
                    bidirectional: bool = True) -> Params:
    """torch default init: U(-1/sqrt(H), 1/sqrt(H)) for every tensor."""
    bound = 1.0 / math.sqrt(hidden_size)
    G = gates * hidden_size
    names = ["weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"]
    shapes = [(G, input_size), (G, hidden_size), (G,), (G,)]
    if bidirectional:
        names += [n + "_reverse" for n in names[:4]]
        shapes += shapes[:4]
    keys = jax.random.split(key, len(names))
    return {n: _uniform(k, s, bound) for n, k, s in zip(names, keys, shapes)}


def init_linear_params(key, in_size: int, out_size: int) -> Params:
    bound = 1.0 / math.sqrt(in_size)
    k1, k2 = jax.random.split(key)
    return {"weight": _uniform(k1, (out_size, in_size), bound),
            "bias": _uniform(k2, (out_size,), bound)}


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["weight"].T + p["bias"]


# --------------------------------------------------------------------- LSTM
def _lstm_scan(x_proj, w_hh, b_hh, h0, c0, reverse: bool):
    """x_proj: [B,T,4H] (input projection already applied). Returns [B,T,H]."""
    H = h0.shape[-1]
    w_hh_t = w_hh.T  # [H, 4H]

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh_t + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    # Give the carry the same varying manual axes as the scanned input so
    # the scan typechecks under shard_map (runtime/streaming.py shards the
    # batch per device); the mul-by-zero folds away in XLA.
    vma0 = x_proj[:, 0, :1] * 0
    xs = jnp.swapaxes(x_proj, 0, 1)  # [T,B,4H]
    (_, _), hs = jax.lax.scan(step, (h0 + vma0, c0 + vma0), xs,
                              reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def _lstm_scan_state(x_proj, w_hh, b_hh, h0, c0, reverse: bool):
    """Like _lstm_scan but also returns the final (h, c)."""
    w_hh_t = w_hh.T

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh_t + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    vma0 = x_proj[:, 0, :1] * 0  # carry vma must match input (see _lstm_scan)
    xs = jnp.swapaxes(x_proj, 0, 1)
    (h_last, c_last), hs = jax.lax.scan(step, (h0 + vma0, c0 + vma0), xs,
                                        reverse=reverse)
    return jnp.swapaxes(hs, 0, 1), h_last, c_last


def lstm_with_state(p: Params, x: jnp.ndarray, h0: jnp.ndarray,
                    c0: jnp.ndarray):
    """Bidirectional LSTM with explicit initial state.

    x: [B,T,F]; h0/c0: [B, 2, H] (dir-major). Returns
    (out [B,T,2H], h_final [B,2,H], c_final [B,2,H])."""
    xf = x @ p["weight_ih_l0"].T + p["bias_ih_l0"]
    out_f, hf, cf = _lstm_scan_state(xf, p["weight_hh_l0"], p["bias_hh_l0"],
                                     h0[:, 0], c0[:, 0], False)
    xb = x @ p["weight_ih_l0_reverse"].T + p["bias_ih_l0_reverse"]
    out_b, hb, cb = _lstm_scan_state(xb, p["weight_hh_l0_reverse"],
                                     p["bias_hh_l0_reverse"], h0[:, 1],
                                     c0[:, 1], True)
    out = jnp.concatenate([out_f, out_b], axis=-1)
    return (out, jnp.stack([hf, hb], axis=1), jnp.stack([cf, cb], axis=1))


def lstm(p: Params, x: jnp.ndarray, bidirectional: bool = True) -> jnp.ndarray:
    """Bidirectional LSTM, zero initial state (torch default when h0 absent).

    x: [B,T,F] -> [B,T,2H] (fwd||bwd concat, matching torch output layout).
    """
    B = x.shape[0]
    H = p["weight_hh_l0"].shape[1]
    h0 = jnp.zeros((B, H), x.dtype)
    xf = x @ p["weight_ih_l0"].T + p["bias_ih_l0"]
    out_f = _lstm_scan(xf, p["weight_hh_l0"], p["bias_hh_l0"], h0, h0, False)
    if not bidirectional:
        return out_f
    xb = x @ p["weight_ih_l0_reverse"].T + p["bias_ih_l0_reverse"]
    out_b = _lstm_scan(xb, p["weight_hh_l0_reverse"], p["bias_hh_l0_reverse"],
                       h0, h0, True)
    return jnp.concatenate([out_f, out_b], axis=-1)


# ---------------------------------------------------------------------- GRU
def _gru_scan(x_proj, w_hh, b_hh, h0, reverse: bool):
    """x_proj: [B,T,3H]. torch GRU semantics: the hidden-side bias b_hn sits
    INSIDE the reset gate product: n = tanh(x_n + r*(h@W_hn^T + b_hn))."""
    w_hh_t = w_hh.T  # [H, 3H]

    def step(h, xp):
        hp = h @ w_hh_t + b_hh
        x_r, x_z, x_n = jnp.split(xp, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(x_r + h_r)
        z = jax.nn.sigmoid(x_z + h_z)
        n = jnp.tanh(x_n + r * h_n)
        h = (1.0 - z) * n + z * h
        return h, h

    vma0 = x_proj[:, 0, :1] * 0  # carry vma must match input (see _lstm_scan)
    xs = jnp.swapaxes(x_proj, 0, 1)
    h_last, hs = jax.lax.scan(step, h0 + vma0, xs, reverse=reverse)
    return h_last, jnp.swapaxes(hs, 0, 1)


def gru(p: Params, x: jnp.ndarray, h0: jnp.ndarray,
        bidirectional: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional GRU with explicit initial hidden.

    x: [B,T,F]; h0: [B, 2, H] (dir-major, the reference's transposed layout,
    pepper/modules/python/models/simple_model.py:29).
    Returns (out [B,T,2H], h_final [B,2,H]).
    """
    xf = x @ p["weight_ih_l0"].T + p["bias_ih_l0"]
    hf, out_f = _gru_scan(xf, p["weight_hh_l0"], p["bias_hh_l0"],
                          h0[:, 0], False)
    if not bidirectional:
        return out_f, hf[:, None]
    xb = x @ p["weight_ih_l0_reverse"].T + p["bias_ih_l0_reverse"]
    hb, out_b = _gru_scan(xb, p["weight_hh_l0_reverse"],
                          p["bias_hh_l0_reverse"], h0[:, 1], True)
    out = jnp.concatenate([out_f, out_b], axis=-1)
    h_final = jnp.stack([hf, hb], axis=1)
    return out, h_final
