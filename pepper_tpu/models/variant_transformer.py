"""Alternate variant classifier: residual-CNN + encoder-only transformer.

Architecture parity with the reference alternate model
(pepper_variant/modules/python/models/simple_model_transformers.py:5-97):
  reshape [B,1,T,F] -> residual conv block (1->4ch 3x3, BatchNorm, ReLU,
  broadcast residual add) -> reshape [B,T,4F] -> TransformerEncoder(d=4F,
  8 heads, 6 layers, torch defaults: dff 2048, ReLU, post-LayerNorm) ->
  flatten -> MLP 128/64/32/16/8 (ReLU+dropout) -> num_classes softmax.

Parameter names/shapes mirror the torch module so checkpoints import 1:1
through models/checkpoint.py. BatchNorm runs in inference mode (running
stats), matching eval-time behavior.
"""
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from pepper_tpu.models.rnn import init_linear_params, linear
from pepper_tpu.options import ImageOptions

Params = Dict


def _conv_init(key, out_c, in_c, k):
    fan_in = in_c * k * k
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, (out_c, in_c, k, k), minval=-bound,
                              maxval=bound, dtype=jnp.float32)


def _attn_init(key, d):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = math.sqrt(1.0 / d)
    return {
        "in_proj_weight": jax.random.uniform(k1, (3 * d, d), minval=-bound,
                                             maxval=bound),
        "in_proj_bias": jnp.zeros((3 * d,)),
        "out_proj": init_linear_params(k2, d, d),
    }


def _encoder_layer_init(key, d, dff=2048):
    ks = jax.random.split(key, 4)
    return {
        "self_attn": _attn_init(ks[0], d),
        "linear1": init_linear_params(ks[1], d, dff),
        "linear2": init_linear_params(ks[2], dff, d),
        "norm1": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "norm2": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }


def init_transformer_params(key,
                            image_features: int = ImageOptions.IMAGE_HEIGHT,
                            window: int = ImageOptions.CANDIDATE_WINDOW_SIZE + 1,
                            num_classes: int = ImageOptions.TOTAL_TYPE_LABELS,
                            out_channel: int = 4, n_layers: int = 6) -> Params:
    d = out_channel * image_features
    ks = jax.random.split(key, n_layers + 9)
    params = {
        "conv1": {"weight": _conv_init(ks[0], out_channel, 1, 3)},
        "bn1": {"weight": jnp.ones((out_channel,)),
                "bias": jnp.zeros((out_channel,)),
                "running_mean": jnp.zeros((out_channel,)),
                "running_var": jnp.ones((out_channel,))},
        "conv2": {"weight": _conv_init(ks[1], out_channel, out_channel, 3)},
        "bn2": {"weight": jnp.ones((out_channel,)),
                "bias": jnp.zeros((out_channel,)),
                "running_mean": jnp.zeros((out_channel,)),
                "running_var": jnp.ones((out_channel,))},
        "encoder": {"layers": {
            str(i): _encoder_layer_init(ks[2 + i], d) for i in range(n_layers)
        }},
        "linear_1": init_linear_params(ks[-7], d * window, 128),
        "linear_2": init_linear_params(ks[-6], 128, 64),
        "linear_3": init_linear_params(ks[-5], 64, 32),
        "linear_4": init_linear_params(ks[-4], 32, 16),
        "linear_5": init_linear_params(ks[-3], 16, 8),
        "output_layer": init_linear_params(ks[-2], 8, num_classes),
    }
    return params


def _conv2d_same(x, w):
    """x: [B,C,H,W], w: [O,C,3,3], padding 1 (torch Conv2d semantics)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _batchnorm(p, x, eps=1e-5):
    """Inference-mode BatchNorm2d over channel axis 1."""
    shape = (1, -1, 1, 1)
    return ((x - p["running_mean"].reshape(shape))
            / jnp.sqrt(p["running_var"].reshape(shape) + eps)
            * p["weight"].reshape(shape) + p["bias"].reshape(shape))


def _layernorm(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def _mha(p, x, n_heads=8):
    """torch MultiheadAttention (batch_first, self-attention, no mask)."""
    B, T, d = x.shape
    qkv = x @ p["in_proj_weight"].T + p["in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = d // n_heads

    def heads(t):
        return t.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(hd)
    attn = jax.nn.softmax(scores, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, d)
    return linear(p["out_proj"], out)


def _encoder_layer(p, x):
    """torch TransformerEncoderLayer, post-norm (norm_first=False), ReLU."""
    x = _layernorm(p["norm1"], x + _mha(p["self_attn"], x))
    ff = linear(p["linear2"], jax.nn.relu(linear(p["linear1"], x)))
    return _layernorm(p["norm2"], x + ff)


def transformer_forward(params: Params, x: jnp.ndarray,
                        train_mode: bool = False) -> jnp.ndarray:
    """x: [B, T, F] -> class probabilities (log-probs when train_mode,
    matching the reference's LogSoftmax train output)."""
    B, T, F = x.shape
    h = x[:, None]                              # [B,1,T,F]
    residual = h
    out = jax.nn.relu(_batchnorm(params["bn1"],
                                 _conv2d_same(h, params["conv1"]["weight"])))
    out = _batchnorm(params["bn2"], _conv2d_same(out,
                                                 params["conv2"]["weight"]))
    out = jax.nn.relu(out + residual)           # broadcast residual add
    # reference quirk: a raw reshape [B,C,T,F] -> [B,T,C*F] (memory
    # reinterpretation, NOT a channel-last transpose) — simple_model_transformers.py:57
    out = out.reshape(B, T, -1)
    for i in range(len(params["encoder"]["layers"])):
        out = _encoder_layer(params["encoder"]["layers"][str(i)], out)
    out = out.reshape(B, -1)
    for name in ("linear_1", "linear_2", "linear_3", "linear_4", "linear_5"):
        out = jax.nn.relu(linear(params[name], out))
    logits = linear(params["output_layer"], out)
    if train_mode:
        return jax.nn.log_softmax(logits, axis=-1)
    return jax.nn.softmax(logits, axis=-1)
