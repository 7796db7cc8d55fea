"""Variant-calling genotype classifier (TPU-native).

Architecture parity with the reference's live model
(pepper_variant/modules/python/models/simple_model.py:6-82):
  biLSTM(F->256) -> biLSTM(512->256) -> dropout .2 -> flatten [B, 33*512]
  -> 5 x (Linear 512 + SELU + dropout .2, last without dropout)
  -> Linear(512 -> 3) type head -> softmax (inference).

Functional: params are a pytree of jnp arrays whose names/shapes mirror the
torch module attributes, so reference checkpoints map 1:1
(models/checkpoint.py). Inference runs in bfloat16 on the MXU with float32
softmax; training uses float32 params with bf16 matmuls via jax defaults.
"""
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from pepper_tpu.models.rnn import (init_linear_params, init_rnn_params, linear,
                                   lstm)
from pepper_tpu.options import ImageOptions

Params = Dict


def _use_fused_rnn(train_mode: bool) -> bool:
    """The Pallas fused biLSTM (ops/fused_lstm.py) keeps the recurrent
    carry in VMEM and beats the lax.scan path ~8% at bf16 on TPU. It has
    a custom VJP (a residual-saving forward + reverse-time backward
    kernel), so training may use it too. XLA's auto-partitioner can't
    split a pallas_call over a sharded batch, so the default is
    single-device only; multi-device callers run it per-shard under
    shard_map and pass fused_rnn=True explicitly (runtime/streaming.py
    DeviceRunner). Opt out: PEPPER_TPU_FUSED_RNN=0."""
    if os.environ.get("PEPPER_TPU_FUSED_RNN", "1") == "0":
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def fused_rnn_for_mesh(mesh) -> bool:
    """Fused-kernel decision for computations placed on an explicit mesh.

    jax.default_backend() lies when the mesh devices differ from the
    default platform (e.g. the multichip dry run builds a virtual CPU mesh
    while a real 1-chip TPU is the default backend), so mesh-placed steps
    must decide from the mesh's own devices: Pallas needs TPU, and the
    auto-partitioner can't split a pallas_call over a sharded batch, so
    only a 1-device TPU mesh qualifies (multi-device TPU callers use
    shard_map and pass fused_rnn=True themselves — runtime/streaming.py)."""
    if os.environ.get("PEPPER_TPU_FUSED_RNN", "1") == "0":
        return False
    devices = list(mesh.devices.flat)
    return len(devices) == 1 and devices[0].platform == "tpu"


def init_variant_params(key, image_features: int = ImageOptions.IMAGE_HEIGHT,
                        num_classes_type: int = ImageOptions.TOTAL_TYPE_LABELS,
                        window: int = ImageOptions.CANDIDATE_WINDOW_SIZE + 1,
                        hidden: int = 256) -> Params:
    ks = jax.random.split(key, 8)
    flat = 2 * hidden * window
    return {
        "encoder": init_rnn_params(ks[0], image_features, hidden, gates=4),
        "decoder": init_rnn_params(ks[1], 2 * hidden, hidden, gates=4),
        "linear_1": init_linear_params(ks[2], flat, 512),
        "linear_2": init_linear_params(ks[3], 512, 512),
        "linear_3": init_linear_params(ks[4], 512, 512),
        "linear_4": init_linear_params(ks[5], 512, 512),
        "linear_5": init_linear_params(ks[6], 512, 512),
        "output_layer_type": init_linear_params(ks[7], 512, num_classes_type),
    }


def _dropout(x, rate, key):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def variant_forward(params: Params, x: jnp.ndarray, train_mode: bool = False,
                    dropout_rng: Optional[jax.Array] = None,
                    fused_rnn: Optional[bool] = None) -> jnp.ndarray:
    """x: [B, 33, F] float. Returns softmax probs [B,3] (or logits when
    train_mode, matching the reference's train-time contract).

    fused_rnn: None = auto (single-device TPU); True/False = explicit —
    shard_map callers pass True so the Pallas kernel runs per shard."""
    if fused_rnn is None:
        fused_rnn = _use_fused_rnn(train_mode)
    if fused_rnn:
        if train_mode:
            from pepper_tpu.ops.fused_lstm import fused_bilstm_train
            h = fused_bilstm_train(params["encoder"], x)
            h = fused_bilstm_train(params["decoder"], h)
        else:
            from pepper_tpu.ops.fused_lstm import fused_bilstm
            h = fused_bilstm(params["encoder"], x)
            h = fused_bilstm(params["decoder"], h)
    else:
        h = lstm(params["encoder"], x)
        h = lstm(params["decoder"], h)
    drop = train_mode and dropout_rng is not None
    if drop:
        keys = jax.random.split(dropout_rng, 5)
        h = _dropout(h, 0.2, keys[0])
    h = h.reshape(h.shape[0], -1)
    for i, name in enumerate(["linear_1", "linear_2", "linear_3", "linear_4"]):
        h = jax.nn.selu(linear(params[name], h))
        if drop:
            h = _dropout(h, 0.2, keys[i + 1])
    h = jax.nn.selu(linear(params["linear_5"], h))
    logits = linear(params["output_layer_type"], h)
    if train_mode:
        return logits
    return jax.nn.softmax(logits, axis=-1)
