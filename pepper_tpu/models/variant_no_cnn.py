"""Alternate variant classifier: the "no-CNN" stateful biLSTM MLP.

Architecture parity with the reference alternate
(pepper_variant/modules/python/models/simple_model_no_cnn.py:5-103):
  encoder biLSTM(F->128) consumes x with the caller's (hidden, cell) as
  initial state; its FINAL state seeds the decoder biLSTM(F->128), which
  reads x AGAIN (not the encoder outputs — a reference quirk); flatten
  decoder outputs -> MLP 256/128/64/32/16 (ReLU) -> num_classes softmax
  (log-softmax in train mode). Hidden/cell use the [B, dirs, H] layout.
Parameter names mirror the torch module for 1:1 checkpoint import.
"""
from typing import Dict

import jax
import jax.numpy as jnp

from pepper_tpu.models.rnn import (init_linear_params, init_rnn_params,
                                   linear, lstm_with_state)
from pepper_tpu.options import ImageOptions

Params = Dict


def init_no_cnn_params(key, image_features: int = ImageOptions.IMAGE_HEIGHT,
                       window: int = ImageOptions.CANDIDATE_WINDOW_SIZE + 1,
                       num_classes: int = ImageOptions.TOTAL_TYPE_LABELS,
                       hidden: int = 128) -> Params:
    ks = jax.random.split(key, 8)
    return {
        "encoder": init_rnn_params(ks[0], image_features, hidden, gates=4),
        "decoder": init_rnn_params(ks[1], image_features, hidden, gates=4),
        "linear_1": init_linear_params(ks[2], 2 * hidden * window, 256),
        "linear_2": init_linear_params(ks[3], 256, 128),
        "linear_3": init_linear_params(ks[4], 128, 64),
        "linear_4": init_linear_params(ks[5], 64, 32),
        "linear_5": init_linear_params(ks[6], 32, 16),
        "output_layer": init_linear_params(ks[7], 16, num_classes),
    }


def init_state(batch_size: int, hidden: int = 128, dtype=jnp.float32):
    return (jnp.zeros((batch_size, 2, hidden), dtype),
            jnp.zeros((batch_size, 2, hidden), dtype))


def no_cnn_forward(params: Params, x: jnp.ndarray, hidden: jnp.ndarray,
                   cell_state: jnp.ndarray,
                   train_mode: bool = False) -> jnp.ndarray:
    """x: [B,T,F]; hidden/cell: [B,2,H] -> class probabilities."""
    _, h, c = lstm_with_state(params["encoder"], x, hidden, cell_state)
    out, _, _ = lstm_with_state(params["decoder"], x, h, c)
    out = out.reshape(out.shape[0], -1)
    for name in ("linear_1", "linear_2", "linear_3", "linear_4", "linear_5"):
        out = jax.nn.relu(linear(params[name], out))
    logits = linear(params["output_layer"], out)
    if train_mode:
        return jax.nn.log_softmax(logits, axis=-1)
    return jax.nn.softmax(logits, axis=-1)
