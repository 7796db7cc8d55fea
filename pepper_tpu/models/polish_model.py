"""Assembly-polishing per-position base caller (TPU-native).

Architecture parity with the reference's live polish model
(pepper/modules/python/models/simple_model.py:5-48):
  biGRU(10->128, h0 in) -> biGRU(256->128, h0 carried from encoder)
  -> Linear(256 -> 5) per position; hidden returned for window carry.

The reference slides a 100-wide window with stride 50 across a 1000-length
image, carrying the hidden state and vote-averaging overlaps
(pepper/modules/python/models/predict_distributed_cpu.py:43-97). On TPU the
same network is one `lax.scan` over the full sequence; polish_forward keeps
the reference's (x, hidden) -> (logits, hidden) contract so both schemes
(full-scan fast path, faithful window-voting) are expressible.
"""
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from pepper_tpu.models.rnn import (gru, init_linear_params, init_rnn_params,
                                   linear)
from pepper_tpu.options import PolishImageOptions, PolishTrainOptions

Params = Dict


def init_polish_params(key,
                       image_features: int = PolishImageOptions.IMAGE_HEIGHT,
                       hidden: int = PolishTrainOptions.HIDDEN_SIZE,
                       num_classes: int = PolishImageOptions.TOTAL_LABELS) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gru_encoder": init_rnn_params(k1, image_features, hidden, gates=3),
        "gru_decoder": init_rnn_params(k2, 2 * hidden, hidden, gates=3),
        "dense1": init_linear_params(k3, 2 * hidden, num_classes),
    }


def init_hidden(batch_size: int, hidden: int = PolishTrainOptions.HIDDEN_SIZE,
                dtype=jnp.float32) -> jnp.ndarray:
    """[B, 2, H] — the reference's batch-major hidden layout."""
    return jnp.zeros((batch_size, 2, hidden), dtype)


def polish_forward(params: Params, x: jnp.ndarray, hidden: jnp.ndarray,
                   fused_rnn: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B,T,F]; hidden: [B,2,H]. Returns (logits [B,T,C], hidden [B,2,H]).

    Encoder consumes the incoming hidden; its final hidden seeds the decoder
    (hidden_out -> decoder h0), and the decoder's final hidden is returned —
    exactly the reference's forward (simple_model.py:27-42).

    fused_rnn=True routes both biGRU layers through the Pallas fused
    kernel (ops/fused_gru.py, TPU only); numerics match rnn.gru.
    """
    if fused_rnn:
        from pepper_tpu.ops.fused_gru import fused_bigru
        enc_out, enc_hidden = fused_bigru(params["gru_encoder"], x, hidden)
        dec_out, dec_hidden = fused_bigru(params["gru_decoder"], enc_out,
                                          enc_hidden)
    else:
        enc_out, enc_hidden = gru(params["gru_encoder"], x, hidden)
        dec_out, dec_hidden = gru(params["gru_decoder"], enc_out, enc_hidden)
    logits = linear(params["dense1"], dec_out)
    return logits, dec_hidden
