"""Legacy polish Seq2Seq-attention model (CNN encoder + GRU + Luong attention).

Port of the reference's alternate consensus architecture
(pepper/modules/python/models/Seq2Seq_atn.py:14-135 and resnet.py:5-94):
`EncoderCRNN` = custom mini-resnet over the [B,1,T,W] pileup image followed by
a multi-layer bidirectional GRU whose directions are SUMMED (not concatenated,
Seq2Seq_atn.py:82-85); `AttnDecoderRNN` = one-step GRU over a position one-hot
(input size == seq_len, Seq2Seq_atn.py:107) + Luong dot attention over the
encoder context (Seq2Seq_atn.py:28-46) + linear class head.

Reference quirks preserved deliberately (they shape the checkpoint format):
- `BasicBlock.__init__` receives a downsample module but never assigns it, so
  the residual add is always identity and the block carries only
  conv1/bn1/conv2/bn2 parameters (resnet.py:26-46).
- The decoder defines an embedding table and a dropout layer that its forward
  never touches (Seq2Seq_atn.py:103-105); the embedding parameters are kept in
  the tree so reference checkpoints round-trip byte-complete.
- BatchNorm eps differs between the stem convs (1e-3, resnet.py:15) and the
  residual block (torch default 1e-5).

All parameter names/shapes mirror the torch modules 1:1 so reference
checkpoints import via models/checkpoint.py with no remapping. Inference-mode
semantics (BN running stats, no dropout) — the live polish model is
models/polish_model.py; this alternate exists for checkpoint/API parity.
"""
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from pepper_tpu.models.rnn import (_gru_scan, init_linear_params,
                                   init_rnn_params, linear)

Params = Dict


# ------------------------------------------------------------------ helpers
def reverse_onehot(one_hot_vector: jnp.ndarray) -> jnp.ndarray:
    """0 -> 1, nonzero -> 0 (Seq2Seq_atn.py:7-11)."""
    return jnp.where(one_hot_vector == 0, 1, 0).astype(one_hot_vector.dtype)


def _conv2d(x, w, stride=(1, 1), padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _batchnorm(p: Params, x, eps: float):
    """Inference-mode BatchNorm2d over the channel axis of NCHW."""
    shape = (1, -1, 1, 1)
    inv = jax.lax.rsqrt(p["running_var"].reshape(shape) + eps)
    return ((x - p["running_mean"].reshape(shape)) * inv
            * p["weight"].reshape(shape) + p["bias"].reshape(shape))


def _basic_conv(p: Params, x, stride):
    """BasicConv2d: conv -> BN(eps=1e-3) -> relu (resnet.py:10-20)."""
    x = _conv2d(x, p["conv"]["weight"], stride=stride)
    return jax.nn.relu(_batchnorm(p["bn"], x, 1e-3))


def _basic_block(p: Params, x):
    """Residual block; identity skip only (downsample quirk, resnet.py:35-46)."""
    out = _conv2d(x, p["conv1"]["weight"], padding=[(1, 1), (1, 1)])
    out = jax.nn.relu(_batchnorm(p["bn1"], out, 1e-5))
    out = _conv2d(out, p["conv2"]["weight"], padding=[(1, 1), (1, 1)])
    out = _batchnorm(p["bn2"], out, 1e-5)
    return jax.nn.relu(out + x)


def _resnet_forward(p: Params, x):
    """resnet18_custom: (1,4)-stride stem -> 1x1 conv -> one block."""
    x = _basic_conv(p["Context_Conv2d_0a"], x, stride=(1, 4))
    x = _basic_conv(p["Context_Conv2d_1a"], x, stride=(1, 1))
    return _basic_block(p["layer1"]["0"], x)


# -------------------------------------------------------- multi-layer biGRU
def _gru_stack(p: Params, x, h0_torch, num_layers: int):
    """Multi-layer bidirectional GRU, torch layouts.

    x: [B,T,F]; h0_torch: [L*2, B, H] (layer-major, fwd before bwd).
    Returns (out [B,T,2H], h_final [L*2, B, H]).
    """
    out = x
    finals = []
    for layer in range(num_layers):
        sfx = f"_l{layer}"
        xf = out @ p[f"weight_ih{sfx}"].T + p[f"bias_ih{sfx}"]
        hf, of = _gru_scan(xf, p[f"weight_hh{sfx}"], p[f"bias_hh{sfx}"],
                           h0_torch[2 * layer], False)
        xb = out @ p[f"weight_ih{sfx}_reverse"].T + p[f"bias_ih{sfx}_reverse"]
        hb, ob = _gru_scan(xb, p[f"weight_hh{sfx}_reverse"],
                           p[f"bias_hh{sfx}_reverse"],
                           h0_torch[2 * layer + 1], True)
        out = jnp.concatenate([of, ob], axis=-1)
        finals += [hf, hb]
    return out, jnp.stack(finals, axis=0)


def _init_gru_stack(key, input_size, hidden_size, num_layers) -> Params:
    p = {}
    for layer in range(num_layers):
        in_sz = input_size if layer == 0 else 2 * hidden_size
        lp = init_rnn_params(jax.random.fold_in(key, layer), in_sz,
                             hidden_size, gates=3, bidirectional=True)
        for name, v in lp.items():
            p[name.replace("_l0", f"_l{layer}")] = v
    return p


# ---------------------------------------------------------------- attention
def attention_forward(p: Params, output, context):
    """Luong dot attention (Seq2Seq_atn.py:28-46).

    output: [B,O,H] decoder states; context: [B,T,H] encoder states.
    Returns (attended [B,O,H], attn [B,O,T])."""
    attn = jax.nn.softmax(output @ jnp.swapaxes(context, 1, 2), axis=-1)
    mix = attn @ context
    combined = jnp.concatenate([mix, output], axis=-1)
    return jnp.tanh(linear(p["linear_out"], combined)), attn


# ------------------------------------------------------------------ encoder
def init_encoder_params(key, image_channels: int = 1, gru_layers: int = 3,
                        hidden_size: int = 128) -> Params:
    """EncoderCRNN parameters (torch names; Seq2Seq_atn.py:62-70)."""
    del image_channels  # the custom resnet is hardwired to 1 channel
    ks = jax.random.split(key, 8)

    def conv_w(k, shape):
        fan_out = shape[0] * shape[2] * shape[3]
        return jax.random.normal(k, shape) * math.sqrt(2.0 / fan_out)

    def bn():
        return {"weight": jnp.ones((1,)), "bias": jnp.zeros((1,)),
                "running_mean": jnp.zeros((1,)),
                "running_var": jnp.ones((1,))}

    cnn = {
        "Context_Conv2d_0a": {"conv": {"weight": conv_w(ks[0], (1, 1, 1, 4))},
                              "bn": bn()},
        "Context_Conv2d_1a": {"conv": {"weight": conv_w(ks[1], (1, 1, 1, 1))},
                              "bn": bn()},
        "layer1": {"0": {"conv1": {"weight": conv_w(ks[2], (1, 1, 3, 3))},
                         "bn1": bn(),
                         "conv2": {"weight": conv_w(ks[3], (1, 1, 3, 3))},
                         "bn2": bn()}},
    }
    return {"cnn_encoder": {"cnn": cnn},
            "gru": _init_gru_stack(ks[4], 5, hidden_size, gru_layers)}


def encoder_forward(p: Params, x, hidden, gru_layers: int = 3
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EncoderCRNN.forward (Seq2Seq_atn.py:72-89).

    x: [B,1,T,W] image; hidden: [B, 2*L, H] (the reference's transposed
    batch-first hidden). Returns (context [B,T,H], hidden [B,2*L,H]) — the
    bidirectional outputs are summed across directions."""
    h_torch = jnp.swapaxes(hidden, 0, 1)
    feats = _resnet_forward(p["cnn_encoder"]["cnn"], x)
    B, _, T = feats.shape[:3]
    feats = feats.transpose(0, 2, 1, 3).reshape(B, T, -1)
    out, h_final = _gru_stack(p["gru"], feats, h_torch, gru_layers)
    H = out.shape[-1] // 2
    out = out.reshape(B, T, 2, H).sum(axis=2)
    return out, jnp.swapaxes(h_final, 0, 1)


def encoder_init_hidden(batch_size: int, num_layers: int = 3,
                        num_directions: int = 2, hidden_size: int = 128):
    return jnp.zeros((batch_size, num_directions * num_layers, hidden_size))


# ------------------------------------------------------------------ decoder
def init_decoder_params(key, hidden_size: int, gru_layers: int,
                        num_classes: int, seq_len: int) -> Params:
    """AttnDecoderRNN parameters (Seq2Seq_atn.py:96-110); the embedding table
    is unused by forward but kept for checkpoint parity."""
    ks = jax.random.split(key, 4)
    return {
        "embedding": {"weight": jax.random.normal(
            ks[0], (num_classes, hidden_size))},
        "attention": {"linear_out": init_linear_params(
            ks[1], 2 * hidden_size, hidden_size)},
        "gru": _init_gru_stack(ks[2], seq_len, hidden_size, gru_layers),
        "out": init_linear_params(ks[3], hidden_size, num_classes),
    }


def decoder_forward(p: Params, attention_index_onehot, context_vector,
                    encoder_hidden, gru_layers: int = 3):
    """AttnDecoderRNN.forward (Seq2Seq_atn.py:112-135).

    attention_index_onehot: [B, seq_len] position one-hot (the decoder GRU's
    input size is seq_len); context_vector: [B,T,H]; encoder_hidden:
    [B, 2*L, H]. Returns (class_logits [B,C], hidden [B,2*L,H], attn [B,1,T]).
    """
    h_torch = jnp.swapaxes(encoder_hidden, 0, 1)
    x = attention_index_onehot[:, None, :]  # [B,1,seq_len]
    out, h_final = _gru_stack(p["gru"], x, h_torch, gru_layers)
    B, O = out.shape[:2]
    H = out.shape[-1] // 2
    out = out.reshape(B, O, 2, H).sum(axis=2)
    attended, attn = attention_forward(p["attention"], out, context_vector)
    logits = linear(p["out"], attended.reshape(-1, H))
    return logits, jnp.swapaxes(h_final, 0, 1), attn
