"""Polish stage 2 — consensus inference (sliding-window GRU with vote
accumulation).

Parity: pepper/modules/python/models/predict_distributed_cpu.py:19-105.
The reference slides a 100-wide window with stride 50 across each
1000-length image, carrying the GRU hidden state across windows and
averaging overlap votes through softmax + zero padding; phred comes from
the vote fraction. Here the entire window loop is traced into ONE jitted
function (the 19 windows unroll inside the XLA graph; the windowed matmuls
batch onto the MXU), replacing the reference's ONNX-per-window scheme.
"""
import os
import sys
import time
from datetime import datetime
from typing import List, Optional, Tuple

import numpy as np

from pepper_tpu.options import (PolishImageOptions, PolishTrainOptions)
from pepper_tpu.polish.datastore import (PolishImageStore,
                                         PolishPredictionStore,
                                         polish_image_files)


def _log(msg: str) -> None:
    sys.stderr.write("[" + datetime.now().strftime("%m-%d-%Y %H:%M:%S")
                     + "] INFO: " + msg + "\n")
    sys.stderr.flush()


def make_window_vote_fn(params, mesh=None):
    """Jitted (images [B,1000,10]) -> (base_labels, phred) with the
    reference's window/vote/phred semantics.

    Params are ARGUMENTS of the jitted function (closed-over device
    constants made the persistent-cache key unstable across processes),
    and the 19 overlapping windows run under one `lax.scan` (the unrolled
    graph compiled ~5x slower for identical numerics — the adds into the
    vote tensor happen in the same order).

    mesh: optional jax Mesh — params are replicated over it and the
    bf16/fused decisions follow the MESH's platform (which may differ
    from the default backend); callers shard the image batch over the
    mesh's 'data' axis (parallel.mesh.shard_batch)."""
    import jax
    import jax.numpy as jnp

    from pepper_tpu.models.polish_model import polish_forward

    seq_len = PolishImageOptions.SEQ_LENGTH
    window = PolishTrainOptions.TRAIN_WINDOW
    jump = PolishTrainOptions.WINDOW_JUMP
    overlap = PolishImageOptions.SEQ_OVERLAP
    n_labels = PolishImageOptions.TOTAL_LABELS
    hidden_size = PolishTrainOptions.HIDDEN_SIZE

    platform = (next(iter(mesh.devices.flat)).platform if mesh is not None
                else jax.devices()[0].platform)
    use_bf16 = (os.environ.get("PEPPER_TPU_PRECISION", "bf16") != "f32"
                and platform != "cpu")
    cdtype = jnp.bfloat16 if use_bf16 else jnp.float32
    cparams = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, cdtype), params)
    if mesh is not None:
        from pepper_tpu.parallel.mesh import replicate
        cparams = replicate(mesh, cparams)
    # TPU: both biGRU layers run the Pallas fused kernel per window — the
    # 100-step recurrence becomes a pipelined grid instead of a scan
    fused = (platform == "tpu"
             and os.environ.get("PEPPER_TPU_FUSED_RNN", "1") != "0")

    starts = np.arange(0, seq_len - window + 1, jump)

    def fn(p, images):
        B = images.shape[0]
        x = images.astype(cdtype)

        def step(carry, start):
            votes, hidden = carry
            chunk = jax.lax.dynamic_slice_in_dim(x, start, window, axis=1)
            logits, hidden = polish_forward(p, chunk, hidden,
                                            fused_rnn=fused)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=2)
            seg = jax.lax.dynamic_slice_in_dim(votes, start, window, axis=1)
            votes = jax.lax.dynamic_update_slice_in_dim(
                votes, seg + probs, start, axis=1)
            return (votes, hidden), None

        init = (jnp.zeros((B, seq_len, n_labels), jnp.float32),
                jnp.zeros((B, 2, hidden_size), cdtype))
        (votes, _), _ = jax.lax.scan(step, init, jnp.asarray(starts))
        base_values = jnp.max(votes, axis=2)
        base_labels = jnp.argmax(votes, axis=2)
        counts = jnp.ones((B, seq_len - 2 * overlap))
        counts = jnp.pad(counts, ((0, 0), (overlap, overlap))) + 1.0
        phred = -10.0 * jnp.log10(
            jnp.maximum(1e-10, 1.0 - base_values / counts))
        phred = jnp.minimum(phred, 100.0)
        return base_labels, phred

    jitted = jax.jit(fn)
    return lambda images: jitted(cparams, images)


def pad_consensus_batch(images: list, batch_size: int) -> np.ndarray:
    """Stack a (possibly short) list of sequence images and zero-pad to the
    fixed device batch, so one compilation serves the whole run. Shared by
    the staged reader below and the fused stream (polish/streaming.py)."""
    x = np.stack(images)
    if len(images) < batch_size:
        x = np.concatenate(
            [x, np.zeros((batch_size - len(images),) + x.shape[1:],
                         x.dtype)])
    return x


def call_consensus(image_dir: str, model_path: str, output_dir: str,
                   batch_size: int = 128) -> str:
    """Run consensus inference over all polish images; one prediction file."""
    from pepper_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, "pepper_prediction_0.hdf")

    from pepper_tpu.runtime.inference import _load_model_params
    params = jax.tree_util.tree_map(jnp.asarray, _load_model_params(model_path))
    vote_fn = make_window_vote_fn(params)

    # cheap metadata pass for the parity log line (no image data read)
    files = polish_image_files(image_dir)
    n_seqs = 0
    for path in files:
        with PolishImageStore(path, "r") as store:
            n_seqs += len(store.summary_names())
    _log(f"TOTAL SEQUENCES: {n_seqs}")
    t0 = time.time()

    with PolishPredictionStore(out_path, "w") as out:

        def submit(metas, images):
            # ship uint8 (the store's native dtype); cast on device
            x = pad_consensus_batch(images, batch_size)
            labels, _phred = vote_fn(jnp.asarray(x))
            return metas, labels

        def drain(pending):
            metas, labels = pending
            labels = np.asarray(labels)[:len(metas)]
            for meta, base_labels in zip(metas, labels):
                out.write_prediction(
                    meta["contig"], meta["region_start"], meta["region_end"],
                    meta["chunk_id"], meta["position"], meta["index"],
                    base_labels)

        # each image file is opened ONCE and one device batch stays in
        # flight: the async dispatch returns immediately, so the next
        # batch's HDF5 reads overlap the chip's compute
        pending = None
        metas, images = [], []
        for path in files:
            with PolishImageStore(path, "r") as store:
                for name in store.summary_names():
                    s = store.read_summary(name)
                    metas.append(s)
                    images.append(s["image"])
                    if len(metas) == batch_size:
                        nxt = submit(metas, images)
                        metas, images = [], []
                        if pending is not None:
                            drain(pending)
                        pending = nxt
        if metas:
            nxt = submit(metas, images)
            if pending is not None:
                drain(pending)
            pending = nxt
        if pending is not None:
            drain(pending)
    _log(f"CONSENSUS INFERENCE COMPLETE [{time.time() - t0:.1f}s]")
    return out_path
