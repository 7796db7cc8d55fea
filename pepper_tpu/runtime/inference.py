"""Stage 2 — batched device inference over candidate images.

Replaces the reference's ONNX-export + per-process onnxruntime scheme
(pepper_variant/modules/python/models/predict_distributed_cpu.py): here the
jitted forward IS the compiled artifact (XLA persistent compilation cache
plays the role of the cached .onnx), batches are fixed-shape (pad the tail)
so one compilation serves the whole run, and data parallelism is a sharded
batch axis over the device mesh instead of process replicas.

The '--dry' oracle backend reproduces predict_distributed_cpu_fake.py:
labeled images' type labels are emitted as one-hot predictions, exercising
the image->prediction->candidate->VCF plumbing without a model.
"""
import glob
import os
import sys
import time
from datetime import datetime
from typing import List, Optional

import numpy as np

from pepper_tpu.options import ImageOptions, PipelineConfig
from pepper_tpu.pipelines.datastore import ImageStore, PredictionStore


def _log(msg: str) -> None:
    sys.stderr.write("[" + datetime.now().strftime("%m-%d-%Y %H:%M:%S")
                     + "] INFO: " + msg + "\n")
    sys.stderr.flush()


def image_files(image_dir: str) -> List[str]:
    return sorted(glob.glob(os.path.join(image_dir, "*.hdf5"))
                  + glob.glob(os.path.join(image_dir, "*.h5")))


def load_all_summaries(image_dir, train_mode: bool = False):
    """Eager load of every summary group (reference dataloader_predict.py).

    `image_dir` may also be an explicit list of files (multi-host shards)."""
    contigs, positions, depths, candidates, freqs, images = [], [], [], [], [], []
    labels = []
    files = image_dir if isinstance(image_dir, (list, tuple)) \
        else image_files(image_dir)
    for path in files:
        with ImageStore(path, "r") as store:
            for name in store.summary_names():
                s = store.read_summary(name, train_mode=train_mode)
                contigs.extend(s["contigs"])
                positions.append(s["positions"])
                depths.append(s["depths"])
                candidates.extend(s["candidates"])
                freqs.append(s["candidate_frequency"])
                images.append(s["images"])
                if train_mode and "type_label" in s:
                    labels.append(s["type_label"])
    if not images:
        return None
    out = dict(
        contigs=contigs,
        positions=np.concatenate(positions),
        depths=np.concatenate(depths),
        candidates=candidates,
        candidate_frequency=np.concatenate(freqs),
        images=np.concatenate(images),
    )
    if labels:
        out["type_label"] = np.concatenate(labels)
    return out


def _load_model_params(model_path: str):
    from pepper_tpu.models import checkpoint as ckpt
    if model_path.endswith(".npz"):
        params, _ = ckpt.load_checkpoint(model_path)
    else:
        params, _ = ckpt.load_torch_checkpoint(model_path)
    return params


def run_inference(config: PipelineConfig, image_dir: str,
                  output_dir: str, shard_files_by_host: bool = False) -> str:
    """Run stage 2; writes pepper_predictions.hdf into output_dir.

    shard_files_by_host: stripe the image-file list across hosts — for
    standalone multi-host runs on a shared image directory. Inside
    call_variant each host already has its own per-run image dir."""
    from pepper_tpu.parallel import multihost

    multihost.initialize_from_config(config)
    os.makedirs(output_dir, exist_ok=True)
    files = image_files(image_dir)
    if shard_files_by_host and multihost.host_count() > 1:
        files = multihost.host_shard(files)
        _log(f"HOST {multihost.host_index()}/{multihost.host_count()}: "
             f"{len(files)} IMAGE FILES IN SHARD")
    data = load_all_summaries(files, train_mode=config.dry)
    out_path = os.path.join(
        output_dir, f"pepper_predictions_{multihost.host_tag()}0.hdf"
        if multihost.host_count() > 1 else "pepper_predictions.hdf")
    if data is None:
        _log("NO CANDIDATE IMAGES FOUND; EMPTY PREDICTIONS.")
        PredictionStore(out_path, "w").close()
        return out_path
    n = len(data["contigs"])
    t0 = time.time()

    if config.dry:
        if "type_label" not in data:
            raise ValueError("--dry requires labeled images (train_mode)")
        preds = np.zeros((n, ImageOptions.TOTAL_TYPE_LABELS), dtype=np.float64)
        preds[np.arange(n), data["type_label"]] = 1.0
    else:
        preds = _model_predictions(config, data["images"])

    batch_size = config.batch_size
    with PredictionStore(out_path, "w") as store:
        for b, lo in enumerate(range(0, n, batch_size)):
            hi = min(lo + batch_size, n)
            store.write_prediction(
                b, data["contigs"][lo:hi], data["positions"][lo:hi],
                data["depths"][lo:hi], data["candidates"][lo:hi],
                data["candidate_frequency"][lo:hi], preds[lo:hi])
    _log(f"INFERENCE COMPLETE: {n} CANDIDATES [{time.time() - t0:.1f}s]")
    return out_path


def _model_predictions(config: PipelineConfig, images: np.ndarray) -> np.ndarray:
    """Batched device inference. bf16 params/activations by default on
    accelerators (2.5x MXU throughput, identical argmax on this model);
    set PEPPER_TPU_PRECISION=f32 to opt out. Device batches are large and
    transfers run ahead of compute so the MXU, not PCIe/ICI, is the limit."""
    from pepper_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from pepper_tpu.models.variant_model import variant_forward
    from pepper_tpu.parallel.mesh import (data_mesh, pad_to_multiple,
                                          replicate, shard_batch)

    params = _load_model_params(config.model_path)
    n_dev = jax.local_device_count()
    batch = pad_to_multiple(max(config.batch_size, 2048), n_dev)
    use_bf16 = (os.environ.get("PEPPER_TPU_PRECISION", "bf16") != "f32"
                and jax.devices()[0].platform != "cpu")
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)
    if n_dev > 1:
        mesh = data_mesh()
        params = replicate(mesh, params)
        place = lambda x: shard_batch(mesh, jnp.asarray(x))  # noqa: E731
    else:
        place = jnp.asarray

    @jax.jit
    def fwd(p, x):
        return variant_forward(p, x.astype(dtype)).astype(jnp.float32)

    n = images.shape[0]
    out = np.zeros((n, ImageOptions.TOTAL_TYPE_LABELS), dtype=np.float64)
    # transfer int8 (the stores' native dtype — 4x less host->device
    # traffic) and cast on device; enqueue transfers ahead of compute
    images8 = images if images.dtype == np.int8 else images.astype(np.int8)
    device_batches = []
    for lo in range(0, n, batch):
        hi = min(lo + batch, n)
        x = images8[lo:hi]
        if hi - lo < batch:  # pad the tail so one compilation serves all
            x = np.concatenate(
                [x, np.zeros((batch - (hi - lo),) + x.shape[1:], np.int8)])
        device_batches.append((lo, hi, place(x)))
    results = [(lo, hi, fwd(params, x)) for lo, hi, x in device_batches]
    for lo, hi, probs in results:
        out[lo:hi] = np.asarray(probs)[: hi - lo]
    return out
