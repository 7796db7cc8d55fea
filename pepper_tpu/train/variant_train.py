"""Variant-model training — data-parallel over the device mesh.

Parity source: pepper_variant/modules/python/models/train_distributed.py
(Adam lr=1e-4 + L2 weight decay 1e-6, CrossEntropyLoss(reduction='sum') on
the 3-class type head, ReduceLROnPlateau('max', patience=2,
min_lr=0.75*lr), step-based eval + checkpoint cycle, confusion-matrix eval)
— re-expressed TPU-first: one jitted train step over a sharded batch axis
(XLA inserts the gradient psum), instead of DataParallel/DDP process
replicas.
"""
import os
import sys
import time
from dataclasses import dataclass
from datetime import datetime
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pepper_tpu.models.checkpoint import load_opt_state, save_checkpoint
from pepper_tpu.models.variant_model import init_variant_params, variant_forward
from pepper_tpu.options import ImageOptions
from pepper_tpu.parallel.mesh import data_mesh, replicate, shard_batch
from pepper_tpu.runtime.inference import load_all_summaries


def _log(msg: str) -> None:
    sys.stderr.write("[" + datetime.now().strftime("%m-%d-%Y %H:%M:%S")
                     + "] INFO: " + msg + "\n")
    sys.stderr.flush()


def cross_entropy_sum(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """CrossEntropyLoss(weight=[1,1,1], reduction='sum') parity."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def make_optimizer(weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay): L2 added to the gradient BEFORE
    the Adam moment update — optax.add_decayed_weights first, then adam."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(learning_rate),
        ))(learning_rate=1e-4)


def make_train_step(optimizer: optax.GradientTransformation,
                    fused_rnn: Optional[bool] = None):
    """fused_rnn: pass fused_rnn_for_mesh(mesh) when the step runs on an
    explicit mesh — the auto decision reads the default backend, which may
    not be the mesh's platform (see variant_model.fused_rnn_for_mesh)."""
    def loss_fn(params, images, labels, rng):
        logits = variant_forward(params, images, train_mode=True,
                                 dropout_rng=rng, fused_rnn=fused_rnn)
        return cross_entropy_sum(logits, labels)

    @jax.jit
    def step(params, opt_state, images, labels, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


@jax.jit
def _eval_probs(params, images):
    return variant_forward(params, images, train_mode=False)


def confusion_and_accuracy(params, images: np.ndarray, labels: np.ndarray,
                           batch_size: int = 512) -> Tuple[np.ndarray, float]:
    """torchnet ConfusionMeter parity (test.py:35-108): 3x3 matrix,
    accuracy = 100 * trace / sum."""
    n_cls = ImageOptions.TOTAL_TYPE_LABELS
    cm = np.zeros((n_cls, n_cls), dtype=np.int64)
    for lo in range(0, len(images), batch_size):
        x = images[lo:lo + batch_size].astype(np.float32)
        pred = np.argmax(np.asarray(_eval_probs(params, jnp.asarray(x))), -1)
        for t, p in zip(labels[lo:lo + batch_size], pred):
            cm[t, p] += 1
    total = cm.sum()
    accuracy = 100.0 * np.trace(cm) / max(1, total)
    return cm, float(accuracy)


class ReduceLROnPlateau:
    """torch ReduceLROnPlateau('max', patience=2, factor=0.1, min_lr) parity."""

    def __init__(self, lr: float, patience: int = 2, factor: float = 0.1,
                 min_lr: float = 0.0):
        self.lr = lr
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.best = -float("inf")
        self.bad_steps = 0

    def step(self, metric: float) -> float:
        if metric > self.best:
            self.best = metric
            self.bad_steps = 0
        else:
            self.bad_steps += 1
            if self.bad_steps > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_steps = 0
        return self.lr


def train(train_image_dir: str, test_image_dir: str, model_dir: str,
          batch_size: int = 64, epoch_limit: int = 10, step_size: int = 100,
          lr: float = 1e-4, weight_decay: float = 1e-6,
          retrain_model_path: Optional[str] = None, seed: int = 0,
          mesh=None, buffer_bytes: int = 512 << 20) -> str:
    """Train loop (train_distributed.py:47-243). Returns best model path.

    Training data streams through a bounded shuffle buffer (train/
    dataloader.py) — RSS stays within ~buffer_bytes however large the
    image set is; datasets that fit the buffer take the eager path with
    loss trajectories identical to the old full-RAM load."""
    from pepper_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from pepper_tpu.train.dataloader import ShuffleBufferLoader
    os.makedirs(model_dir, exist_ok=True)
    loader = ShuffleBufferLoader(train_image_dir, batch_size,
                                 buffer_bytes=buffer_bytes, train_mode=True)
    if not loader.n_examples:
        raise ValueError("training requires labeled images (make_train_images)")
    test_data = load_all_summaries(test_image_dir, train_mode=True)
    if test_data is not None and "type_label" not in test_data:
        test_data = None
    _log(f"TRAIN EXAMPLES: {loader.n_examples}  TEST: "
         f"{0 if test_data is None else len(test_data['images'])}"
         + ("" if loader.eager_arrays() is not None else
            f"  (streaming shuffle buffer: {loader.buffer_examples} examples)"))

    mesh = mesh or data_mesh()
    key = jax.random.PRNGKey(seed)
    start_epoch = 0
    if retrain_model_path:
        from pepper_tpu.models.checkpoint import load_checkpoint
        from pepper_tpu.runtime.inference import _load_model_params
        params = jax.tree_util.tree_map(jnp.asarray,
                                        _load_model_params(retrain_model_path))
        if retrain_model_path.endswith(".npz"):
            _, prev_meta = load_checkpoint(retrain_model_path)
            start_epoch = int(prev_meta.get("epochs", 0))
        _log(f"RETRAIN MODEL LOADED: {retrain_model_path}")
    else:
        key, pkey = jax.random.split(key)
        # window/feature geometry inferred from the data, so HP images
        # ([B,21,48]) and base images ([B,33,26]) both train unchanged
        window, features = loader.example_shape
        params = init_variant_params(pkey, image_features=features,
                                     window=window)
    params = replicate(mesh, params)

    optimizer = make_optimizer(weight_decay)
    opt_state = optimizer.init(params)
    if retrain_model_path and retrain_model_path.endswith(".npz"):
        # resume Adam moments + step count (reference restores
        # 'model_optimizer', ModelHander.py:17-59)
        restored = load_opt_state(retrain_model_path, opt_state)
        if restored is not None:
            opt_state = restored
            _log("OPTIMIZER STATE RESTORED")
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
    from pepper_tpu.models.variant_model import fused_rnn_for_mesh
    step_fn = make_train_step(optimizer, fused_rnn=fused_rnn_for_mesh(mesh))
    scheduler = ReduceLROnPlateau(lr, patience=2, min_lr=0.75 * lr)

    # run-stamped stats artifacts (reference train_distributed.py:49-51)
    stats_dir = os.path.join(model_dir,
                             "stats_" + time.strftime("%m%d%Y_%H%M%S"))
    os.makedirs(stats_dir, exist_ok=True)
    train_loss_csv = open(os.path.join(stats_dir, "train_loss.csv"), "w")
    test_loss_csv = open(os.path.join(stats_dir, "test_loss.csv"), "w")
    cm_path = os.path.join(stats_dir, "confusion_matrix.txt")

    rng = np.random.RandomState(seed)
    step_no = 0
    best_accuracy = -1.0
    best_path = os.path.join(model_dir, "PEPPER_VARIANT_BEST.npz")
    n_steps_per_epoch = max(1, loader.n_examples // batch_size)
    total_steps = epoch_limit * min(step_size, n_steps_per_epoch)
    epoch = start_epoch
    t0 = time.time()
    while step_no < total_steps:
        for bx, by in loader.epoch_batches(rng):
            x = shard_batch(mesh, jnp.asarray(bx.astype(np.float32)))
            y = shard_batch(mesh, jnp.asarray(by))
            key, dkey = jax.random.split(key)
            params, opt_state, loss = step_fn(params, opt_state, x, y, dkey)
            step_no += 1
            train_loss_csv.write(f"{epoch},{step_no},{float(loss)}\n")
            if step_no % step_size == 0 or step_no >= total_steps:
                if test_data is not None:
                    cm, accuracy = confusion_and_accuracy(
                        params, test_data["images"],
                        test_data["type_label"].astype(np.int64))
                    new_lr = scheduler.step(accuracy)
                    opt_state.hyperparams["learning_rate"] = jnp.asarray(new_lr)
                    _log(f"STEP {step_no} LOSS {float(loss):.3f} "
                         f"ACCURACY {accuracy:.3f} LR {new_lr:.2e}")
                    test_loss_csv.write(
                        f"{epoch},{step_no},{float(loss)},{accuracy}\n")
                    with open(cm_path, "w") as fh:  # latest eval's matrix
                        fh.write(f"step {step_no} accuracy {accuracy:.4f}\n")
                        fh.write(np.array2string(cm) + "\n")
                    ckpt_path = os.path.join(
                        model_dir, f"PEPPER_VARIANT_STEP_{step_no}.npz")
                    host_params = jax.tree_util.tree_map(np.asarray, params)
                    host_opt = jax.tree_util.tree_map(np.asarray, opt_state)
                    save_checkpoint(ckpt_path, host_params,
                                    {"epochs": epoch, "step": step_no,
                                     "accuracy": accuracy},
                                    opt_state=host_opt)
                    if accuracy > best_accuracy:
                        best_accuracy = accuracy
                        save_checkpoint(best_path, host_params,
                                        {"epochs": epoch, "step": step_no,
                                         "accuracy": accuracy},
                                        opt_state=host_opt)
            if step_no >= total_steps:
                break
        epoch += 1
    train_loss_csv.close()
    test_loss_csv.close()
    _log(f"TRAINING COMPLETE [{time.time() - t0:.1f}s] "
         f"BEST ACCURACY: {best_accuracy:.3f} STATS: {stats_dir}")
    return best_path
