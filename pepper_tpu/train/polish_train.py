"""Polish-model training — windowed GRU with hidden carry, data-parallel.

Parity: pepper/modules/python/models/train_distributed.py — per 100-wide
window: forward with carried hidden, mean CrossEntropy over positions
(CLASS_WEIGHTS all 1.0), one optimizer step per window, hidden detached
between windows. The reference's live DDP (gloo + mp.spawn) becomes a
jitted step over a sharded batch axis (XLA inserts the gradient psum).
"""
import os
import sys
import time
from datetime import datetime
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pepper_tpu.models.checkpoint import save_checkpoint
from pepper_tpu.models.polish_model import init_hidden, init_polish_params, polish_forward
from pepper_tpu.options import PolishImageOptions, PolishTrainOptions
from pepper_tpu.parallel.mesh import data_mesh, replicate, shard_batch
from pepper_tpu.polish.datastore import PolishImageStore, polish_image_files
from pepper_tpu.train.variant_train import make_optimizer


def _log(msg: str) -> None:
    sys.stderr.write("[" + datetime.now().strftime("%m-%d-%Y %H:%M:%S")
                     + "] INFO: " + msg + "\n")
    sys.stderr.flush()


def load_polish_training_data(image_dir: str):
    images, labels = [], []
    for path in polish_image_files(image_dir):
        with PolishImageStore(path, "r") as store:
            for name in store.summary_names():
                s = store.read_summary(name)
                images.append(s["image"])
                labels.append(s["label"])
    if not images:
        return None, None
    return (np.stack(images).astype(np.float32),
            np.stack(labels).astype(np.int32))


def cross_entropy_mean(logits, labels):
    """nn.CrossEntropyLoss(weight=ones) == plain mean CE."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)
    return -jnp.mean(picked)


def make_polish_train_step(optimizer):
    def loss_fn(params, chunk, label_chunk, hidden):
        logits, hidden_out = polish_forward(params, chunk, hidden)
        return cross_entropy_mean(logits, label_chunk), hidden_out

    @jax.jit
    def step(params, opt_state, chunk, label_chunk, hidden):
        (loss, hidden_out), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, chunk, label_chunk, hidden)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, jax.lax.stop_gradient(hidden_out), loss

    return step


@jax.jit
def _eval_window_logits(params, chunk, hidden):
    return polish_forward(params, chunk, hidden)


def polish_accuracy(params, images: np.ndarray, labels: np.ndarray,
                    batch_size: int = 64):
    """Windowed eval accuracy (reference test.py semantics)."""
    window = PolishTrainOptions.TRAIN_WINDOW
    jump = PolishTrainOptions.WINDOW_JUMP
    seq_len = PolishImageOptions.SEQ_LENGTH
    correct, total = 0, 0
    cm = np.zeros((PolishImageOptions.TOTAL_LABELS,
                   PolishImageOptions.TOTAL_LABELS), np.int64)
    for lo in range(0, len(images), batch_size):
        x = jnp.asarray(images[lo:lo + batch_size])
        y = labels[lo:lo + batch_size]
        hidden = init_hidden(x.shape[0])
        for i in range(0, seq_len, jump):
            if i + window > seq_len:
                break
            logits, hidden = _eval_window_logits(params, x[:, i:i + window],
                                                 hidden)
            pred = np.asarray(jnp.argmax(logits, -1))
            want = y[:, i:i + window]
            correct += int((pred == want).sum())
            total += pred.size
            for t, p in zip(want.reshape(-1), pred.reshape(-1)):
                cm[t, p] += 1
    return cm, 100.0 * correct / max(1, total)


def train_polish(train_image_dir: str, test_image_dir: str, model_dir: str,
                 batch_size: int = 64, epoch_limit: int = 10,
                 lr: float = 1e-4, weight_decay: float = 1e-6,
                 retrain_model_path: Optional[str] = None, seed: int = 0,
                 mesh=None) -> str:
    from pepper_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    os.makedirs(model_dir, exist_ok=True)
    images, labels = load_polish_training_data(train_image_dir)
    if images is None:
        raise ValueError("no labeled polish images found")
    test_images, test_labels = load_polish_training_data(test_image_dir)
    _log(f"TRAIN SEQUENCES: {len(images)}")

    mesh = mesh or data_mesh()
    if retrain_model_path:
        from pepper_tpu.runtime.inference import _load_model_params
        params = jax.tree_util.tree_map(
            jnp.asarray, _load_model_params(retrain_model_path))
    else:
        params = init_polish_params(jax.random.PRNGKey(seed))
    params = replicate(mesh, params)
    optimizer = make_optimizer(weight_decay)
    opt_state = optimizer.init(params)
    if retrain_model_path and retrain_model_path.endswith(".npz"):
        from pepper_tpu.models.checkpoint import load_opt_state
        restored = load_opt_state(retrain_model_path, opt_state)
        if restored is not None:
            opt_state = restored
            _log("OPTIMIZER STATE RESTORED")
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
    step_fn = make_polish_train_step(optimizer)

    # run-stamped stats artifacts (reference pepper/.../train_distributed.py)
    stats_dir = os.path.join(model_dir,
                             "stats_" + time.strftime("%m%d%Y_%H%M%S"))
    os.makedirs(stats_dir, exist_ok=True)
    train_loss_csv = open(os.path.join(stats_dir, "train_loss.csv"), "w")
    test_loss_csv = open(os.path.join(stats_dir, "test_loss.csv"), "w")
    cm_path = os.path.join(stats_dir, "confusion_matrix.txt")

    window = PolishTrainOptions.TRAIN_WINDOW
    jump = PolishTrainOptions.WINDOW_JUMP
    seq_len = PolishImageOptions.SEQ_LENGTH
    rng = np.random.RandomState(seed)
    best_accuracy, best_path = -1.0, os.path.join(model_dir,
                                                  "PEPPER_POLISH_BEST.npz")
    t0 = time.time()
    for epoch in range(epoch_limit):
        order = rng.permutation(len(images))
        total_loss, total_windows = 0.0, 0
        for lo in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[lo:lo + batch_size]
            x = shard_batch(mesh, jnp.asarray(images[idx]))
            y = shard_batch(mesh, jnp.asarray(labels[idx]))
            hidden = shard_batch(mesh, init_hidden(batch_size))
            for i in range(0, seq_len, jump):
                if i + window > seq_len:
                    break
                params, opt_state, hidden, loss = step_fn(
                    params, opt_state, x[:, i:i + window],
                    y[:, i:i + window], hidden)
                total_loss += float(loss)
                total_windows += 1
        host_params = jax.tree_util.tree_map(np.asarray, params)
        host_opt = jax.tree_util.tree_map(np.asarray, opt_state)
        epoch_loss = total_loss / max(1, total_windows)
        train_loss_csv.write(f"{epoch + 1},{epoch_loss}\n")
        if test_images is not None:
            cm, accuracy = polish_accuracy(params, test_images, test_labels)
            _log(f"EPOCH {epoch + 1} LOSS {epoch_loss:.4f} "
                 f"ACCURACY {accuracy:.3f}")
            test_loss_csv.write(f"{epoch + 1},{epoch_loss},{accuracy}\n")
            with open(cm_path, "w") as fh:
                fh.write(f"epoch {epoch + 1} accuracy {accuracy:.4f}\n")
                fh.write(np.array2string(np.asarray(cm)) + "\n")
            save_checkpoint(
                os.path.join(model_dir, f"PEPPER_POLISH_EPOCH_{epoch + 1}.npz"),
                host_params, {"epochs": epoch + 1, "accuracy": accuracy},
                opt_state=host_opt)
            if accuracy > best_accuracy:
                best_accuracy = accuracy
                save_checkpoint(best_path, host_params,
                                {"epochs": epoch + 1, "accuracy": accuracy},
                                opt_state=host_opt)
        else:
            save_checkpoint(best_path, host_params, {"epochs": epoch + 1},
                            opt_state=host_opt)
    train_loss_csv.close()
    test_loss_csv.close()
    _log(f"POLISH TRAINING COMPLETE [{time.time() - t0:.1f}s] "
         f"BEST ACCURACY: {best_accuracy:.3f} STATS: {stats_dir}")
    return best_path
