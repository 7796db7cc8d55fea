"""Model checkpoints: native .npz save/load + lossless torch import.

The reference stores checkpoints as torch pickles holding
{'model_state_dict', 'model_optimizer', 'hidden_size', 'gru_layers', 'epochs'}
(pepper_variant/modules/python/models/ModelHander.py:5-59). Our native format
is a flat .npz (key = '/'.join(path)) plus a JSON meta blob — no pickle, safe
to load, and framework-neutral. `load_torch_checkpoint` imports a reference
.pkl directly: param names were chosen to match the torch modules 1:1, so
conversion is a key split, including the 'module.' DataParallel prefix strip
(ModelHander.py:35-39).
"""
import json
from typing import Any, Dict, Tuple

import numpy as np

Meta = Dict[str, Any]


def _flatten(tree: Dict, prefix=()) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(path: str, params: Dict, meta: Meta = None,
                    opt_state=None) -> None:
    """Params (+ optional optimizer state) to one flat .npz.

    The optimizer state plays the reference's 'model_optimizer' role
    (ModelHander.save_model, ModelHander.py:5-16): saved per checkpoint so
    --retrain_model_path resumes Adam moments instead of restarting them.
    It is stored as ordered leaves ('__opt__/<i>'); restore rebuilds the
    tree structure from a freshly-initialized state of the same optimizer."""
    flat = _flatten(params)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    if opt_state is not None:
        import jax
        leaves = jax.tree_util.tree_leaves(opt_state)
        for i, leaf in enumerate(leaves):
            flat[f"__opt__/{i}"] = np.asarray(leaf)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def load_checkpoint(path: str) -> Tuple[Dict, Meta]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files
                if k != "__meta__" and not k.startswith("__opt__/")}
        meta = (json.loads(bytes(z["__meta__"]).decode())
                if "__meta__" in z.files else {})
    return _unflatten(flat), meta


def load_opt_state(path: str, template):
    """Restore optimizer state saved by save_checkpoint into `template`'s
    tree structure (a freshly-built optimizer.init(params) state).
    Returns None when the checkpoint carries no optimizer state."""
    import jax
    with np.load(path) as z:
        keys = sorted((k for k in z.files if k.startswith("__opt__/")),
                      key=lambda k: int(k.split("/")[1]))
        if not keys:
            return None
        leaves = [z[k] for k in keys]
    treedef = jax.tree_util.tree_structure(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"optimizer state mismatch: checkpoint has {len(leaves)} leaves,"
            f" optimizer expects {treedef.num_leaves} (different optimizer?)")
    template_leaves = jax.tree_util.tree_leaves(template)
    leaves = [np.asarray(saved, dtype=np.asarray(t).dtype).reshape(
        np.asarray(t).shape) for saved, t in zip(leaves, template_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def from_torch_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """torch state_dict -> our nested param tree (numpy).

    Accepts tensors or arrays; strips the DataParallel 'module.' prefix."""
    flat = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        arr = np.asarray(value.detach().cpu().numpy()
                         if hasattr(value, "detach") else value,
                         dtype=np.float32)
        flat[key.replace(".", "/")] = arr
    return _unflatten(flat)


def load_torch_checkpoint(path: str) -> Tuple[Dict, Meta]:
    """Import a reference torch .pkl checkpoint (requires torch)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state_dict", ckpt)
    meta = {k: v for k, v in ckpt.items()
            if k in ("hidden_size", "gru_layers", "epochs", "num_classes")}
    return from_torch_state_dict(state), meta
