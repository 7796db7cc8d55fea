"""Persistent XLA compilation cache configuration.

This is the TPU analog of the reference's cached ONNX export
(pepper_variant/modules/python/models/predict_distributed_cpu.py:177-186):
the reference serialized the model once so later caller processes skip the
export; here the compiled XLA executable is persisted so later processes
skip the ~20-40s TPU compile. Every jitted entry point (inference, train,
consensus) calls `enable_persistent_cache()` before first compilation.

The cache directory resolves, in order: the PEPPER_TPU_CACHE_DIR env var, a
caller-supplied path, then ~/.cache/pepper_tpu/xla. Set
PEPPER_TPU_CACHE_DIR=0 (or "off") to disable.
"""
import os
import sys
from typing import Optional

_configured = False


def enable_persistent_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Configure jax's persistent compilation cache once per process.

    Returns the cache directory in use, or None when disabled/unavailable."""
    global _configured
    env = os.environ.get("PEPPER_TPU_CACHE_DIR")
    if env is not None and env.lower() in ("0", "off", "none", ""):
        return None
    path = env or cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "pepper_tpu", "xla")
    if _configured:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every compile worth having: the models here are small, so
        # the default 1s floor would skip exactly the kernels we rerun most
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _configured = True
        return path
    except Exception as exc:  # cache is an optimization, never a hard fail
        sys.stderr.write(f"[pepper_tpu] persistent compile cache disabled: "
                         f"{exc}\n")
        return None
