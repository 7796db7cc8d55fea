import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is reserved for bench.
# The environment's sitecustomize registers the TPU ('axon') PJRT backend and
# pins JAX_PLATFORMS=axon, so the env var alone is not enough — force the
# platform through jax.config before any test imports jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
