"""Subprocess driver for the multi-host TRAINING proof (test_multihost.py).

Runs `steps` gradient-synced train steps over a global mesh. With
num_processes > 1 each process feeds only its contiguous block of the
global batch (the DistributedSampler analog — disjoint shards), XLA
inserts the gradient psum across hosts; with num_processes == 1 the same
global mesh size runs in one process. Identical final params across the
two modes prove the distributed training path (the training analog of the
reference's only live DDP path,
pepper/modules/python/models/train_distributed.py:253-286).

argv: rank num_processes coordinator data_dir steps out_npz
"""
import os
import sys

rank = int(sys.argv[1])
num_processes = int(sys.argv[2])
coordinator = sys.argv[3]
data_dir = sys.argv[4]
steps = int(sys.argv[5])
out_npz = sys.argv[6]

DEVICES_PER_PROCESS = 2
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + f" --xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from pepper_tpu.parallel import multihost  # noqa: E402

if num_processes > 1:
    multihost.initialize(coordinator_address=coordinator,
                         num_processes=num_processes, process_id=rank)
    assert jax.process_count() == num_processes

import jax.numpy as jnp  # noqa: E402

from pepper_tpu.models.variant_model import init_variant_params  # noqa: E402
from pepper_tpu.parallel.mesh import (data_mesh, replicate,  # noqa: E402
                                      shard_batch_from_local)
from pepper_tpu.train.variant_train import (make_optimizer,  # noqa: E402
                                            make_train_step)

images = np.load(os.path.join(data_dir, "images.npy"))
labels = np.load(os.path.join(data_dir, "labels.npy"))
n_global = len(images)
assert n_global % (DEVICES_PER_PROCESS * max(1, num_processes)) == 0

mesh = data_mesh()   # all processes' devices
assert len(jax.devices()) == DEVICES_PER_PROCESS * max(1, num_processes)

params = replicate(mesh, init_variant_params(jax.random.PRNGKey(0),
                                             hidden=32))
optimizer = make_optimizer(weight_decay=1e-6)
opt_state = optimizer.init(params)
opt_state.hyperparams["learning_rate"] = jnp.asarray(1e-3)
step_fn = make_train_step(optimizer)

losses = []
for s in range(steps):
    # deterministic global batch per step; this process feeds its block
    order = np.random.RandomState(100 + s).permutation(n_global)
    gx, gy = images[order], labels[order]
    lo = rank * n_global // max(1, num_processes)
    hi = (rank + 1) * n_global // max(1, num_processes)
    x = shard_batch_from_local(mesh, gx[lo:hi].astype(np.float32))
    y = shard_batch_from_local(mesh, gy[lo:hi].astype(np.int32))
    params, opt_state, loss = step_fn(params, opt_state, x, y,
                                      jax.random.PRNGKey(200 + s))
    losses.append(float(loss))

flat = {}


def _collect(path, leaf):
    flat["/".join(str(p) for p in path)] = np.asarray(
        leaf.addressable_data(0))


jax.tree_util.tree_map_with_path(
    lambda p, l: _collect([getattr(k, "key", getattr(k, "idx", k))
                           for k in p], l), params)
np.savez(out_npz, __losses__=np.asarray(losses), **flat)
print("OK", losses[-1])
