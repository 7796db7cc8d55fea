"""Device-mesh / sharding utilities.

The parallelism model (SURVEY.md §2.6): genomic regions are the outer,
embarrassingly-parallel axis handled host-side; on-device work is batch
data parallelism over a 1-axis mesh ("data"). Model params are replicated;
batches are sharded on axis 0. Training gradients are combined by XLA's
psum when the loss is jitted over the same mesh (see train/).

Multi-host: jax.distributed.initialize() + per-host region shards; the mesh
here then spans all hosts' devices and the same annotations scale out
(collectives ride ICI within a slice).
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("data",))


def shard_batch(mesh: Mesh, batch):
    """Shard axis 0 of every array in `batch` over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def shard_batch_from_local(mesh: Mesh, local_batch):
    """Multi-process batch feeding: each process contributes ITS rows of
    the global batch (axis 0 sharded over 'data' across every host's
    devices — the DistributedSampler analog). Single-process, this equals
    shard_batch. The local row count must match the process's share of
    the global batch."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), local_batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple
