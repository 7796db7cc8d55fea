"""Multi-host scale-out: region sharding across hosts + result merging.

The scaling model (SURVEY.md §2.6, §5.8): genomic regions are statically
striped across hosts (the reference's `i % workers` pattern lifted to the
host level); each host runs the full image->inference->candidate pipeline
on its shard with its own BAM/FASTA handles (share-nothing), then candidate
lists are merged for global VCF assembly. Model params are replicated;
on-device work is batch-data-parallel over the global mesh.

On a pod slice: call `initialize()` once per host process before any jax
usage; `host_shard()` then stripes any work list by process index.
"""
from typing import List, Optional, Sequence, Tuple

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper; no-op for single-host runs.

    On TPU pods the arguments are auto-detected from the environment."""
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def host_count() -> int:
    return jax.process_count()


def host_index() -> int:
    return jax.process_index()


def host_shard(items: Sequence) -> List:
    """Static striping of a work list over hosts (i % hosts == this host)."""
    n, i = jax.process_count(), jax.process_index()
    return [item for k, item in enumerate(items) if k % n == i]


def shard_intervals_by_host(intervals: Sequence[Tuple[str, int, int]]
                            ) -> List[Tuple[str, int, int]]:
    return host_shard(intervals)


def merge_candidate_dicts(dicts: Sequence[dict]) -> dict:
    """Merge per-host candidate dictionaries (keyed (contig, position))
    before VCF assembly. Host-side gather: candidate payloads are ragged
    Python records, so the merge is filesystem/RPC-level rather than an
    on-device all_gather (the device path carries only dense tensors)."""
    merged: dict = {}
    for d in dicts:
        for key, value in d.items():
            merged.setdefault(key, []).extend(value)
    return merged
