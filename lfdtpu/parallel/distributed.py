# Multi-host (DCN) initialization helpers.
#
# The reference has no multi-node story at all — DataParallel only, with
# rank checks that always return 0 (`lfd/execution/utils.py:55-58`,
# SURVEY.md §2.12). The TPU-native equivalent: jax.distributed.initialize()
# once per host, then the SAME single-program data-parallel code runs over
# all hosts — XLA routes in-slice gradient reductions over ICI and
# cross-slice over DCN. Each host feeds only its local shard of the batch.

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX (no-op for a single process).

    With TPU pod slices the arguments auto-discover from the environment;
    pass them explicitly for manual clusters.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialized or single-process environment
        pass


def process_info():
    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )


def local_batch_slice(global_batch_size, process_index=None, process_count=None):
    """The [start, stop) rows of the global batch this host must feed.

    Hosts load disjoint shards — wrap the (seed-shared) dataset sampler in
    `data.ShardedDatasetSampler`, which yields exactly these rows — and
    global arrays are assembled with jax.make_array_from_process_local_data
    (see `global_batch_from_local`).
    """
    if process_count is None:
        process_count = jax.process_count()
    if process_index is None:
        process_index = jax.process_index()
    assert global_batch_size % process_count == 0, (
        f"global batch {global_batch_size} not divisible by {process_count} hosts"
    )
    per = global_batch_size // process_count
    start = process_index * per
    return start, start + per


def global_batch_from_local(mesh, local_arrays):
    """Assemble per-host numpy shards into globally-sharded device arrays
    (dim 0 = global batch over the `data` axis)."""
    sharding = NamedSharding(mesh, P("data"))
    out = tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in local_arrays
    )
    return out if len(out) > 1 else out[0]
