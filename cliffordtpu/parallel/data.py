"""Per-host data feeding for multi-host meshes (SURVEY.md §2.6 DP plan).

Single-host: ``jax.device_put`` with the batch sharding.  Multi-host: each
process holds its local shard of the global batch and
``jax.make_array_from_process_local_data`` assembles the global array
without gathering through host 0.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def make_global_batch(mesh: Mesh, local_batch: np.ndarray):
    """Assemble a globally-sharded batch from this process's local shard.

    ``local_batch``: the examples this process loaded
    (global_batch_size / process_count rows).  On a single process this is
    just a sharded device_put.
    """
    sharding = global_batch_sharding(mesh, local_batch.ndim)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """``jax.distributed.initialize`` wrapper (DCN bring-up; no-op args on
    TPU pods where the runtime injects them)."""
    kwargs = {}
    if coordinator_address:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
