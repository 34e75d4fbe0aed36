"""Multi-host (pod) initialisation and host-sharded data helpers.

The reference has no distributed story (single tf.Session; SURVEY §2.3).
Here multi-host runs use jax.distributed + the same 1-D mesh: every host
calls ``initialize_distributed()`` before touching jax, builds the global
mesh, and feeds its local shard of the batch via
``host_local_batch_to_global``.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialise the JAX distributed runtime (no-op if single-process).

    With no arguments, reads the standard cluster env vars
    (JAX_COORDINATOR_ADDRESS etc.) or auto-detects on Cloud TPU pods.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_local_batch_to_global(local_batch: np.ndarray, mesh, axis_name="data"):
    """Assemble a globally-sharded array from per-host local batches.

    Each process provides its local shard; the result is a jax.Array whose
    global shape concatenates all hosts' shards along the batch axis, sharded
    over the mesh — XLA collectives then ride ICI/DCN as the mesh dictates.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    global_shape = (
        local_batch.shape[0] * jax.process_count(),
    ) + local_batch.shape[1:]
    return jax.make_array_from_process_local_data(
        sharding, local_batch, global_shape
    )
