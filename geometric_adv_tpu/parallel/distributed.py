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


def maybe_initialize_from_env() -> bool:
    """Initialise the distributed runtime from environment variables.

    Every pipeline CLI routes through this (cli/common.py calls it at import)
    so any stage can run on a pod without code changes: launch one process
    per host with

        GAT_COORDINATOR_ADDRESS=<host0>:<port>
        GAT_NUM_PROCESSES=<n>  GAT_PROCESS_ID=<i>

    (JAX_-prefixed spellings are honoured too). Returns True when the
    runtime was initialised; no-op (False) when the vars are absent, the
    process count is 1, or the runtime is already up.
    """
    import os

    def _env(name):
        return os.environ.get("GAT_" + name) or os.environ.get("JAX_" + name)

    num = _env("NUM_PROCESSES")
    if num is None or int(num) <= 1:
        return False
    if jax.distributed.is_initialized():
        return False
    initialize_distributed(
        coordinator_address=_env("COORDINATOR_ADDRESS"),
        num_processes=int(num),
        process_id=int(_env("PROCESS_ID")),
    )
    return True


def make_global_replicated(array, mesh):
    """Replicate a host value across a (possibly multi-host) mesh.

    Every process must hold the identical full value — true for this
    pipeline because every stage reads the same shared artifact store
    (SURVEY §1: the on-disk .npy contract is the inter-stage API).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    array = np.asarray(array)
    if jax.process_count() == 1:
        return jax.device_put(array, NamedSharding(mesh, P()))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), array, array.shape
    )


def shard_host_batch(batch: np.ndarray, mesh, axis_name="data"):
    """Batch-shard a host array over the mesh, multi-host aware.

    Single-process: a plain sharded device_put. Multi-process: every host
    holds the identical global batch (shared artifact store); this process
    contributes its contiguous row slice — get_mesh() orders devices
    process-major, so process p owns rows [p*n/P, (p+1)*n/P).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = np.asarray(batch)
    if jax.process_count() == 1:
        return jax.device_put(batch, NamedSharding(mesh, P(axis_name)))
    n = batch.shape[0]
    pc, pid = jax.process_count(), jax.process_index()
    assert n % pc == 0, (n, pc)
    local = batch[pid * (n // pc) : (pid + 1) * (n // pc)]
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis_name)), local, batch.shape
    )


def gather_global(tree):
    """Materialise (possibly non-addressable) device outputs on every host.

    Single-process: plain device_get. Multi-process: an all-gather over the
    process boundary so each host sees the full global value (the CLIs'
    artifact writers need whole arrays; only process 0 writes).
    """
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: np.asarray(multihost_utils.process_allgather(x, tiled=True)),
        tree,
    )


def is_primary() -> bool:
    """True on the process that owns artifact/checkpoint writes."""
    return jax.process_index() == 0


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
