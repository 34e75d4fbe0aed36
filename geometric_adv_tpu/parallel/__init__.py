"""Device-mesh and sharding helpers (the framework's scaling layer).

The reference is single-GPU; its only scale-out is CLI-shard loops over an
artifact store (reference: attacker/runner_indices_for_attack.sh:12-17).
Here scaling is native: a ``jax.sharding.Mesh`` over all chips, batch /
pair-grid axes sharded with NamedSharding, XLA inserting ICI collectives.
"""

from geometric_adv_tpu.parallel.distributed import (
    gather_global,
    initialize_distributed,
    is_primary,
    make_global_replicated,
    maybe_initialize_from_env,
    shard_host_batch,
)
from geometric_adv_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)

__all__ = [
    "get_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "pad_to_multiple",
    "initialize_distributed",
    "maybe_initialize_from_env",
    "make_global_replicated",
    "shard_host_batch",
    "gather_global",
    "is_primary",
]
