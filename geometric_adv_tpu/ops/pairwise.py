"""The all-pairs Chamfer distance matrix job.

The reference computes the 4379x4379 test-set matrix with a TF graph over
inner batches of 10 pairs, resumable in 100-column CLI shards — hours of GPU
time (reference: attacker/prepare_indices_for_attack.py:104-156,
attacker/runner_indices_for_attack.sh:12-17).

TPU re-design: the clouds upload once and stay device-resident; the pair
list is processed in *chunks*, where one chunk = one dispatch containing a
device-side ``lax.scan`` over many pair blocks. Within a block the
bidirectional NN reduction runs batched through the fused Pallas chamfer
kernel (or the XLA direct path off-TPU) — per dispatch only a tiny [nb, kb]
index array crosses the host boundary, and the scan amortises the dispatch
round trip over ~100k pairs (round 1 paid one RPC per 4k pairs through the
remote relay, which capped the job at ~400 pair-evals/s; the scan removes
that wall). Chunks remain the resumability/progress unit, matching the
reference's shard-level restartability at far coarser cost.

Entries are mean(d1) + mean(d2) of squared NN distances — identical metric
semantics to the reference's ``chamfer_dist`` node
(reference: prepare_indices_for_attack.py:113-114).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from geometric_adv_tpu.ops.chamfer import nn_distance, nn_distance_values

# Pairs per scan step: the gathered [kb, n, 3] source/target blocks are the
# HBM working set (kb=512 @2048 pts = 12.6 MB each) — large enough to fill
# the chamfer kernel, small enough to stay far from HBM pressure.
PAIR_BLOCK = 512


@partial(jax.jit, static_argnames=("method",))
def _pair_chamfer(src, tgt, method="direct"):
    d1, _, d2, _ = nn_distance(src, tgt, method)
    return jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)


@partial(jax.jit, static_argnames=("method",))
def _pair_chamfer_indexed(pcs, ii, jj, method="auto"):
    """Chamfer for index pairs of a device-resident cloud set — one block,
    one dispatch. Kept for small jobs and tests; the matrix job uses the
    scanned ``_pair_chamfer_chunk``."""
    d1, d2 = nn_distance_values(pcs[ii], pcs[jj], method)
    return jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)


@partial(jax.jit, static_argnames=("method",))
def _pair_chamfer_chunk(pcs, ii, jj, method="auto"):
    """Chamfer for [nb, kb] index pairs: a device-side scan over nb blocks.

    The whole chunk is ONE dispatch — the scan keeps the per-block gather +
    chamfer on device, so dispatch latency is paid once per nb*kb pairs.
    Returns [nb, kb] chamfer values.
    """

    def body(_, idx):
        ib, jb = idx
        return _, _pair_chamfer_indexed(pcs, ib, jb, method=method)

    _, ds = jax.lax.scan(body, None, (ii, jj))
    return ds


def chamfer_distance_matrix(
    point_clouds: np.ndarray,
    pair_block: int = PAIR_BLOCK,
    blocks_per_chunk: int = 256,
    mesh=None,
    method: str = "auto",
    progress: bool = False,
) -> np.ndarray:
    """Symmetric [N, N] chamfer matrix over a set of clouds.

    Args:
        point_clouds: [N, n, 3] array.
        pair_block: pairs per device-side scan step (the batched chamfer
            width). The gathered blocks are the HBM working set.
        blocks_per_chunk: scan steps per dispatch. One dispatch covers
            ``pair_block * blocks_per_chunk`` pairs; it is also the
            resumability/progress granule.
        mesh: optional device mesh; the pair axis of each block is sharded
            over it (clouds are replicated).
        method: pairwise-distance formulation ("auto" picks the fused Pallas
            kernel on TPU / "direct" XLA elsewhere).
    """
    # A jax.Array input is used as-is (already device-resident — e.g. a
    # dataset kept on device across stages); host inputs upload once below.
    if isinstance(point_clouds, jax.Array):
        pcs = point_clouds
    else:
        pcs = np.asarray(point_clouds, np.float32)
    n_total = pcs.shape[0]
    out = np.zeros((n_total, n_total), np.float32)

    # Upper-triangle pair list (matrix is symmetric; the reference computes
    # all N^2 — we halve the work). Diagonal pairs are computed too (they
    # evaluate to 0) to keep the pair list simply rectangular.
    iu, ju = np.triu_indices(n_total)
    n_pairs = len(iu)

    shard_of = 1 if mesh is None else mesh.devices.size
    if pair_block % shard_of:
        pair_block += shard_of - pair_block % shard_of

    # clouds upload once; per chunk only the [nb, kb] index arrays cross the
    # host boundary (through remote relays the per-block src/tgt uploads
    # were the round-1 bottleneck).
    pcs_dev = jnp.asarray(pcs, jnp.float32)
    if mesh is not None:
        if jax.process_count() == 1:
            from geometric_adv_tpu.parallel.mesh import replicated

            pcs_dev = jax.device_put(pcs_dev, replicated(mesh))
        else:
            # multi-host: device_put cannot target non-addressable devices;
            # every process holds the identical cloud set (shared artifact
            # store), so assemble the replicated global array instead
            from geometric_adv_tpu.parallel.distributed import (
                make_global_replicated,
            )

            pcs_dev = make_global_replicated(np.asarray(pcs, np.float32), mesh)

    chunk_pairs = pair_block * blocks_per_chunk
    # ONE chunk shape per job: a shape-changing tail chunk would recompile
    # the scanned program (a multi-second stall through a remote relay). A
    # job smaller than one chunk shrinks the chunk to its own size; larger
    # jobs pad the tail to the full chunk with (0, 0) self-pairs (harmless:
    # they compute chamfer(pcs[0], pcs[0]) = 0 and are sliced off, and the
    # waste is bounded by one chunk of a multi-chunk job).
    nb = min(blocks_per_chunk, -(-n_pairs // pair_block))
    chunk_pairs = pair_block * nb
    for s in range(0, n_pairs, chunk_pairs):
        e = min(s + chunk_pairs, n_pairs)
        k = e - s
        ii = np.zeros(chunk_pairs, np.int32)
        jj = np.zeros(chunk_pairs, np.int32)
        ii[:k] = iu[s:e]
        jj[:k] = ju[s:e]
        ii = ii.reshape(nb, pair_block)
        jj = jj.reshape(nb, pair_block)
        if mesh is not None:
            sh = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, mesh.axis_names[0])
            )
            if jax.process_count() == 1:
                ii = jax.device_put(ii, sh)
                jj = jax.device_put(jj, sh)
            else:
                # each process contributes its contiguous column slice of
                # the (identical, host-computed) pair-index block — mesh
                # device order is process-major, matching the row layout
                pc = jax.process_count()
                pid = jax.process_index()
                w = pair_block // pc
                ii = jax.make_array_from_process_local_data(
                    sh, ii[:, pid * w:(pid + 1) * w], ii.shape
                )
                jj = jax.make_array_from_process_local_data(
                    sh, jj[:, pid * w:(pid + 1) * w], jj.shape
                )
        from geometric_adv_tpu.parallel.distributed import gather_global

        # gather_global: plain device_get single-process; a cross-process
        # allgather when the chunk output is not fully addressable
        d = gather_global(
            _pair_chamfer_chunk(pcs_dev, ii, jj, method)
        ).reshape(-1)[:k]
        out[iu[s:e], ju[s:e]] = d
        out[ju[s:e], iu[s:e]] = d
        if progress:
            print(f"chamfer matrix: {e}/{n_pairs} pairs")
    return out
