"""kNN / grouping ops (the reference's ``tf_grouping`` CUDA library).

Contracts (reference: external/grouping/tf_grouping.py:8-75):

    query_ball_point(radius, nsample, xyz1[b,n,3], xyz2[b,m,3])
        -> idx[b,m,nsample] int32, pts_cnt[b,m] int32
    select_top_k(k, dist[b,m,n]) -> (idx[b,m,n], dist_out[b,m,n])
        (only the first k of the last axis are meaningful)
    group_point(points[b,n,c], idx[b,m,s]) -> [b,m,s,c]
    knn_point(k, xyz1[b,n,c], xyz2[b,m,c]) -> (dist[b,m,k], idx[b,m,k])

Semantics preserved from the CUDA kernels:

- ``query_ball_point`` keeps the **first** ``nsample`` dataset points (in
  index order) whose squared distance is < radius^2, and pads the remainder
  of each row with the first hit (reference:
  external/grouping/tf_grouping_g.cu:1-36). ``pts_cnt`` counts distinct hits
  (capped at nsample).
- ``knn_point`` returns the k smallest squared distances in ascending order
  with ties broken by lower index, exactly like the CUDA selection sort
  (reference: tf_grouping_g.cu:80-122, strict ``<`` comparison).
- ``group_point``'s gradient is a scatter-add into the points array
  (reference: tf_grouping_g.cu:59-76) — JAX's ``take_along_axis`` transpose
  already is exactly that, so no custom VJP is needed.

TPU design notes: everything is dense, static-shape ``top_k`` / gather /
masked-cumsum — no data-dependent shapes, fuses under jit, vmaps over any
leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geometric_adv_tpu.ops.chamfer import pairwise_sqdist

Array = jax.Array


def knn_point(
    k: int, xyz1: Array, xyz2: Array, method: str = "direct"
) -> tuple[Array, Array]:
    """k nearest dataset points (xyz1) for each query point (xyz2).

    Returns (squared distances [..., m, k] ascending, indices [..., m, k]).
    reference: external/grouping/tf_grouping.py:48-75.
    """
    sqd = pairwise_sqdist(xyz2, xyz1, method=method)  # [..., m, n]
    # lax.top_k on negated distances; ties broken by lower index, matching the
    # CUDA selection sort's strict `<` scan (tf_grouping_g.cu:88-101).
    neg_d, idx = jax.lax.top_k(-sqd, k)
    return -neg_d, idx.astype(jnp.int32)


def select_top_k(k: int, dist: Array) -> tuple[Array, Array]:
    """First-k partial sort of a distance matrix along its last axis.

    Returns (idx, dist_out) with the k smallest entries (ascending) in the
    first k slots of the last axis; remaining slots hold the rest of the row
    in unspecified order, like the reference's partial selection sort.
    reference: external/grouping/tf_grouping.py:22-32, tf_grouping_g.cu:80-122.
    """
    # Deliberately a full stable argsort, not a partial selection: the
    # reference returns FULL [b, m, n] outputs (a permutation), so a
    # lax.top_k first-k would still need an O(n log n) permutation
    # completion for the remaining slots — same cost, more code. The hot
    # kNN path is ``knn_point`` (true O(n log k) top_k); this op's only
    # role is API parity.
    del k  # the first k slots of the sorted row match the contract
    order = jnp.argsort(dist, axis=-1, stable=True).astype(jnp.int32)
    dist_sorted = jnp.take_along_axis(dist, order, axis=-1)
    return order, dist_sorted


def group_point(points: Array, idx: Array) -> Array:
    """Gather point features by index: [..., n, c], [..., m, s] -> [..., m, s, c].

    reference: external/grouping/tf_grouping.py:33-40. Differentiable in
    ``points`` (transpose = scatter-add, matching tf_grouping_g.cu:59-76).
    """
    m, s = idx.shape[-2], idx.shape[-1]
    flat_idx = idx.reshape(idx.shape[:-2] + (m * s,))
    gathered = jnp.take_along_axis(
        points, flat_idx[..., None].astype(jnp.int32), axis=-2
    )
    return gathered.reshape(idx.shape[:-2] + (m, s, points.shape[-1]))


def query_ball_point(
    radius: float, nsample: int, xyz1: Array, xyz2: Array
) -> tuple[Array, Array]:
    """Indices of the first ``nsample`` dataset points within ``radius``.

    reference: external/grouping/tf_grouping.py:8-21, tf_grouping_g.cu:1-36.
    Rows with no hit return all-zero indices and pts_cnt == 0 (the CUDA
    kernel leaves its buffer unwritten in that case; callers never consume
    such rows — zero is the deterministic choice here).
    """
    n = xyz1.shape[-2]
    sqd = pairwise_sqdist(xyz2, xyz1, method="direct")  # [..., m, n]
    hit = sqd < radius * radius  # strict <, reference: tf_grouping_g.cu:15

    # Rank of each dataset point among the hits of its query row (in index
    # order); points beyond nsample-1 are dropped, like the CUDA early-exit.
    rank = jnp.cumsum(hit, axis=-1) - 1  # rank among hits, -1 if not yet hit
    pts_cnt = jnp.minimum(jnp.sum(hit, axis=-1), nsample).astype(jnp.int32)

    point_ids = jnp.arange(n, dtype=jnp.int32)
    # Sort key: hits keep their index, ordered by rank; non-hits go last.
    key = jnp.where(hit & (rank < nsample), rank, n + point_ids)
    order = jnp.argsort(key, axis=-1).astype(jnp.int32)
    idx = order[..., :nsample]

    # Pad slots >= pts_cnt with the first hit (reference pads with idx of the
    # first point found: tf_grouping_g.cu:17-24).
    slot = jnp.arange(nsample, dtype=jnp.int32)
    first_hit = idx[..., :1]
    valid = slot < jnp.maximum(pts_cnt, 1)[..., None]
    idx = jnp.where(valid, idx, first_hit)
    # Rows with zero hits: deterministic zeros.
    idx = jnp.where(pts_cnt[..., None] > 0, idx, 0)
    return idx, pts_cnt
