"""Pallas TPU kernel for the chamfer backward's scatter-add.

The nn_distance gradient scatter-adds per-point contributions at argmin
indices (reference: external/structural_losses/tf_nndistance_g.cu:132-151 —
CUDA atomicAdd). XLA lowers ``zeros.at[idx].add(upd)`` on TPU to a serialized
scatter, which measured as ~63% of the whole attack step.

TPU-native formulation: scatter-add along an index vector IS a one-hot
matmul — ``out[n, 3] = onehot(idx)[m, n]^T @ upd[m, 3]``. This kernel builds
the one-hot tiles in VMEM (never in HBM) and contracts them on the MXU in
the [3, NT] orientation (M=3 padded to 8 sublanes, N on lanes), so a
[b=256, m=1024 -> n=1024] scatter costs ~4 GFLOP of MXU time instead of a
million-step serial scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512


def _pick_tile(size_padded: int) -> int:
    for t in (1024, 512, 256):
        if size_padded % t == 0:
            return t
    return 256


def _scatter_kernel(idx_ref, updt_ref, out_ref, *, n, m, tile_n, tile_m):
    """idx [m, 1] int32, upd^T [3, m] -> out [3, n] (+= at idx columns)."""
    for ni in range(n // tile_n):
        acc = jnp.zeros((8, tile_n), jnp.float32)  # 8 sublanes (3 used)
        base = ni * tile_n
        col_ids = jax.lax.broadcasted_iota(
            jnp.int32, (tile_m, tile_n), 1
        )
        for mi in range(m // tile_m):
            idx_tile = idx_ref[0, pl.ds(mi * tile_m, tile_m), :]  # [MT, 1]
            mask_t = (idx_tile == base + col_ids).astype(jnp.float32)
            upd_t = updt_ref[0, :, pl.ds(mi * tile_m, tile_m)]  # [8, MT]
            acc = acc + jnp.dot(
                upd_t, mask_t,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        out_ref[0, :, pl.ds(base, tile_n)] = acc


def _round_up(v: int, mult: int) -> int:
    return -(-v // mult) * mult


@functools.partial(jax.jit, static_argnames=("n",))
def scatter_add_points_pallas(
    idx: jax.Array, updates: jax.Array, n: int
) -> jax.Array:
    """out[b, n, 3] with out[b, idx[b, j]] += updates[b, j] for all j.

    Matches ``zeros((b, n, 3)).at[idx].add(updates)`` (batched). idx values
    must lie in [0, n).
    """
    lead = idx.shape[:-1]
    m = idx.shape[-1]
    b = 1
    for s in lead:
        b *= s
    idx2 = idx.reshape((b, m)).astype(jnp.int32)
    upd2 = updates.reshape((b, m, 3)).astype(jnp.float32)

    n_pad = _round_up(max(n, 256), 256)
    m_pad = _round_up(m, 256)
    tile_n = _pick_tile(n_pad)
    tile_m = _pick_tile(m_pad)
    if m_pad != m:
        # padded rows point at index n_pad-1 with zero update: no effect
        idx2 = jnp.pad(idx2, ((0, 0), (0, m_pad - m)),
                       constant_values=n_pad - 1)
        upd2 = jnp.pad(upd2, ((0, 0), (0, m_pad - m), (0, 0)))

    idx3 = idx2[:, :, None]  # [b, m, 1]
    updt = jnp.swapaxes(upd2, -1, -2)  # [b, 3, m]
    updt = jnp.pad(updt, ((0, 0), (0, 5), (0, 0)))  # 3 -> 8 sublanes

    kernel = functools.partial(
        _scatter_kernel, n=n_pad, m=m_pad, tile_n=tile_n, tile_m=tile_m
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, m_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 8 * m_pad * n_pad,
            bytes_accessed=b * m_pad * (4 + 32) + b * n_pad * 32,
            transcendentals=0,
        ),
    )(idx3, updt)

    return jnp.swapaxes(out[:, :3, :n], -1, -2).reshape(lead + (n, 3))
