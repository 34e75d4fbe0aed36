"""Fused Pallas TPU kernel for bidirectional nearest-neighbor distances.

Replaces the reference CUDA kernel (reference:
external/structural_losses/tf_nndistance_g.cu:5-30 — shared-memory tiles of
512 points with a 4x-unrolled inner loop) with a TPU-native design:

- the [n, m] squared-distance matrix is computed TILE BY TILE on the MXU via
  the ``|x|^2 + |y|^2 - 2 x.y`` expansion and never written to HBM — the
  kernel keeps only running min/argmin accumulators for both directions in
  VMEM (the pure-XLA path materialises/streams the full matrix: at
  [B, 2048, 2048] f32 that is the attack loop's main HBM traffic);
- both directions (x->y and y->x) are reduced from the same tile while it
  is VMEM-resident, halving the pairwise work vs two one-sided passes;
- y is passed pre-transposed ([3, m]) so the MXU contraction needs no
  in-kernel relayout.

Tie-breaking matches ``jnp.argmin`` / the reference CPU kernel: the first
(lowest-index) occurrence of the minimum wins — within a tile via a masked
index-min, across tiles via strict-less running updates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # python float: jnp scalars would be captured as traced consts
_PAD_COORD = 1.0e9  # padding points: huge coords -> never the nearest


def _pick_tile(size_padded: int) -> int:
    """Largest tile in {1024, 512, 256} dividing the padded size (1024x512
    tiles measured fastest at 2048^2 on v5e; inputs are padded to 256)."""
    for t in (1024, 512, 256):
        if size_padded % t == 0:
            return t
    return 256


def _nn_kernel(
    x_ref, yt_ref, d1_ref, i1_ref, d2_ref, i2_ref, *, n, m, tile_n, tile_m
):
    """One batch element: x [n, 3], y^T [3, m] -> d1/i1 [n,1], d2/i2 [1,m]."""
    d1_ref[0] = jnp.full((n, 1), _BIG, jnp.float32)
    i1_ref[0] = jnp.zeros((n, 1), jnp.int32)
    d2_ref[0] = jnp.full((1, m), _BIG, jnp.float32)
    i2_ref[0] = jnp.zeros((1, m), jnp.int32)

    for mi in range(m // tile_m):
        yt = yt_ref[0][:, mi * tile_m : (mi + 1) * tile_m]  # [3, MT]
        yy = jnp.sum(yt * yt, axis=0, keepdims=True)  # [1, MT]
        for ni in range(n // tile_n):
            xt = x_ref[0][ni * tile_n : (ni + 1) * tile_n, :]  # [NT, 3]
            xx = jnp.sum(xt * xt, axis=1, keepdims=True)  # [NT, 1]
            xy = jnp.dot(
                xt, yt,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,  # true f32: bf16 default
            )
            d = jnp.maximum(xx + yy - 2.0 * xy, 0.0)  # [NT, MT]

            col_ids = jax.lax.broadcasted_iota(
                jnp.int32, (tile_n, tile_m), 1
            )
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (tile_n, tile_m), 0
            )

            # --- x -> y direction: min over the MT axis ---
            tmin = jnp.min(d, axis=1, keepdims=True)  # [NT, 1]
            targ = jnp.min(
                jnp.where(d == tmin, col_ids, m), axis=1, keepdims=True
            ) + mi * tile_m  # first-occurrence tie-break
            nsl = pl.ds(ni * tile_n, tile_n)
            cur = d1_ref[0, nsl, :]
            better = tmin < cur
            d1_ref[0, nsl, :] = jnp.where(better, tmin, cur)
            cur_i = i1_ref[0, nsl, :]
            i1_ref[0, nsl, :] = jnp.where(better, targ, cur_i)

            # --- y -> x direction: min over the NT axis ---
            cmin = jnp.min(d, axis=0, keepdims=True)  # [1, MT]
            carg = jnp.min(
                jnp.where(d == cmin, row_ids, n), axis=0, keepdims=True
            ) + ni * tile_n
            msl = pl.ds(mi * tile_m, tile_m)
            cur2 = d2_ref[0, :, msl]
            better2 = cmin < cur2
            d2_ref[0, :, msl] = jnp.where(better2, cmin, cur2)
            cur2_i = i2_ref[0, :, msl]
            i2_ref[0, :, msl] = jnp.where(better2, carg, cur2_i)


def _round_up(v: int, mult: int) -> int:
    return -(-v // mult) * mult


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_distance_pallas(x: jax.Array, y: jax.Array, interpret: bool = False):
    """Fused forward nn_distance on TPU: [b,n,3],[b,m,3] -> d1,i1,d2,i2.

    Arbitrary n, m (padded internally to tile multiples). Forward only —
    the shared custom VJP in ``ops.chamfer`` provides the gradient from the
    returned indices.
    """
    lead = x.shape[:-2]
    n, m = x.shape[-2], y.shape[-2]
    x2 = x.reshape((-1, n, 3)).astype(jnp.float32)
    y2 = y.reshape((-1, m, 3)).astype(jnp.float32)
    b = x2.shape[0]

    n_pad = _round_up(n, 256)
    m_pad = _round_up(m, 256)
    tile_n = _pick_tile(n_pad)
    tile_m = _pick_tile(m_pad)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, 0), (0, n_pad - n), (0, 0)),
                     constant_values=_PAD_COORD)
    if m_pad != m:
        y2 = jnp.pad(y2, ((0, 0), (0, m_pad - m), (0, 0)),
                     constant_values=_PAD_COORD)
    yt = jnp.swapaxes(y2, -1, -2)  # [b, 3, m_pad]

    kernel = functools.partial(_nn_kernel, n=n_pad, m=m_pad, tile_n=tile_n, tile_m=tile_m)
    d1, i1, d2, i2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * m_pad * 8,
            bytes_accessed=b * (n_pad + m_pad) * 3 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, yt)

    d1 = d1[:, :n, 0].reshape(lead + (n,))
    i1 = i1[:, :n, 0].reshape(lead + (n,))
    d2 = d2[:, 0, :m].reshape(lead + (m,))
    i2 = i2[:, 0, :m].reshape(lead + (m,))
    return d1, i1, d2, i2
