"""Pallas round kernels for the approximate-EMD auction sweep.

Motivation (round-4 measurement): the XLA formulation of one auction round
(ops/emd.py::_emd_sweep_single) consumes the [n, m] ``k = exp(level*sqd)``
plane in up to six separately-fused reductions (suml, sumr, cost, the two
gradient contraction pairs, and the remain_l rowdot), and XLA re-builds the
dist+exp plane inside EACH consumer fusion — ~6x the plane-build work. The
algebraic trims that stay expressible in XLA (cost-from-grads identity,
packed 4-column contractions) measured 0.97-1.00x on the v5e because they
do not change that recompute count.

These kernels restructure one round into exactly TWO plane builds:

  round_stage_a: one pass per [NT, m] tile -> suml (row reduce), ratio_l
      (the division happens in-kernel; the full row completes inside one
      tile because the m axis is not gridded), and the accumulated
      colsum_n(ratio_l * k) that the glue turns into sumr.
  round_stage_b: one pass -> the gradient increments in the reference's
      cancellation-free difference form  g1_inc = ratio_l * sum_m
      (k*rsqrt(d2)) * ratio_r * (x - y)  (reference:
      external/structural_losses/tf_approxmatch_g.cu:229-292 computes the
      same (a-b)/d form), the rowdot k @ ratio_r for the remain_l update,
      and the column-side increments. The cost increment satisfies
      sum(x . g1_inc) + sum(y . g2_inc) = sum(w * d)   (w = k rl (x) rr),
      since x.(x-y) + y.(y-x) = |x-y|^2 and |x-y|^2 * rsqrt = d — the
      identity was validated on-device, but the SHIPPED path accumulates
      the cost directly in-kernel in BOTH modes with one reduction order,
      so a plain forward and value_and_grad return bit-identical costs.

The difference form also removes the bf16-cancellation hazard that forces
the XLA path's thin contractions to Precision.HIGHEST (ops/emd.py): each
product term carries the (small) coordinate difference directly, all in
f32 VPU arithmetic — there is no ``big - big`` contraction pair to cancel.

Vector-length glue between the stages (ratio_r, remain updates, the cost
dot) stays in XLA: it is O(n + m) work.

Padding contract: rows/columns appended with remain_l / remain_r = 0
provably do not alter any output (every term they touch is multiplied by
their zero ratio), so the wrapper pads coordinates with an arbitrary
finite value and zero-extends the remain vectors. level <= 0 keeps
exp(level * sqd) <= 1 for any pad distance — no overflow path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geometric_adv_tpu.ops.pallas.chamfer_kernel_v2 import (
    _round_up,
    pack_coord_rows,
)
from geometric_adv_tpu.ops.pallas.chamfer_loss_kernel import VMEM_LIMIT_2N

# [NT, m] working tiles: 256 rows x full m width (one grid step per n-tile
# completes a whole suml row, which is what lets ratio_l finalize in-kernel)
DEFAULT_NT = 256

# scoped-VMEM ceiling for the round kernels: wide [NT, m] tiles carry
# several live planes (k, mm, the mu/mv products) past Mosaic's 16M
# default; shared with the 2-subtile chamfer loss kernel's budget
VMEM_LIMIT = VMEM_LIMIT_2N


def _tile_diff_planes(x_ref, yt_ref):
    """(1, NT, 3) x tile vs (1, 8, M) packed y rows -> (dx, dy, dz)
    broadcast-difference planes [NT, M] (v2-kernel layout: x as [NT, 1]
    lane-broadcast columns, y as offset-0 [1, M] sublane rows)."""
    xt = x_ref[0]
    yt = yt_ref[0]
    return (
        xt[:, 0:1] - yt[0:1, :],
        xt[:, 1:2] - yt[1:2, :],
        xt[:, 2:3] - yt[2:3, :],
    )


def _stage_a_kernel(
    level_ref,  # (1, 1) SMEM: this round's temperature (<= 0)
    x_ref,  # (1, NT, 3)
    yt_ref,  # (1, 8, M) y^T: rows 0-2 coords
    rl_ref,  # (1, NT, 1) remain_l tile
    rr_ref,  # (1, 1, M)  remain_r row
    ratio_l_ref,  # (1, NT, 1) out
    colsum_ref,  # (1, 1, M) out: sum_n ratio_l * k, accumulated over ni
):
    ni = pl.program_id(1)
    level = level_ref[0, 0]

    dx, dy, dz = _tile_diff_planes(x_ref, yt_ref)
    k = jnp.exp(level * (dx * dx + dy * dy + dz * dz))  # [NT, M]

    rr = rr_ref[0]  # [1, M]
    suml = jnp.sum(k * rr, axis=1, keepdims=True)  # [NT, 1]
    ratio_l = rl_ref[0] / (suml + 1e-9)
    ratio_l_ref[0] = ratio_l

    @pl.when(ni == 0)
    def _init():
        colsum_ref[0] = jnp.zeros_like(colsum_ref[0])

    colsum_ref[0] += jnp.sum(k * ratio_l, axis=0, keepdims=True)


def _stage_b_kernel(
    level_ref,  # (1, 1) SMEM
    x_ref,  # (1, NT, 3)
    yt_ref,  # (1, 8, M)
    ratio_l_ref,  # (1, NT, 1)
    rr_ref,  # (1, 1, M) ratio_r row
    g1row_ref,  # (1, NT, 4) out: cols 0-2 g1_inc, col 3 rowdot k@ratio_r
    g2col_ref=None,  # (1, 8, M) out (grads mode only): colsum increments
    cost_ref=None,  # (1, 1, 1) out: sum w*d, accumulated over ni
    *, tile_n, want_grads,
):
    # grads mode gets (g1row, g2col, cost); value-only mode gets
    # (g1row, cost) — only outputs the kernel writes exist, and the cost
    # is accumulated DIRECTLY in both modes with the identical reduction
    # order, so a plain forward and value_and_grad return the same bits
    if not want_grads:
        cost_ref = g2col_ref
        g2col_ref = None
    ni = pl.program_id(1)
    level = level_ref[0, 0]

    dx, dy, dz = _tile_diff_planes(x_ref, yt_ref)
    sqd = dx * dx + dy * dy + dz * dz
    k = jnp.exp(level * sqd)
    u = rr_ref[0]  # [1, M] ratio_r
    rl = ratio_l_ref[0]  # [NT, 1]

    rowdot = jnp.sum(k * u, axis=1, keepdims=True)  # k @ ratio_r
    inv_d = jax.lax.rsqrt(jnp.maximum(sqd, 1e-20))

    if want_grads:
        mu = k * inv_d * u  # [NT, M]
        gx = rl * jnp.sum(mu * dx, axis=1, keepdims=True)
        gy = rl * jnp.sum(mu * dy, axis=1, keepdims=True)
        gz = rl * jnp.sum(mu * dz, axis=1, keepdims=True)
        g1row_ref[0] = jnp.concatenate([gx, gy, gz, rowdot], axis=1)

        @pl.when(ni == 0)
        def _init_cols():
            g2col_ref[0] = jnp.zeros_like(g2col_ref[0])

        mv = k * inv_d * rl  # [NT, M]
        # column side accumulates sum_n mm*ratio_l*(y - x) = -colsum(mv*dx)
        cx = -jnp.sum(mv * dx, axis=0, keepdims=True)
        cy = -jnp.sum(mv * dy, axis=0, keepdims=True)
        cz = -jnp.sum(mv * dz, axis=0, keepdims=True)
        pad = jnp.zeros((5,) + cx.shape[1:], cx.dtype)
        g2col_ref[0] += jnp.concatenate([cx, cy, cz, pad], axis=0)
    else:
        zero3 = jnp.zeros((tile_n, 3), jnp.float32)
        g1row_ref[0] = jnp.concatenate([zero3, rowdot], axis=1)

    # cost tile: sum k*d*rl*u with d = sqd * rsqrt(max(sqd, eps)) —
    # accumulated DIRECTLY in both modes (identical reduction order) so a
    # plain forward and value_and_grad return bit-identical costs; the
    # sum(x.g1)+sum(y.g2) identity remains documented above but is not the
    # shipped cost path
    @pl.when(ni == 0)
    def _init_cost():
        cost_ref[0] = jnp.zeros_like(cost_ref[0])

    cost_ref[0] += jnp.sum(
        (k * (sqd * inv_d)) * rl * u
    ).reshape(1, 1)


def _stage_a(levels_i, x, yt, remain_l, remain_r, *, tile_n):
    b, n_pad = x.shape[0], x.shape[1]
    m_pad = yt.shape[-1]
    vm = pltpu.VMEM
    ratio_l, colsum = pl.pallas_call(
        _stage_a_kernel,
        grid=(b, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, ni: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_n, 3), lambda i, ni: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 8, m_pad), lambda i, ni: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, tile_n, 1), lambda i, ni: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, m_pad), lambda i, ni: (i, 0, 0),
                         memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n, 1), lambda i, ni: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, m_pad), lambda i, ni: (i, 0, 0),
                         memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=14 * b * n_pad * m_pad,
            bytes_accessed=b * (n_pad * 16 + m_pad * 8),
            transcendentals=b * n_pad * m_pad,
        ),
    )(levels_i, x, yt, remain_l, remain_r)
    return ratio_l, colsum


def _stage_b(levels_i, x, yt, ratio_l, ratio_r, *, tile_n, want_grads):
    b, n_pad = x.shape[0], x.shape[1]
    m_pad = yt.shape[-1]
    vm = pltpu.VMEM
    kernel = functools.partial(
        _stage_b_kernel, tile_n=tile_n, want_grads=want_grads
    )
    out_specs = [
        pl.BlockSpec((1, tile_n, 4), lambda i, ni: (i, ni, 0),
                     memory_space=vm),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, n_pad, 4), jnp.float32)]
    if want_grads:
        out_specs.append(
            pl.BlockSpec((1, 8, m_pad), lambda i, ni: (i, 0, 0),
                         memory_space=vm)
        )
        out_shape.append(jax.ShapeDtypeStruct((b, 8, m_pad), jnp.float32))
    # the cost accumulator exists in BOTH modes (bit-identical cost from
    # forward and value_and_grad)
    out_specs.append(
        pl.BlockSpec((1, 1, 1), lambda i, ni: (i, 0, 0), memory_space=vm)
    )
    out_shape.append(jax.ShapeDtypeStruct((b, 1, 1), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, ni: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_n, 3), lambda i, ni: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 8, m_pad), lambda i, ni: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, tile_n, 1), lambda i, ni: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, m_pad), lambda i, ni: (i, 0, 0),
                         memory_space=vm),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=(30 if want_grads else 16) * b * n_pad * m_pad,
            bytes_accessed=b * (n_pad * 20 + m_pad * 40),
            transcendentals=b * n_pad * m_pad,
        ),
    )(levels_i, x, yt, ratio_l, ratio_r)
    if want_grads:
        return outs[0], outs[1], outs[2]
    return outs[0], None, outs[1]


def emd_sweep_pallas(xyz1: jax.Array, xyz2: jax.Array, want_grads: bool,
                     levels, tile_n: int = DEFAULT_NT):
    """Full 10-round auction sweep: [b, n, 3], [b, m, 3] ->
    (cost [b], g1 [b, n, 3], g2 [b, m, 3]).

    Matches ops/emd.py::_emd_sweep_single (vmapped) up to f32 summation
    order. ``levels`` is the temperature schedule tuple.
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if n >= m:
        mult_l, mult_r = 1.0, float(n // m)
    else:
        mult_l, mult_r = float(m // n), 1.0

    n_pad = _round_up(max(n, tile_n), tile_n)
    m_pad = _round_up(max(m, 128), 128)
    x = xyz1.astype(jnp.float32)
    y = xyz2.astype(jnp.float32)
    if n_pad != n:
        # pad coords with a finite value; the zero-extended remain vectors
        # nullify every padded row/column term (see module docstring)
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)),
                    constant_values=1e3)
    if m_pad != m:
        y = jnp.pad(y, ((0, 0), (0, m_pad - m), (0, 0)),
                    constant_values=1e3)
    yt = pack_coord_rows(y)

    ones_n = jnp.ones((b, n, 1), jnp.float32)
    ones_m = jnp.ones((b, 1, m), jnp.float32)
    remain_l0 = mult_l * jnp.pad(ones_n, ((0, 0), (0, n_pad - n), (0, 0)))
    remain_r0 = mult_r * jnp.pad(ones_m, ((0, 0), (0, 0), (0, m_pad - m)))

    levels_arr = jnp.asarray(levels, jnp.float32).reshape(-1, 1)

    def round_fn(i, state):
        cost, g1, g2, remain_l, remain_r = state
        level_i = jax.lax.dynamic_slice(levels_arr, (i, 0), (1, 1))

        ratio_l, colsum = _stage_a(
            level_i, x, yt, remain_l, remain_r, tile_n=tile_n
        )
        sumr = colsum * remain_r  # [b, 1, m_pad]
        ratio_r = (
            jnp.minimum(remain_r / (sumr + 1e-9), 1.0) * remain_r
        )
        remain_r = jnp.maximum(remain_r - sumr, 0.0)

        g1row, g2col, cost_tile = _stage_b(
            level_i, x, yt, ratio_l, ratio_r,
            tile_n=tile_n, want_grads=want_grads,
        )
        rowdot = g1row[:, :, 3:4]  # k @ ratio_r
        remain_l = jnp.maximum(remain_l - ratio_l * rowdot, 0.0)

        if want_grads:
            g1_inc = g1row[:, :, :3]
            g2_inc = (
                jnp.swapaxes(g2col[:, :3, :], -1, -2)
                * jnp.swapaxes(ratio_r, -1, -2)
            )
            g1 = g1 + g1_inc
            g2 = g2 + g2_inc
        # direct accumulation in both modes (same reduction order), so a
        # plain forward and value_and_grad return bit-identical costs
        cost = cost + cost_tile[:, 0, 0]
        return cost, g1, g2, remain_l, remain_r

    state0 = (
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b, n_pad, 3), jnp.float32),
        jnp.zeros((b, m_pad, 3), jnp.float32),
        remain_l0,
        remain_r0,
    )
    cost, g1, g2, _, _ = jax.lax.fori_loop(
        0, levels_arr.shape[0], round_fn, state0
    )
    return cost, g1[:, :n, :], g2[:, :m, :]
