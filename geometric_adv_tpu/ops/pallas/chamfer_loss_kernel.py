"""Fused per-point-cloud Chamfer loss with gradient payloads (Pallas TPU).

The attack's hot loss is ``chamfer_loss_per_pc(x1, x2) = mean_i d1 + mean_j
d2`` whose output is PER EXAMPLE — so its VJP cotangent is one scalar per
example and every per-point cotangent is uniform (g/n or g/m). That
structure lets ONE forward kernel pass over the [n, m] distance tiles emit
everything the backward needs, g-free (reference backward formula:
external/structural_losses/tf_nndistance.cpp:130-163):

- ``nn1[i] = x2[idx1[i]]``   — selected per-tile with the running argmin;
- ``snn[i] = sum_{j: idx2[j]==i} x2[j]`` and ``cnt[i] = #{j: idx2[j]==i}``
  — the scatter side, accumulated per m-tile (the column argmin is final
  within a tile because n occupies a single tile);

so grad1 = g * [ (2/n)(x1 - nn1) + (2/m)(x1*cnt - snn) ] is cheap XLA
elementwise — no second [n, m]-sized kernel pass, which through VMEM-traffic
roofline is where the separate backward kernels (one-hot MXU matmuls or VPU
masked reductions, both measured ~3.6-4.7 ms/call at [256, 1024²]) spend
their time.

Argmin ties keep the reference's first-occurrence semantics: payload selects
are masked on the already-first-occurrence argmin index, not on distance
equality.

Constraint: n must fit one tile (n <= 2048 after padding; m-tile width
shrinks to keep the working set inside VMEM); callers fall back to the
composed nn_distance path otherwise (ops/chamfer.py handles this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geometric_adv_tpu.ops.pallas.chamfer_kernel_v2 import (
    _BIG,
    _PAD_COORD,
    _round_up,
    pack_coord_rows,
)

# The int32 argmin index rides in a float32 payload lane via bitcast. Raw
# indices 0..2047 bitcast to SUBNORMAL f32 values, which a flush-to-zero
# select/copy anywhere in the pipeline would silently zero. Biasing by 2^23
# puts every stored pattern in the normal range (exponent field >= 1) —
# FTZ/DAZ only touch subnormals — so storage is bit-safe by construction.
# The bias lives only inside the kernel; unpacking subtracts it.
_IDX_BIAS = 1 << 23

# Route the per-row payloads (nn coords, scatter sums, counts) through one-hot
# MXU contractions instead of per-coordinate VPU masked reductions. Exactness:
# with Precision.HIGHEST the f32 operand is split into 3 bf16 parts whose
# products with a one-hot 0/1 mask are individually exact and whose f32
# re-accumulation reconstructs the original value bit-exactly; the scatter
# sums accumulate ~cnt[i] exact terms per row (different order than the VPU
# sum, within 1-2 ulp).
#
# MEASURED NEGATIVE RESULT (2026-08-17, amortized on-device A/B): the MXU
# route is SLOWER — [256, 1024^2] 5.05 ms (VPU) vs 7.4 ms (MXU), [250,
# 2048^2] 21.9 vs 24.4 ms. An [NT, MT] x [MT, 8] contraction runs the
# 128-wide systolic array ~6% occupied and HIGHEST costs 3 passes, so the
# "13 VPU passes saved" never materialise. Kept as a validated-exact
# documented variant; default stays the VPU masked reductions.
PAYLOAD_VIA_MXU = False

# m-tile width for the n_pad=2048 two-subtile kernel. The forward argmin
# kernel won +18% from full-width m at 2048 (chamfer_kernel_v2._pick_tile_m),
# so the same sweep is exposed here; the live [1024, MT] distance subtiles
# cost ~2*MT*4KB of scoped VMEM each plus Mosaic temporaries, so wider
# tiles need a bigger vmem_limit (VMEM_LIMIT_2N).
#
# Round-4 on-device sweep at [250, 2048^2], bit-exact vs the v2 argmin
# kernel at every width (2026-08-19 session):
#   tile_m=512/32M 23.03 ms | 1024/64M 15.00 ms | 2048/100M 12.81 ms
# Full-width m wins for the same reason as the forward kernel: one grid
# step per batch element amortizes the [NT, MT] distance rebuild across
# both subtiles and drops the per-step Mosaic prologue. 100M VMEM fits
# (v5e has 128M/core; the live set is ~2 subtile planes + payloads).
TILE_M_2N = 2048
VMEM_LIMIT_2N = 100 * 1024 * 1024


def _payload_contract(mask, yt8):
    """[NT, MT] 0/1 mask x [8, MT] coord rows -> [NT, 8] via the MXU."""
    return jax.lax.dot_general(
        mask,
        yt8,
        ((( 1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _loss_kernel(
    x_ref,  # (1, NT, 3)  x1 tile (single n-tile)
    yt_ref,  # (1, 8, MT)  y^T tile: rows 0-2 coords
    d2_ref,  # (1, 1, MT)
    i2_ref,  # (1, 1, MT)
    pay_ref,  # (1, NT, 8)  lanes 0-2 nn1, 3-5 snn, 6 cnt, and the running
    #   d1 (lane 7) / idx1 (lane 8, int32 bits in f32) — everything per-row
    #   shares ONE block because each [NT, small] output pads its lane dim
    #   to 128 and double-buffers: separate d1/i1 blocks cost 4MB of VMEM
    #   that pushed the n=2048 config over the 16M scoped limit
    *, tile_n, tile_m, m_valid, use_mxu=False,
):
    mj = pl.program_id(1)

    @pl.when(mj == 0)
    def _init():
        pay_ref[0] = jnp.concatenate(
            [
                jnp.zeros((tile_n, 7), jnp.float32),
                jnp.full((tile_n, 1), _BIG, jnp.float32),  # running d1
                jnp.zeros((tile_n, 8), jnp.float32),  # idx1 bits + spare
            ],
            axis=1,
        )

    xt = x_ref[0]  # [NT, 3]
    y0 = yt_ref[0][0:1, :]  # [1, MT]
    y1 = yt_ref[0][1:2, :]
    y2 = yt_ref[0][2:3, :]

    dx = xt[:, 0:1] - y0  # [NT, MT]
    dy = xt[:, 1:2] - y1
    dz = xt[:, 2:3] - y2
    d = dx * dx + dy * dy + dz * dz

    # iotas stay rank-broadcastable ([1, MT] / [NT, 1]) — materializing two
    # full [NT, MT] int32 index planes costs 8MB of scoped VMEM at
    # n_pad=2048/tile_m=512 (measured OOM) and two full VPU passes
    col_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (1, tile_m), 1) + mj * tile_m
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0)

    # --- x1 -> x2 direction: running min/argmin + nn payload --------------
    tmin = jnp.min(d, axis=1, keepdims=True)  # [NT, 1]
    targ = jnp.min(
        jnp.where(d == tmin, col_ids, 2**30),
        axis=1, keepdims=True,
    )  # first-occurrence argmin (global column index)
    sel = col_ids == targ  # [NT, MT]; exactly one column per row
    if use_mxu:
        nn = _payload_contract(sel.astype(jnp.float32), yt_ref[0])[:, 0:3]
    else:
        nn = jnp.stack(
            [
                jnp.min(jnp.where(sel, y, _BIG), axis=1)
                for y in (y0, y1, y2)
            ],
            axis=-1,
        )  # [NT, 3]

    pay = pay_ref[0]
    cur = pay[:, 7:8]
    better = tmin < cur
    new_d1 = jnp.where(better, tmin, cur)
    cur_i1 = pltpu.bitcast(pay[:, 8:9], jnp.int32)  # biased domain
    new_i1 = pltpu.bitcast(
        jnp.where(better, targ + _IDX_BIAS, cur_i1), jnp.float32
    )
    pay_nn = jnp.where(better, nn, pay[:, 0:3])

    # --- x2 -> x1 direction: final within this m-tile (single n-tile) ----
    cmin = jnp.min(d, axis=0, keepdims=True)  # [1, MT]
    carg = jnp.min(
        jnp.where(d == cmin, row_ids, 2**30),
        axis=0, keepdims=True,
    )
    d2_ref[0] = cmin
    i2_ref[0] = carg

    # scatter sums: column j contributes x2[j] to row carg[j]. Padded
    # columns (>= m_valid, coords _PAD_COORD) must not contribute: the
    # validity row folds into the select's true-branch (0/1), so the mask
    # costs one select instead of eq+and+cast.
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, tile_m), 1) + mj * tile_m
        < m_valid
    ).astype(jnp.float32)  # [1, MT]
    mask_s = jnp.where(row_ids == carg, valid, 0.0)
    if use_mxu:
        # yt row 3 is packed with ones, so one contraction yields the
        # coordinate scatter sums AND the counts
        sc = _payload_contract(mask_s, yt_ref[0])
        snn = sc[:, 0:3]
        cnt = sc[:, 3:4]
    else:
        snn = jnp.stack(
            [
                jnp.sum(mask_s * y, axis=1)
                for y in (y0, y1, y2)
            ],
            axis=-1,
        )  # [NT, 3]
        cnt = jnp.sum(mask_s, axis=1, keepdims=True)  # [NT, 1]

    pay_ref[0] = jnp.concatenate(
        [
            pay_nn,
            pay[:, 3:6] + snn,
            pay[:, 6:7] + cnt,
            new_d1,
            new_i1,
            pay[:, 9:16],
        ],
        axis=1,
    )


def _loss_kernel_2n(
    x_ref,  # (1, 2048, 3)  full x1 (both n-subtiles)
    yt_ref,  # (1, 8, MT)
    d2_ref,  # (1, 1, MT)
    i2_ref,  # (1, 1, MT)
    pay_ref,  # (1, 2048, 16)  same lane layout as _loss_kernel
    *, tile_m, m_valid, use_mxu=False,
):
    """n_pad=2048 variant: two 1024-row subtiles processed inside one grid
    cell. The column argmin must be FINAL before the scatter sums — with n
    split across subtiles that means both distance tiles live together
    (2 x [1024, MT] VMEM), while the per-row state stays one small
    [2048, 16] block. Cross-subtile first-occurrence ties are exact because
    subtile-0 row indices all precede subtile-1's, so min(c0, c1) is the
    global first occurrence."""
    HN = 1024
    mj = pl.program_id(1)

    @pl.when(mj == 0)
    def _init():
        pay_ref[0] = jnp.concatenate(
            [
                jnp.zeros((2 * HN, 7), jnp.float32),
                jnp.full((2 * HN, 1), _BIG, jnp.float32),
                jnp.zeros((2 * HN, 8), jnp.float32),
            ],
            axis=1,
        )

    y0 = yt_ref[0][0:1, :]
    y1 = yt_ref[0][1:2, :]
    y2 = yt_ref[0][2:3, :]
    col_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (1, tile_m), 1) + mj * tile_m
    )
    valid = (col_ids < m_valid).astype(jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (HN, 1), 0)

    ds = []
    for ni in range(2):
        xt = x_ref[0][ni * HN : (ni + 1) * HN, :]
        dx = xt[:, 0:1] - y0
        dy = xt[:, 1:2] - y1
        dz = xt[:, 2:3] - y2
        ds.append(dx * dx + dy * dy + dz * dz)

    # --- x2 -> x1 direction across BOTH subtiles -------------------------
    cmin = jnp.minimum(
        jnp.min(ds[0], axis=0, keepdims=True),
        jnp.min(ds[1], axis=0, keepdims=True),
    )
    c0 = jnp.min(
        jnp.where(ds[0] == cmin, row_ids, 2**30), axis=0, keepdims=True
    )
    c1 = jnp.min(
        jnp.where(ds[1] == cmin, row_ids + HN, 2**30), axis=0, keepdims=True
    )
    carg = jnp.minimum(c0, c1)
    d2_ref[0] = cmin
    i2_ref[0] = carg

    # --- per-subtile row direction + scatter accumulation ----------------
    pay = pay_ref[0]
    new_rows = []
    for ni in range(2):
        d = ds[ni]
        sub = pay[ni * HN : (ni + 1) * HN, :]
        tmin = jnp.min(d, axis=1, keepdims=True)
        targ = jnp.min(
            jnp.where(d == tmin, col_ids, 2**30), axis=1, keepdims=True
        )
        sel = col_ids == targ
        if use_mxu:
            nn = _payload_contract(
                sel.astype(jnp.float32), yt_ref[0]
            )[:, 0:3]
        else:
            nn = jnp.stack(
                [
                    jnp.min(jnp.where(sel, yy, _BIG), axis=1)
                    for yy in (y0, y1, y2)
                ],
                axis=-1,
            )
        cur = sub[:, 7:8]
        better = tmin < cur
        new_d1 = jnp.where(better, tmin, cur)
        cur_i1 = pltpu.bitcast(sub[:, 8:9], jnp.int32)  # biased domain
        new_i1 = pltpu.bitcast(
            jnp.where(better, targ + _IDX_BIAS, cur_i1), jnp.float32
        )
        pay_nn = jnp.where(better, nn, sub[:, 0:3])

        mask_s = jnp.where(row_ids + ni * HN == carg, valid, 0.0)
        if use_mxu:
            sc = _payload_contract(mask_s, yt_ref[0])
            snn = sc[:, 0:3]
            cnt = sc[:, 3:4]
        else:
            snn = jnp.stack(
                [jnp.sum(mask_s * yy, axis=1) for yy in (y0, y1, y2)],
                axis=-1,
            )
            cnt = jnp.sum(mask_s, axis=1, keepdims=True)
        new_rows.append(
            jnp.concatenate(
                [
                    pay_nn,
                    sub[:, 3:6] + snn,
                    sub[:, 6:7] + cnt,
                    new_d1,
                    new_i1,
                    sub[:, 9:16],
                ],
                axis=1,
            )
        )
    pay_ref[0] = jnp.concatenate(new_rows, axis=0)


def chamfer_loss_payloads(x: jax.Array, y: jax.Array):
    """One fused pass: (d1, i1, d2, i2, nn1, snn1, cnt1) for [b, n<=1024, 3].

    d*/i* match nn_distance exactly; nn1/snn1/cnt1 are the gradient payloads
    described in the module docstring.
    """
    lead = x.shape[:-2]
    n, m = x.shape[-2], y.shape[-2]
    x2 = x.reshape((-1, n, 3)).astype(jnp.float32)
    y2 = y.reshape((-1, m, 3)).astype(jnp.float32)
    b = x2.shape[0]

    n_pad = _round_up(max(n, 256), 256)
    assert n_pad <= 2048, "caller must gate"
    if n_pad > 1024:
        n_pad = 2048  # the 2-subtile kernel is fixed at 2 x 1024 rows
    m_pad = _round_up(max(m, 256), 256)
    # widest m-tile the VMEM budget allows (measured: tile_m=1024 beats
    # 512/256 at n=1024 — grid-step overhead dominates smaller tiles);
    # n_pad=2048 runs the 2-subtile kernel whose big arrays are [1024, MT]
    # (TILE_M_2N: round-4 sweep — see the module tunable below).
    tile_m = 1024 if n_pad <= 1024 else TILE_M_2N
    while m_pad % tile_m:
        tile_m //= 2
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, 0), (0, n_pad - n), (0, 0)),
                     constant_values=_PAD_COORD)
    if m_pad != m:
        y2 = jnp.pad(y2, ((0, 0), (0, m_pad - m), (0, 0)),
                     constant_values=_PAD_COORD)
    yt = pack_coord_rows(y2)
    if PAYLOAD_VIA_MXU:
        # row 3 = ones so the scatter contraction also yields the counts
        yt = yt.at[:, 3, :].set(1.0)

    if n_pad <= 1024:
        kernel = functools.partial(
            _loss_kernel, tile_n=n_pad, tile_m=tile_m, m_valid=m,
            use_mxu=PAYLOAD_VIA_MXU,
        )
    else:
        kernel = functools.partial(
            _loss_kernel_2n, tile_m=tile_m, m_valid=m,
            use_mxu=PAYLOAD_VIA_MXU,
        )
    vm = pltpu.VMEM
    d2, i2, pay = pl.pallas_call(
        kernel,
        grid=(b, m_pad // tile_m),
        in_specs=[
            pl.BlockSpec((1, n_pad, 3), lambda i, mj: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 8, tile_m), lambda i, mj: (i, 0, mj),
                         memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_m), lambda i, mj: (i, 0, mj),
                         memory_space=vm),
            pl.BlockSpec((1, 1, tile_m), lambda i, mj: (i, 0, mj),
                         memory_space=vm),
            pl.BlockSpec((1, n_pad, 16), lambda i, mj: (i, 0, 0),
                         memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, n_pad, 16), jnp.float32),
        ],
        # NOTE: no dimension_semantics — marking the batch dim "parallel"
        # lets Mosaic pipeline cells concurrently, which inflates scoped
        # VMEM, and it measured performance-neutral at n=1024.
        # The default 16M scoped-VMEM budget is a compiler knob, not the
        # hardware cap; n_pad=2048 needs ~17M of live [NT, MT] temps.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(
                None if n_pad <= 1024 else VMEM_LIMIT_2N
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=31 * b * n_pad * m_pad,
            bytes_accessed=b * (n_pad * 12 + m_pad) * 16,
            transcendentals=0,
        ),
    )(x2, yt)

    d1 = pay[:, :n, 7].reshape(lead + (n,))
    i1 = (
        jax.lax.bitcast_convert_type(pay[:, :n, 8], jnp.int32) - _IDX_BIAS
    ).reshape(lead + (n,))
    d2 = d2[:, 0, :m].reshape(lead + (m,))
    i2 = i2[:, 0, :m].reshape(lead + (m,))
    nn1 = pay[:, :n, 0:3].reshape(lead + (n, 3))
    snn1 = pay[:, :n, 3:6].reshape(lead + (n, 3))
    cnt1 = pay[:, :n, 6].reshape(lead + (n,))
    return d1, i1, d2, i2, nn1, snn1, cnt1
