"""Fused Pallas TPU kernels for the full nn_distance backward (grad wrt xyz1).

The reference backward (external/structural_losses/tf_nndistance_g.cu:132-151)
is: grad1[i] = 2*g1[i]*(x1[i] - x2[idx1[i]])  - scatter_add over j of
2*g2[j]*(x2[j] - x1[idx2[j]]) at idx2[j].

On TPU both the gather and the scatter serialize badly in XLA. Two
identities remove the data-dependent addressing entirely:

- gather as one-hot contraction: x2[idx1[k]] = sum_j [idx1[k]==j] * x2[j];
- the scattered term's gather disappears algebraically:
  scatter(g2 * x1[idx2], idx2)[i] = x1[i] * scatter(g2, idx2)[i]
  (because idx2[j]==i implies x1[idx2[j]] == x1[i]).

Two kernel generations implement those contractions:

- ``chamfer_grad1_pallas`` (the default): two [8, MT] @ [MT, NT] matmuls
  per tile against one-hot masks. Only ~6% MXU row occupancy, but measured
  consistently ~12% faster than the VPU variant at [256, 1024^2] (3.6 vs
  4.1 and 4.2 vs 4.7 ms/call in two interleaved A/Bs). The contraction
  precision strategy is ``MATMUL_IMPL`` (see below): the round-3 default
  runs three DEFAULT-precision bf16 passes over in-kernel mantissa splits
  (-33% at [250, 2048^2] vs f32 HIGHEST, error within the gradient
  ledger); ``"highest_f32"`` restores the bit-level round-2 behavior.
- ``chamfer_grad1_pallas_vpu``: the one-hot contraction as a masked
  lane-reduction — ``sum over j of where(mask, val_j, 0)`` — exact f32 with
  no matmul passes. Kept for A/B and as the pattern reference; both
  formulations are VMEM-traffic-bound, which is why neither wins big (the
  fused loss kernel in chamfer_loss_kernel.py removes this pass entirely
  for the per-pc loss path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from geometric_adv_tpu.ops.pallas.chamfer_kernel_v2 import (
    _pick_tile,
    _round_up,
)

# One-hot matmul precision strategy (round-3 measurement):
#
# "split3_bf16" (default) — the value operands are split INSIDE the kernel
#   into three bf16 planes (v ~= q1 + q2*2^-8 + q3*2^-16, power-of-two
#   scaled so each part uses the full bf16 mantissa) and contracted with the
#   bf16 one-hot mask in three DEFAULT-precision MXU passes. Every product
#   is exact (the mask is exactly 0/1 in bf16; bf16 x bf16 products are
#   exact in the MXU's f32 accumulator), so the result differs from the
#   f32-HIGHEST contraction only by f32 summation order: measured max rel
#   error 1.3-1.6e-6 at the production shapes — inside the 2.6e-6 gradient
#   ledger (DESIGN.md §6). Measured 6.30 -> 4.25 ms/call at [250, 2048^2]
#   (-33%) and 3.19 -> 2.72 at [256, 1024^2] (-15%): HIGHEST's f32
#   emulation was over half the matmul cost (a DEFAULT-precision timing
#   floor measured 2.93 ms @2048).
#
#   The split MUST happen inside the kernel: an XLA-side
#   ``a - convert(convert(a, bf16), f32)`` prep is algebraically ELIDED to
#   zero by XLA:TPU (measured: all low parts exactly 0 on device, correct
#   in interpret mode), which silently degrades the whole contraction to
#   one bf16 pass.
#
# "highest_f32" — the original exact-f32 contraction, kept as the escape
#   hatch for strict-replay pipelines (--matmul_precision float32 flows
#   elsewhere; this flag is the kernel-level equivalent).
MATMUL_IMPL = "split3_bf16"

# Documented NEGATIVE result (2026-08-17, interleaved on-device A/B): building
# the one-hot masks directly in bf16 (0/1 exact; halves the mask vregs before
# the split3 contraction) measured SLOWER than select-to-f32 + convert —
# 3.67 vs 3.63 ms/call at [250, 2048^2] and 1.79 vs 1.67 at [256, 1024^2]
# (results bit-equal). Mosaic pipelines the f32 select better than the
# half-vreg bf16 select here; keep the f32 build.
MASK_DIRECT_BF16 = False

_SPLIT_SCALES = (1.0, 1.0 / 256.0, 1.0 / 65536.0)


def _split3(vals):
    """f32 [8, MT] -> three bf16 planes: vals ~= q1 + q2/2^8 + q3/2^16."""
    q1 = vals.astype(jnp.bfloat16)
    s1 = vals - q1.astype(jnp.float32)
    q2 = (s1 * 256.0).astype(jnp.bfloat16)
    s2 = s1 - q2.astype(jnp.float32) * (1.0 / 256.0)
    q3 = (s2 * 65536.0).astype(jnp.bfloat16)
    return q1, q2, q3


def _onehot_contract(vals, mask, impl):
    """dot(vals [8, MT], one-hot mask [MT, NT]) under the impl strategy.

    ``mask`` arrives in the dtype `_mask_dtype(impl)` produced — f32 for the
    HIGHEST contraction, bf16 (exact for 0/1) when split3 + direct build.
    """
    if impl == "highest_f32":
        return jnp.dot(
            vals, mask,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if mask.dtype != jnp.bfloat16:
        mask = mask.astype(jnp.bfloat16)
    acc = jnp.zeros((vals.shape[0], mask.shape[1]), jnp.float32)
    for q, sc in zip(_split3(vals), _SPLIT_SCALES):
        d = jnp.dot(q, mask, preferred_element_type=jnp.float32)
        acc = acc + (d if sc == 1.0 else d * sc)
    return acc


def _mask_dtype(impl):
    if impl != "highest_f32" and MASK_DIRECT_BF16:
        return jnp.bfloat16
    return jnp.float32


def _bwd_kernel(
    x1t_ref,  # [8, NT]  rows 0-2: x1^T          (one n-tile via grid)
    g1_ref,  # [1, NT]  2*g1
    idx1_ref,  # [1, NT]
    x2t_ref,  # [8, m]  rows 0-2: x2^T
    b2_ref,  # [8, m]  rows 0-2: 2*g2*x2^T, row 3: 2*g2
    idx2_ref,  # [m, 1]
    out_ref,  # [8, NT]  rows 0-2: grad1^T
    *, m, tile_n, tile_m, impl,
):
    # n-tiles are grid steps so idx1/g1/x1t slices arrive at lane offset 0
    # (Mosaic cannot sublane-broadcast a lane-offset row vector).
    base = pl.program_id(1) * tile_n
    acc_a = jnp.zeros((8, tile_n), jnp.float32)  # gathered x2^T
    acc_b = jnp.zeros((8, tile_n), jnp.float32)  # scatter + count
    idx1_row = idx1_ref[0]  # [1, NT]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 0)
    mdt = _mask_dtype(impl)
    for mi in range(m // tile_m):
        msl = slice(mi * tile_m, (mi + 1) * tile_m)
        # gather mask^T [MT, NT]: idx1[base+k] == mi*TILE_M + j
        mask_a = (idx1_row == mi * tile_m + row_ids).astype(mdt)
        acc_a = acc_a + _onehot_contract(x2t_ref[0][:, msl], mask_a, impl)
        # scatter mask^T [MT, NT]: idx2[mi*TILE_M + j] == base + k
        idx2_col = idx2_ref[0][msl, :]  # [MT, 1]
        mask_b = (idx2_col == base + col_ids).astype(mdt)
        acc_b = acc_b + _onehot_contract(b2_ref[0][:, msl], mask_b, impl)
    x1t = x1t_ref[0]  # [8, NT]
    g1row = g1_ref[0]  # [1, NT]
    cnt = acc_b[3:4, :]  # [1, NT] = sum of 2*g2 scattered here
    out_ref[0] = g1row * (x1t - acc_a) - acc_b + x1t * cnt


def _bwd_vpu_kernel(
    idx1_ref,  # [1, NT, 1]  idx1 column for this n-tile
    x2t_ref,  # [1, 8, MT]  rows 0-2: x2^T coords   (m-tile via grid)
    b2t_ref,  # [1, 8, MT]  rows 0-2: 2*g2*x2^T, row 3: 2*g2
    idx2_ref,  # [1, 1, MT]
    out_ref,  # [1, NT, 8]  lanes 0-2: gathered x2, 3-5: scatter, 6: count
    *, tile_n, tile_m,
):
    # Orientation matters on the VPU (measured): value rows must be
    # offset-0 [1, MT] blocks (sublane-broadcast of lane-offset rows is
    # unsupported and column lane-broadcasts are slow), and reductions run
    # along lanes — the same layout the forward kernel uses.
    ni = pl.program_id(1)
    mj = pl.program_id(2)

    @pl.when(mj == 0)
    def _init():
        out_ref[0] = jnp.zeros((tile_n, 8), jnp.float32)

    idx1_col = idx1_ref[0]  # [NT, 1]
    col_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_m), 1)
        + mj * tile_m
    )
    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_m), 0)
        + ni * tile_n
    )
    # gather mask [NT, MT]: column j contributes to row i iff idx1[i] == j
    mask_a = (col_ids == idx1_col).astype(jnp.float32)
    # scatter mask: column j contributes to row i iff idx2[j] == i
    mask_b = (idx2_ref[0] == row_ids).astype(jnp.float32)

    x2t = x2t_ref[0]  # [8, MT]
    b2t = b2t_ref[0]

    def red(mask, row):  # [NT, MT] * [1, MT] -> [NT, 1]
        return jnp.sum(mask * row, axis=1, keepdims=True)

    delta = jnp.concatenate(
        [
            red(mask_a, x2t[0:1, :]),
            red(mask_a, x2t[1:2, :]),
            red(mask_a, x2t[2:3, :]),
            red(mask_b, b2t[0:1, :]),
            red(mask_b, b2t[1:2, :]),
            red(mask_b, b2t[2:3, :]),
            red(mask_b, b2t[3:4, :]),
            jnp.zeros((tile_n, 1), jnp.float32),
        ],
        axis=1,
    )
    out_ref[0] = out_ref[0] + delta


@jax.jit
def chamfer_grad1_pallas_vpu(xyz1, xyz2, idx1, idx2, g1, g2):
    """grad of (sum g1*d1 + sum g2*d2) wrt xyz1 — VPU masked-reduction path.

    Shapes: xyz1 [..., n, 3], xyz2 [..., m, 3], idx1 [..., n], idx2 [..., m],
    g1 [..., n], g2 [..., m] -> [..., n, 3]. Exact f32 (products are
    0-or-value selects; no bf16 matmul rounding).
    """
    lead = xyz1.shape[:-2]
    n, m = xyz1.shape[-2], xyz2.shape[-2]
    b = 1
    for s in lead:
        b *= s

    n_pad = _round_up(max(n, 256), 256)
    m_pad = _round_up(max(m, 256), 256)
    tile_n = _pick_tile(n_pad)
    tile_m = _pick_tile(m_pad)

    def prep(a, pad_to):
        a = a.reshape((b, -1) + a.shape[len(lead) + 1 :])
        pads = [(0, 0), (0, pad_to - a.shape[1])] + [(0, 0)] * (a.ndim - 2)
        return jnp.pad(a.astype(jnp.float32), pads)

    x1 = prep(xyz1, n_pad)  # [b, n_pad, 3]
    x2 = prep(xyz2, m_pad)
    g1p = prep(2.0 * g1, n_pad)  # [b, n_pad]
    g2p = prep(2.0 * g2, m_pad)
    # padded idx1 rows gather x2[0] but g1 there is 0 -> no contribution;
    # padded idx2 rows scatter with g2 = 0 -> no contribution.
    i1 = jnp.pad(
        idx1.reshape((b, n)).astype(jnp.int32), ((0, 0), (0, n_pad - n))
    )
    i2 = jnp.pad(
        idx2.reshape((b, m)).astype(jnp.int32), ((0, 0), (0, m_pad - m))
    )

    x2t = jnp.pad(jnp.swapaxes(x2, -1, -2), ((0, 0), (0, 5), (0, 0)))
    b2t = jnp.concatenate(
        [
            jnp.swapaxes(x2, -1, -2) * g2p[:, None, :],
            g2p[:, None, :],
            jnp.zeros((b, 4, m_pad), jnp.float32),
        ],
        axis=1,
    )  # [b, 8, m_pad]
    i1col = i1[:, :, None]  # [b, n_pad, 1]
    i2row = i2[:, None, :]  # [b, 1, m_pad]

    kernel = functools.partial(
        _bwd_vpu_kernel, tile_n=tile_n, tile_m=tile_m
    )
    vm = pltpu.VMEM
    acc = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tile_n, m_pad // tile_m),
        in_specs=[
            pl.BlockSpec((1, tile_n, 1), lambda i, ni, mj: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 8, tile_m), lambda i, ni, mj: (i, 0, mj),
                         memory_space=vm),
            pl.BlockSpec((1, 8, tile_m), lambda i, ni, mj: (i, 0, mj),
                         memory_space=vm),
            pl.BlockSpec((1, 1, tile_m), lambda i, ni, mj: (i, 0, mj),
                         memory_space=vm),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_n, 8), lambda i, ni, mj: (i, ni, 0), memory_space=vm
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=19 * b * m_pad * n_pad,
            bytes_accessed=b * (n_pad + m_pad) * 40,
            transcendentals=0,
        ),
    )(i1col, x2t, b2t, i2row)

    # grad1 = g1*(x1 - nn1) - (scatter of 2*g2*x2) + x1 * (scatter of 2*g2)
    nn1 = acc[:, :n, 0:3]  # [b, n, 3]
    sc = acc[:, :n, 3:6]
    cnt = acc[:, :n, 6:7]
    x1n = x1[:, :n]
    grad = g1p[:, :n, None] * (x1n - nn1) - sc + x1n * cnt
    return grad.reshape(lead + (n, 3))


@jax.jit
def chamfer_grad1_pallas(xyz1, xyz2, idx1, idx2, g1, g2):
    """One-hot-matmul backward (the default; see module docstring).

    Shapes: xyz1 [..., n, 3], xyz2 [..., m, 3], idx1 [..., n], idx2 [..., m],
    g1 [..., n], g2 [..., m] -> [..., n, 3].
    """
    lead = xyz1.shape[:-2]
    n, m = xyz1.shape[-2], xyz2.shape[-2]
    b = 1
    for s in lead:
        b *= s

    n_pad = _round_up(max(n, 256), 256)
    m_pad = _round_up(max(m, 256), 256)
    tile_n = _pick_tile(n_pad)
    tile_m = _pick_tile(m_pad)

    def prep(a, rows, pad_to):
        a = a.reshape((b, -1) + a.shape[len(lead) + 1 :])
        pads = [(0, 0), (0, pad_to - a.shape[1])] + [(0, 0)] * (a.ndim - 2)
        return jnp.pad(a.astype(jnp.float32), pads)

    x1 = prep(xyz1, n, n_pad)  # [b, n_pad, 3]
    x2 = prep(xyz2, m, m_pad)
    g1p = prep(2.0 * g1, n, n_pad)  # [b, n_pad]
    g2p = prep(2.0 * g2, m, m_pad)
    # padded idx1 rows gather x2[0] with g1=0 -> no contribution;
    # padded idx2 rows scatter to slot m_pad-ish... point them at n_pad-1
    # with g2=0 -> zero update.
    i1 = jnp.pad(
        idx1.reshape((b, n)).astype(jnp.int32), ((0, 0), (0, n_pad - n))
    )
    i2 = jnp.pad(
        idx2.reshape((b, m)).astype(jnp.int32),
        ((0, 0), (0, m_pad - m)),
        constant_values=n_pad - 1,
    )

    x1t = jnp.pad(jnp.swapaxes(x1, -1, -2), ((0, 0), (0, 5), (0, 0)))
    x2t = jnp.pad(jnp.swapaxes(x2, -1, -2), ((0, 0), (0, 5), (0, 0)))
    b2 = jnp.concatenate(
        [
            jnp.swapaxes(x2, -1, -2) * g2p[:, None, :],  # [b, 3, m_pad]
            g2p[:, None, :],  # count row
            jnp.zeros((b, 4, m_pad), jnp.float32),
        ],
        axis=1,
    )  # [b, 8, m_pad]
    g1row = g1p[:, None, :]  # [b, 1, n_pad]
    i1row = i1[:, None, :]  # [b, 1, n_pad]
    i2col = i2[:, :, None]  # [b, m_pad, 1]

    # MATMUL_IMPL is read at trace time; flip it before first use (tests
    # use .clear_cache() when they A/B the two implementations).
    kernel = functools.partial(
        _bwd_kernel, m=m_pad, tile_n=tile_n, tile_m=tile_m, impl=MATMUL_IMPL
    )
    vm = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, 8, tile_n), lambda i, j: (i, 0, j),
                         memory_space=vm),
            pl.BlockSpec((1, 1, tile_n), lambda i, j: (i, 0, j),
                         memory_space=vm),
            pl.BlockSpec((1, 1, tile_n), lambda i, j: (i, 0, j),
                         memory_space=vm),
            pl.BlockSpec((1, 8, m_pad), lambda i, j: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 8, m_pad), lambda i, j: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, m_pad, 1), lambda i, j: (i, 0, 0),
                         memory_space=vm),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, tile_n), lambda i, j: (i, 0, j), memory_space=vm
        ),
        out_shape=jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * 8 * m_pad * n_pad,
            bytes_accessed=b * (n_pad + m_pad) * 40,
            transcendentals=0,
        ),
    )(x1t, g1row, i1row, x2t, b2, i2col)

    return jnp.swapaxes(out[:, :3, :n], -1, -2).reshape(lead + (n, 3))
