"""Single-pass fused EMD auction kernel: the whole 10-round sweep as ONE
Pallas call with the distance field resident in VMEM.

Why a third formulation (after ops/emd.py's XLA sweep and the two-stage
round kernels in emd_round_kernel.py): both predecessors REBUILD the
[n, m] plane work every time it is consumed —

- the XLA sweep re-fuses dist+exp into each of its ~6 consumer reductions
  per round (measured round-4: algebraic trims that don't change that
  count are noise);
- the two-stage kernels build dist+exp exactly twice per round (stage A
  for ratio_l, stage B for grads/cost), plus sqrt/rsqrt per build, and
  still measured ~parity — because the rebuilt work is dominated by the
  TRANSCENDENTALS (exp each build, rsqrt each stage-B), not the 6-op
  distance arithmetic.

This kernel exploits that across the sweep the expensive plane fields are
either round-invariant or single-use-per-round:

- ``sqd`` and ``inv_d = rsqrt(max(sqd, 1e-20))`` depend only on the input
  clouds — built ONCE per cloud pair (grid round 0) into VMEM scratch and
  reused by all 10 rounds;
- ``k = exp(level * sqd)`` is built ONCE per round and consumed from
  registers/VMEM by every reduction of that round (suml, colsum, cost,
  both gradient contractions, rowdot) — one exp per round instead of the
  XLA path's ~6 or the two-stage kernels' 2;
- the auction's sequential round dependency runs as a ``fori_loop``
  INSIDE the kernel (one grid step per cloud pair): ``remain_l``/
  ``remain_r`` persist in VMEM scratch across loop iterations, and
  cost/g1/g2 accumulate into output blocks that stay VMEM-resident for
  all rounds of one cloud pair.

Per [n, m] element per grads round this is ~1 exp + ~30 mul/add, vs
~6 exp + ~2 sqrt/rsqrt + ~40 mul/add for the XLA sweep — the measured
effect on a v5e is in DESIGN.md (round 5).

Constraint: the full [n_pad, m_pad] plane must fit VMEM alongside its
temporaries — n_pad, m_pad <= 1024 (3 x 4 MB persistent + Mosaic temps
under the 100 MB scoped budget); callers fall back to the XLA sweep
beyond (ops/emd.py gates).

Semantics: identical to ops/emd.py::_emd_sweep_single (the reference's
approxmatch.cpp:25-77 / tf_approxmatch_g.cu schedule with the n//m
multipliers and the final level-0 round) up to f32 reduction order; the
gradients use the reference's cancellation-free ``(a-b)/d`` difference
form (tf_approxmatch_g.cu:229-292) like the two-stage kernels, so no
Precision.HIGHEST contraction is involved anywhere.

Padding contract (same proof as emd_round_kernel.py): padded rows/columns
carry remain == 0, which nullifies every term they touch; coordinates pad
with a large finite value so exp underflows cleanly at level < 0 and the
level == 0 round is killed by the zero ratios.
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

# full-plane working set: sqd + inv_d scratch and the per-round k plane at
# [1024, 1024] f32 are 4 MB each; Mosaic temporaries for the fused
# reductions ride on top — measured safe under the 100 MB scoped budget
VMEM_LIMIT = 100 * 1024 * 1024

MAX_N = 1024  # single-tile bound for n_pad and m_pad


def fused_sweep_supported(n: int, m: int) -> bool:
    return max(n, 128) <= MAX_N and max(m, 128) <= MAX_N


def _sweep_kernel(
    levels_ref,  # (R, 1) SMEM: temperature schedule
    x_ref,  # (1, N, 3)
    yt_ref,  # (1, 8, M) packed y rows (0-2 coords)
    cost_ref,  # (1, 1, 1) out, accumulated over rounds
    g1_ref,  # (1, N, 3) out (grads mode) or (1, 1, 1) dummy
    g2_ref,  # (1, 8, M) out (grads mode) or (1, 1, 1) dummy
    sqd_ref,  # (N, M) f32 scratch: squared distances (round-invariant)
    invd_ref,  # (N, M) f32 scratch: rsqrt(max(sqd, 1e-20))
    rl_ref,  # (N, 1) f32 scratch: remain_l
    rr_ref,  # (1, M) f32 scratch: remain_r
    *,
    n_valid: int,
    m_valid: int,
    mult_l: float,
    mult_r: float,
    want_grads: bool,
    n_rounds: int,
):
    """One grid step = one cloud pair, ALL rounds via an in-kernel loop.

    The first cut ran the round index as a second grid dimension
    (grid = (b, n_rounds)) with this same body under ``pl.when(r == 0)``
    init. The loop form is kept because it is the natural structure (the
    rounds are a sequential scan over persistent VMEM state, not
    independent grid work) and measured slightly faster; the LARGE
    measured win over the XLA sweep — 3.84 vs 11.13 ms/call device-true
    at [50, 1024², grads] — comes from the plane-build economics in the
    module docstring, and was initially hidden under ~25 ms/call of relay
    RPC latency until measured scan-amortized (DESIGN.md round 5).
    """
    xt = x_ref[0]
    yt = yt_ref[0]
    dx = xt[:, 0:1] - yt[0:1, :]
    dy = xt[:, 1:2] - yt[1:2, :]
    dz = xt[:, 2:3] - yt[2:3, :]

    n_pad, m_pad = sqd_ref.shape
    sqd0 = dx * dx + dy * dy + dz * dz
    sqd_ref[:, :] = sqd0
    invd_ref[:, :] = jax.lax.rsqrt(jnp.maximum(sqd0, 1e-20))
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
    rl_ref[:, :] = jnp.where(rows < n_valid, mult_l, 0.0)
    rr_ref[:, :] = jnp.where(cols < m_valid, mult_r, 0.0)
    cost_ref[0] = jnp.zeros_like(cost_ref[0])
    g1_ref[0] = jnp.zeros_like(g1_ref[0])
    g2_ref[0] = jnp.zeros_like(g2_ref[0])

    def round_body(r, _):
        level = levels_ref[r, 0]
        sqd = sqd_ref[:, :]
        k = jnp.exp(level * sqd)  # the ONE exp of this round
        remain_l = rl_ref[:, :]  # [N, 1]
        remain_r = rr_ref[:, :]  # [1, M]

        # row pass (reference: approxmatch.cpp:34-47)
        suml = jnp.sum(k * remain_r, axis=1, keepdims=True)  # [N, 1]
        ratio_l = remain_l / (suml + 1e-9)

        # column pass (approxmatch.cpp:48-62)
        colsum = jnp.sum(k * ratio_l, axis=0, keepdims=True)  # [1, M]
        sumr = colsum * remain_r
        ratio_r = jnp.minimum(remain_r / (sumr + 1e-9), 1.0) * remain_r
        rr_ref[:, :] = jnp.maximum(remain_r - sumr, 0.0)

        inv_d = invd_ref[:, :]
        # cost: sum w * d with w = k * ratio_l (x) ratio_r, d = sqd * inv_d
        cost_ref[0] += jnp.sum(
            (k * (sqd * inv_d)) * ratio_l * ratio_r
        ).reshape(1, 1)

        if want_grads:
            # reference (a-b)/d difference form (tf_approxmatch_g.cu:229-292)
            #  g1_inc[i] = ratio_l[i] * sum_j k*inv_d*ratio_r[j] * (x[i]-y[j])
            #  g2_inc[j] = ratio_r[j] * sum_i k*inv_d*ratio_l[i] * (y[j]-x[i])
            mu = k * inv_d * ratio_r  # [N, M]
            gx = ratio_l * jnp.sum(mu * dx, axis=1, keepdims=True)
            gy = ratio_l * jnp.sum(mu * dy, axis=1, keepdims=True)
            gz = ratio_l * jnp.sum(mu * dz, axis=1, keepdims=True)
            g1_ref[0] += jnp.concatenate([gx, gy, gz], axis=1).reshape(
                g1_ref.shape[1:]
            )
            mv = k * inv_d * ratio_l  # [N, M]
            cx = -ratio_r * jnp.sum(mv * dx, axis=0, keepdims=True)
            cy = -ratio_r * jnp.sum(mv * dy, axis=0, keepdims=True)
            cz = -ratio_r * jnp.sum(mv * dz, axis=0, keepdims=True)
            pad = jnp.zeros((5,) + cx.shape[1:], cx.dtype)
            g2_ref[0] += jnp.concatenate([cx, cy, cz, pad], axis=0)

        # row transport: remain_l -= ratio_l * (k @ ratio_r)
        rowdot = jnp.sum(k * ratio_r, axis=1, keepdims=True)
        rl_ref[:, :] = jnp.maximum(remain_l - ratio_l * rowdot, 0.0)
        return 0

    jax.lax.fori_loop(0, n_rounds, round_body, 0)


def emd_sweep_fused_pallas(
    xyz1: jax.Array, xyz2: jax.Array, want_grads: bool, levels
):
    """Full auction sweep in one kernel: [b, n, 3], [b, m, 3] ->
    (cost [b], g1 [b, n, 3], g2 [b, m, 3]); g1/g2 are zeros when
    ``want_grads`` is False.

    Matches ops/emd.py::_emd_sweep_single up to f32 reduction order.
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    assert fused_sweep_supported(n, m), "caller must gate"
    if n >= m:
        mult_l, mult_r = 1.0, float(n // m)
    else:
        mult_l, mult_r = float(m // n), 1.0

    n_pad = _round_up(max(n, 128), 128)
    m_pad = _round_up(max(m, 128), 128)
    x = xyz1.astype(jnp.float32)
    y = xyz2.astype(jnp.float32)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)), constant_values=1e3)
    if m_pad != m:
        y = jnp.pad(y, ((0, 0), (0, m_pad - m), (0, 0)), constant_values=1e3)
    yt = pack_coord_rows(y)

    levels_arr = jnp.asarray(levels, jnp.float32).reshape(-1, 1)
    n_rounds = levels_arr.shape[0]

    kernel = functools.partial(
        _sweep_kernel,
        n_valid=n,
        m_valid=m,
        mult_l=mult_l,
        mult_r=mult_r,
        want_grads=want_grads,
        n_rounds=n_rounds,
    )
    vm = pltpu.VMEM
    g1_shape = (b, n_pad, 3) if want_grads else (b, 1, 1)
    g2_shape = (b, 8, m_pad) if want_grads else (b, 1, 1)
    cost, g1, g2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((n_rounds, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_pad, 3), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 8, m_pad), lambda i: (i, 0, 0),
                         memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec(
                (1,) + g1_shape[1:], lambda i: (i, 0, 0),
                memory_space=vm,
            ),
            pl.BlockSpec(
                (1,) + g2_shape[1:], lambda i: (i, 0, 0),
                memory_space=vm,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct(g1_shape, jnp.float32),
            jax.ShapeDtypeStruct(g2_shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, m_pad), jnp.float32),
            pltpu.VMEM((n_pad, m_pad), jnp.float32),
            pltpu.VMEM((n_pad, 1), jnp.float32),
            pltpu.VMEM((1, m_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(34 if want_grads else 12) * b * n_rounds * n_pad * m_pad,
            bytes_accessed=b * n_pad * m_pad * 8,
            transcendentals=b * n_rounds * n_pad * m_pad,
        ),
    )(levels_arr, x, yt)

    cost = cost[:, 0, 0]
    if not want_grads:
        zeros1 = jnp.zeros((b, n, 3), jnp.float32)
        zeros2 = jnp.zeros((b, m, 3), jnp.float32)
        return cost, zeros1, zeros2
    return cost, g1[:, :n, :], jnp.swapaxes(g2[:, :3, :m], -1, -2)
