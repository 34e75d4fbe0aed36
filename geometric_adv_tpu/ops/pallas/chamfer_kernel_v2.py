"""Direct-difference Pallas chamfer forward (VPU formulation).

The v1 kernel (chamfer_kernel.py) computes distance tiles on the MXU via the
norm expansion — but the contraction dim is 3 (padded to 8), so the 128-wide
systolic array runs at ~6% occupancy, tripled again by f32 HIGHEST's 3-pass
emulation. At K=3 the VPU is the right unit: this kernel computes
``(x0-y0)^2 + (x1-y1)^2 + (x2-y2)^2`` directly from broadcast coordinate
planes — exact f32, no matmul, ~8 VPU ops per element.

Grid/layout strategy:
- the grid is (batch, n-tiles, m-tiles) so every VMEM block is tile-sized —
  arbitrary n/m (e.g. AtlasNet's 2500 recon vs 2048 target) fit the 16MB
  scoped-VMEM budget;
- m iterates fastest, so the d1/i1 accumulator blocks for a fixed n-tile
  stay VMEM-resident across their m sweep (TPU grids run sequentially);
  d2/i2 blocks are revisited once per n-tile (cheap: [1, MT] rows);
- Mosaic cannot sublane-broadcast a lane-offset row, so y coordinates
  arrive as offset-0 [1, MT] row blocks (yt pre-transposed on host) and x
  coordinates as [NT, 1] columns (lane-broadcast tolerates sublane offsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38
_PAD_COORD = 1.0e9


def _pick_tile(size_padded: int) -> int:
    for t in (1024, 512, 256):
        if size_padded % t == 0:
            return t
    return 256


def _pick_tile_m(m_pad: int) -> int:
    """Column-tile for the two FORWARD kernels: full-width m wins.

    Measured (same-process sweep, full kernel at [250, 2048^2], tile_n=128):
    tile_m 2048 -> 7.19 ms vs 1024 -> 8.72 (-18%, reproduced 7.25 vs 8.80
    in a second session) — one m-step per n-tile removes the
    d2-accumulator revisits and the per-tile row-reduction epilogues.
    Attack-level @[250, 2048^2], interleaved A/B x2: 6,697 -> 7,877 and
    7,709 -> 8,356 pair-iters/s (+8..18%). VMEM stays small ([128, 2048]
    f32 planes = 1 MB each). The BACKWARD kernels keep ``_pick_tile``:
    their mask planes are [MT, NT]-shaped, so a 2048-wide tile would cost
    16 MB of scoped VMEM. The min-only VALUES kernel also keeps
    ``_pick_tile`` — see its wrapper's comment.
    """
    for t in (2048, 1024, 512, 256):
        if m_pad % t == 0:
            return t
    return 256


def _pick_tile_n(n_pad: int) -> int:
    """Row-tile for the full (argmin) kernel: narrow tiles pipeline better.

    Measured (same-process sweep, [250, 2048^2]): 1024 -> 11.8 ms,
    512 -> 10.7, 256 -> 9.6, 128 -> 8.9 ms/call — monotone, -24% total;
    confirmed in a second session's interleaved A/B (12.19 -> 8.87 ms,
    -27%, with -11% at [256, 1024^2]: 4.54 -> 4.03 ms); tile_n=64 reverses
    the trend (4.33 vs 3.82 at [256, 1024^2]; 11.0 vs 8.7 at
    [250, 2048^2]) — 128 is the bottom of the valley. The m-tile goes the
    OTHER way (wider is better, see _pick_tile_m): narrow m measured
    strongly negative (1024x256: 8.3 ms vs 4.3 at [256, 1024^2]) — the
    per-tile row reductions and d2 revisits scale with m-steps.
    """
    return 128 if n_pad % 128 == 0 else _pick_tile(n_pad)


def pack_coord_rows(y: jax.Array) -> jax.Array:
    """[b, m, 3] -> [b, 8, m]: coordinates as sublane rows 0-2, padded to
    the 8-sublane tile so kernels can slice y0/y1/y2 at sublane offsets.
    Shared by the chamfer kernels and the EMD round kernels."""
    return jnp.pad(jnp.swapaxes(y, -1, -2), ((0, 0), (0, 5), (0, 0)))


def _round_up(v: int, mult: int) -> int:
    return -(-v // mult) * mult


def _nn_kernel_v2(
    x_ref,  # (1, NT, 3) x tile
    yt_ref,  # (1, 8, MT) y^T tile: rows 0-2 coords
    d1_ref,  # (1, NT, 1) accumulated across m-steps (resident per n-tile)
    i1_ref,  # (1, NT, 1)
    d2_ref,  # (1, 1, MT) revisited once per n-tile
    i2_ref,  # (1, 1, MT)
    *, tile_n, tile_m,
):
    ni = pl.program_id(1)
    mj = pl.program_id(2)

    @pl.when(mj == 0)
    def _init_rows():
        d1_ref[0] = jnp.full((tile_n, 1), _BIG, jnp.float32)
        i1_ref[0] = jnp.zeros((tile_n, 1), jnp.int32)

    @pl.when(ni == 0)
    def _init_cols():
        d2_ref[0] = jnp.full((1, tile_m), _BIG, jnp.float32)
        i2_ref[0] = jnp.zeros((1, tile_m), jnp.int32)

    xt = x_ref[0]  # [NT, 3]
    y0 = yt_ref[0][0:1, :]  # [1, MT]
    y1 = yt_ref[0][1:2, :]
    y2 = yt_ref[0][2:3, :]

    dx = xt[:, 0:1] - y0  # [NT, MT]
    dy = xt[:, 1:2] - y1
    dz = xt[:, 2:3] - y2
    d = dx * dx + dy * dy + dz * dz

    # iotas stay rank-broadcastable ([1, MT] / [NT, 1]) — materializing two
    # full [NT, MT] int32 index planes costs two extra VPU passes and 8 MB
    # of scoped VMEM per plane (same lesson as chamfer_loss_kernel).
    #
    # NEGATIVE RESULT (round 3, measured on v5e): replacing this
    # min/eq/where/min bookkeeping with in-kernel ``jnp.argmin`` is 40-50%
    # SLOWER (5.44 vs 3.70 ms at [256, 1024^2]; 12.4 vs 8.9 at
    # [250, 2048^2]) — Mosaic's argmin lowering loses to the manual
    # two-pass trick. It is also WRONG for parity: on real TPU hardware
    # in-kernel argmin breaks exact-distance ties by LAST index
    # (interpret mode: first), so a reversed-input variant with ``<=``
    # accumulation is needed for first-index semantics — measured slower
    # still (5.26/13.9 ms). Don't revisit.
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, tile_m), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0)

    # x -> y direction (min over MT), accumulated across the m sweep
    tmin = jnp.min(d, axis=1, keepdims=True)  # [NT, 1]
    targ = jnp.min(
        jnp.where(d == tmin, col_ids, 2**30), axis=1, keepdims=True
    ) + mj * tile_m
    cur = d1_ref[0]
    better = tmin < cur
    d1_ref[0] = jnp.where(better, tmin, cur)
    i1_ref[0] = jnp.where(better, targ, i1_ref[0])

    # y -> x direction (min over NT), accumulated across the n sweep
    cmin = jnp.min(d, axis=0, keepdims=True)  # [1, MT]
    carg = jnp.min(
        jnp.where(d == cmin, row_ids, 2**30), axis=0, keepdims=True
    ) + ni * tile_n
    cur2 = d2_ref[0]
    better2 = cmin < cur2
    d2_ref[0] = jnp.where(better2, cmin, cur2)
    i2_ref[0] = jnp.where(better2, carg, i2_ref[0])


def _nn_values_kernel_v2(
    x_ref,  # (1, NT, 3)
    yt_ref,  # (1, 8, MT)
    d1_ref,  # (1, NT, 1)
    d2_ref,  # (1, 1, MT)
    *, tile_n, tile_m,
):
    """Min-distance-only variant: skips the argmin bookkeeping (iota +
    compare + selects), ~40% fewer VPU ops — for consumers that never read
    the indices (the all-pairs matrix job, loss-only forwards)."""
    ni = pl.program_id(1)
    mj = pl.program_id(2)

    @pl.when(mj == 0)
    def _init_rows():
        d1_ref[0] = jnp.full((tile_n, 1), _BIG, jnp.float32)

    @pl.when(ni == 0)
    def _init_cols():
        d2_ref[0] = jnp.full((1, tile_m), _BIG, jnp.float32)

    xt = x_ref[0]
    y0 = yt_ref[0][0:1, :]
    y1 = yt_ref[0][1:2, :]
    y2 = yt_ref[0][2:3, :]

    dx = xt[:, 0:1] - y0
    dy = xt[:, 1:2] - y1
    dz = xt[:, 2:3] - y2
    d = dx * dx + dy * dy + dz * dz

    d1_ref[0] = jnp.minimum(d1_ref[0], jnp.min(d, axis=1, keepdims=True))
    d2_ref[0] = jnp.minimum(d2_ref[0], jnp.min(d, axis=0, keepdims=True))


@jax.jit
def nn_distance_values_pallas(x: jax.Array, y: jax.Array):
    """Fused min-only nn_distance: [b,n,3],[b,m,3] -> (d1 [b,n], d2 [b,m]).

    Same distance semantics as nn_distance_pallas_v2 but without the argmin
    outputs (non-differentiable; use where indices/gradients are unneeded).
    """
    lead = x.shape[:-2]
    n, m = x.shape[-2], y.shape[-2]
    x2 = x.reshape((-1, n, 3)).astype(jnp.float32)
    y2 = y.reshape((-1, m, 3)).astype(jnp.float32)
    b = x2.shape[0]

    n_pad = _round_up(max(n, 256), 256)
    m_pad = _round_up(max(m, 256), 256)
    tile_n = _pick_tile(n_pad)
    # narrow m measured BETTER here, unlike the full kernel: at
    # [64, 2048^2] (1024, 1024) = 2.35 ms vs (1024, 2048) = 2.76 — without
    # the argmin bookkeeping there are no per-tile epilogues to amortize,
    # and the wide tile only costs pipelining depth.
    tile_m = _pick_tile(m_pad)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, 0), (0, n_pad - n), (0, 0)),
                     constant_values=_PAD_COORD)
    if m_pad != m:
        y2 = jnp.pad(y2, ((0, 0), (0, m_pad - m), (0, 0)),
                     constant_values=_PAD_COORD)
    yt = pack_coord_rows(y2)

    kernel = functools.partial(
        _nn_values_kernel_v2, tile_n=tile_n, tile_m=tile_m
    )
    vm = pltpu.VMEM
    d1, d2 = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tile_n, m_pad // tile_m),
        in_specs=[
            pl.BlockSpec((1, tile_n, 3), lambda i, ni, mj: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 8, tile_m), lambda i, ni, mj: (i, 0, mj),
                         memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n, 1), lambda i, ni, mj: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, tile_m), lambda i, ni, mj: (i, 0, mj),
                         memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n_pad * m_pad,
            bytes_accessed=b * (n_pad + m_pad) * 16,
            transcendentals=0,
        ),
    )(x2, yt)

    d1 = d1[:, :n, 0].reshape(lead + (n,))
    d2 = d2[:, 0, :m].reshape(lead + (m,))
    return d1, d2


@jax.jit
def nn_distance_pallas_v2(x: jax.Array, y: jax.Array):
    """Exact fused nn_distance, direct-diff VPU formulation.

    Same contract as nn_distance_pallas: [b,n,3],[b,m,3] -> d1,i1,d2,i2.
    """
    lead = x.shape[:-2]
    n, m = x.shape[-2], y.shape[-2]
    x2 = x.reshape((-1, n, 3)).astype(jnp.float32)
    y2 = y.reshape((-1, m, 3)).astype(jnp.float32)
    b = x2.shape[0]

    n_pad = _round_up(max(n, 256), 256)
    m_pad = _round_up(max(m, 256), 256)
    tile_n = _pick_tile_n(n_pad)
    tile_m = _pick_tile_m(m_pad)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, 0), (0, n_pad - n), (0, 0)),
                     constant_values=_PAD_COORD)
    if m_pad != m:
        y2 = jnp.pad(y2, ((0, 0), (0, m_pad - m), (0, 0)),
                     constant_values=_PAD_COORD)
    yt = pack_coord_rows(y2)

    kernel = functools.partial(_nn_kernel_v2, tile_n=tile_n, tile_m=tile_m)
    vm = pltpu.VMEM
    d1, i1, d2, i2 = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tile_n, m_pad // tile_m),
        in_specs=[
            pl.BlockSpec((1, tile_n, 3), lambda i, ni, mj: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 8, tile_m), lambda i, ni, mj: (i, 0, mj),
                         memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n, 1), lambda i, ni, mj: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, tile_n, 1), lambda i, ni, mj: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, tile_m), lambda i, ni, mj: (i, 0, mj),
                         memory_space=vm),
            pl.BlockSpec((1, 1, tile_m), lambda i, ni, mj: (i, 0, mj),
                         memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n_pad * m_pad,
            bytes_accessed=b * (n_pad + m_pad) * 16,
            transcendentals=0,
        ),
    )(x2, yt)

    d1 = d1[:, :n, 0].reshape(lead + (n,))
    i1 = i1[:, :n, 0].reshape(lead + (n,))
    d2 = d2[:, 0, :m].reshape(lead + (m,))
    i2 = i2[:, 0, :m].reshape(lead + (m,))
    return d1, i1, d2, i2
