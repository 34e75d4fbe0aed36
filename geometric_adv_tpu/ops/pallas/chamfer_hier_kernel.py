"""Hierarchical (block-bound pruned) Pallas chamfer forward.

**STATUS: documented NEGATIVE result — correct but NOT routed.** Measured
on the v5e (2026-08-19, amortized 20-iter device-side scans at the paper's
[250, 2048^2] attack shape, interleaved with the v2 kernel in the same
session): v2 full kernel 7.56 ms/call; this kernel ~15x SLOWER end-to-end.
Decomposition: the Morton sorts + inverse-permutation gathers alone cost
~24 ms/call — more than the ENTIRE v2 kernel — and the two direction
kernels on pre-sorted inputs cost ~77 ms: the 16 per-block data-dependent
``pl.when`` regions per grid step serialize Mosaic's vector pipeline (each
region is a scalar-guarded branch; the VPU cannot overlap work across
them), so even a high prune rate loses to v2's branch-free dense sweep.
The lesson generalizes: on TPU, uniform dense compute at VPU peak beats
work-skipping schemes whose skip granularity is fine enough to matter.
Kept in-tree (a) as the measured answer to "why not prune?" and (b)
because the kernel is exact and interpret-mode tested — a future
architecture with cheaper predication could revisit.

Post-measurement fix (same round): the original wrapper sorted each cloud
TWICE (once as query, once inside the target prep) — now each cloud is
sorted once and reused (``_prep_target_sorted``), so the ~24 ms sort cost
above is roughly halved. Re-measured after the fix in a heavily throttled
window (v2 itself at 34.5 ms, ~4.6x off its healthy rate): hier 153 ms =
4.4x slower, values AND indices still bit-equal to v2 on hardware. The
direction kernels' Mosaic serialization remains the dominant cost; the
negative verdict stands.

The v2 kernel (chamfer_kernel_v2.py) computes every [n, m] distance exactly
once — at the reference attack shape ([250, 2048, 3] pairs) that is at the
VPU roofline (DESIGN.md round-3 accounting: 7.05 ms/call with every
component accounted), so the only way forward is to compute LESS. This
kernel cuts the work algorithmically while keeping the reference op's exact
contract (squared-L2 values bit-meaningful, argmin indices with
first-occurrence tie semantics — reference
external/structural_losses/tf_nndistance_g.cu:5-30, whose running
``if (d < best)`` scan keeps the first index among exact ties):

1. Both clouds are Morton-sorted (host/XLA prepass) so that consecutive
   points are spatial neighbors: 128-point x tiles become spatially
   coherent, and BS-point y blocks get tight bounding spheres
   (centroid c_j, radius r_j).
2. A cheap O(n * n_blocks) XLA prepass seeds every x with a TRUE upper
   bound on its NN distance: ub(x) = min_j (|x - c_j| + r_j)^2.
3. The kernel visits y blocks with a per-(x-tile, block) skip test: block j
   is computed only if ANY x in the tile has lower bound
   lb(x, j) = max(0, |x - c_j| - r_j)^2 <= running_min(x). Since
   lb(x, j) <= d(x, p) for every p in block j, any candidate that could tie
   or beat the running min is always examined — the pruning is EXACT, not
   approximate.
4. Ties are resolved against ORIGINAL point ids carried through the sort
   (min-original-id among equal-distance candidates == the reference's
   first-occurrence rule), so the returned indices are identical to the
   unsorted kernel's.

Float-safety: radii and upper bounds are inflated (and lower bounds
deflated) by ~1e-4 relative margins so that f32 rounding in the bound
arithmetic can never prune the true argmin block; the margins only cost a
sliver of pruning efficiency (bounds are geometric, errors are ~1e-6).

Layout notes (Mosaic): a lane-offset row slice cannot be sublane-broadcast,
so the sorted y cloud is packed as [n_blocks * 8, BS] — block j's coordinate
rows live at SUBLANE offset j*8, lane offset 0, where broadcasting is legal.
This keeps the whole m extent VMEM-resident per grid step and the grid at
(batch, n_tiles) — the same step count as the v2 full-width-m configuration
— so the per-block ``pl.when`` skips save pure compute without adding grid
sequencing overhead. Block centroid/radius scalars arrive via SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geometric_adv_tpu.ops.pallas.chamfer_kernel_v2 import _round_up

_PAD_COORD = 1.0e9
_BIG_IDX = 2**30
# relative inflation applied to block radii (serves both bound directions:
# a bigger r lowers lb and raises ub) plus an extra deflation on lb and
# inflation on ub — together ~1e-4 of slack against ~1e-6 f32 rounding.
_R_MARGIN = 1.0 + 1e-4
_LB_MARGIN = 1.0 - 1e-5
_UB_MARGIN = 1.0 + 1e-5
_ABS_MARGIN = 1e-12

# Block size (pruning granularity) and x-tile rows. BS=128 gives 16 blocks
# at the reference m=2048 — fine enough to prune well, coarse enough that
# the per-block bound test ([NT,1] vector ops + a scalar reduce) is noise.
DEFAULT_BS = 128
DEFAULT_NT = 128


def _pick_bs(m_pad: int) -> int:
    for bs in (DEFAULT_BS, 256, 512):
        if m_pad % bs == 0:
            return bs
    return m_pad  # degenerate: one block == no pruning, still correct


def morton_codes(pts: jax.Array) -> jax.Array:
    """[..., k, 3] f32 -> [..., k] uint32 Morton codes (10 bits/axis).

    Quantization box is the per-cloud bounding box — adversarial
    perturbations move points a little, so the box (and therefore the sort)
    stays stable across attack iterations.
    """
    lo = jnp.min(pts, axis=-2, keepdims=True)
    hi = jnp.max(pts, axis=-2, keepdims=True)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((pts - lo) * scale, 0.0, 1023.0).astype(jnp.uint32)

    def spread(v):  # interleave 10 bits with two zero bits
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return (
        spread(q[..., 0])
        | (spread(q[..., 1]) << 1)
        | (spread(q[..., 2]) << 2)
    )


def sort_cloud(pts: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Morton-sort a [b, k, 3] cloud. Returns (sorted pts, perm) where
    ``sorted[i] == pts[perm[i]]`` (perm = original ids in sorted order)."""
    codes = morton_codes(pts)
    perm = jnp.argsort(codes, axis=-1).astype(jnp.int32)
    return jnp.take_along_axis(pts, perm[..., None], axis=-2), perm


def build_block_structure(ys: jax.Array, bs: int):
    """Per-block bounding spheres of a SORTED [b, m_pad, 3] cloud.

    Returns (y_planes [b, nb*8, bs], cyr [b, 4, nb]) where y_planes packs
    block j's coordinate rows at sublane offset j*8 (rows 3-7 zero) and cyr
    rows are (c0, c1, c2, r) with r pre-inflated by the safety margin.
    Uses bbox centers (tighter radii than centroids for surface patches).
    """
    b, m_pad, _ = ys.shape
    nb = m_pad // bs
    blocks = ys.reshape(b, nb, bs, 3)
    lo = jnp.min(blocks, axis=2)
    hi = jnp.max(blocks, axis=2)
    c = 0.5 * (lo + hi)  # [b, nb, 3]
    r = jnp.sqrt(
        jnp.max(jnp.sum((blocks - c[:, :, None, :]) ** 2, axis=-1), axis=-1)
    )
    r = r * _R_MARGIN + 1e-9
    cyr = jnp.concatenate([c, r[..., None]], axis=-1)  # [b, nb, 4]
    cyr = jnp.swapaxes(cyr, -1, -2)  # [b, 4, nb]

    planes = jnp.swapaxes(blocks, -1, -2)  # [b, nb, 3, bs]
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 5), (0, 0)))
    return planes.reshape(b, nb * 8, bs), cyr


def seed_upper_bounds(x: jax.Array, cyr: jax.Array) -> jax.Array:
    """True NN-distance upper bounds: min_j (|x - c_j| + r_j)^2, inflated.

    x: [b, n, 3]; cyr: [b, 4, nb] -> [b, n] f32.
    O(n * nb) — 1/BS of the dense matrix.
    """
    c = jnp.swapaxes(cyr[:, :3, :], -1, -2)  # [b, nb, 3]
    r = cyr[:, 3, :]  # [b, nb]
    d2 = jnp.sum((x[:, :, None, :] - c[:, None, :, :]) ** 2, axis=-1)
    ub = jnp.min((jnp.sqrt(d2) + r[:, None, :]) ** 2, axis=-1)
    return ub * _UB_MARGIN + _ABS_MARGIN


def _hier_kernel(
    x_ref,  # (1, NT, 3)   x tile (sorted order for locality)
    ub_ref,  # (1, NT, 1)   seeded upper bounds
    cyr_ref,  # (1, 4, NB)  SMEM: block centers + inflated radii
    y_ref,  # (1, NB*8, BS) block coordinate planes (sublane-packed)
    oy_ref,  # (1, NB, BS)  original y ids per block
    d_ref,  # (1, NT, 1)
    i_ref=None,  # (1, NT, 1) — only passed (and written) when with_idx
    *, nb, with_idx,
):
    xt = x_ref[0]  # [NT, 3]
    x0 = xt[:, 0:1]
    x1 = xt[:, 1:2]
    x2 = xt[:, 2:3]
    d_ref[0] = ub_ref[0]
    if with_idx:
        i_ref[0] = jnp.full(i_ref.shape[1:], _BIG_IDX, jnp.int32)

    for j in range(nb):
        c0 = cyr_ref[0, 0, j]
        c1 = cyr_ref[0, 1, j]
        c2 = cyr_ref[0, 2, j]
        r = cyr_ref[0, 3, j]
        dc = (x0 - c0) ** 2 + (x1 - c1) ** 2 + (x2 - c2) ** 2  # [NT, 1]
        gap = jnp.maximum(jnp.sqrt(dc) - r, 0.0)
        lb = gap * gap * _LB_MARGIN - _ABS_MARGIN
        cur = d_ref[0]
        # `<=` (not `<`): a candidate with d == cur must still be examined
        # so min-original-id tie resolution sees every tying point.
        need = jnp.any(lb <= cur)

        @pl.when(need)
        def _compute():
            y0 = y_ref[0][j * 8 + 0 : j * 8 + 1, :]  # [1, BS] sublane off.
            y1 = y_ref[0][j * 8 + 1 : j * 8 + 2, :]
            y2 = y_ref[0][j * 8 + 2 : j * 8 + 3, :]
            dx = x0 - y0
            dy = x1 - y1
            dz = x2 - y2
            d = dx * dx + dy * dy + dz * dz  # [NT, BS]
            tmin = jnp.min(d, axis=1, keepdims=True)
            cur2 = d_ref[0]
            if with_idx:
                oy_row = oy_ref[0][j : j + 1, :]  # [1, BS] original ids
                targ = jnp.min(
                    jnp.where(d == tmin, oy_row, _BIG_IDX),
                    axis=1,
                    keepdims=True,
                )
                icur = i_ref[0]
                better = tmin < cur2
                tie = tmin == cur2
                i_ref[0] = jnp.where(
                    better, targ, jnp.where(tie, jnp.minimum(icur, targ), icur)
                )
                d_ref[0] = jnp.where(better, tmin, cur2)
            else:
                d_ref[0] = jnp.minimum(cur2, tmin)


def _nn_direction_hier(
    x: jax.Array,
    y_planes: jax.Array,
    oy: jax.Array,
    cyr: jax.Array,
    ub: jax.Array,
    *, bs: int, with_idx: bool, tile_n: int = DEFAULT_NT,
):
    """One NN direction: for each x point, min over the blocked sorted y.

    x: [b, n, 3] (any order; sorted gives tile coherence -> more pruning);
    outputs follow x's order. Returned idx are ORIGINAL y ids.
    """
    b, n, _ = x.shape
    nb8, bs_ = y_planes.shape[-2:]
    nb = nb8 // 8
    assert bs_ == bs

    n_pad = _round_up(max(n, tile_n), tile_n)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)),
                    constant_values=_PAD_COORD)
        ub = jnp.pad(ub, ((0, 0), (0, n_pad - n)), constant_values=3.0e38)

    kernel = functools.partial(_hier_kernel, nb=nb, with_idx=with_idx)
    vm = pltpu.VMEM
    out_shape = [jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, tile_n, 1), lambda i, ni: (i, ni, 0),
                     memory_space=vm)
    ]
    if with_idx:
        # the idx output only exists when the kernel writes it — a
        # min-only call must not hand back an uninitialized buffer
        out_shape.append(jax.ShapeDtypeStruct((b, n_pad, 1), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, tile_n, 1), lambda i, ni: (i, ni, 0),
                         memory_space=vm)
        )

    outs = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, 3), lambda i, ni: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, tile_n, 1), lambda i, ni: (i, ni, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 4, nb), lambda i, ni: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb * 8, bs), lambda i, ni: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, nb, bs), lambda i, ni: (i, 0, 0),
                         memory_space=vm),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            # conservative: assume ~40% of blocks computed
            flops=5 * b * n_pad * nb * bs,
            bytes_accessed=b * (n_pad * 16 + nb * bs * 16),
            transcendentals=b * (n_pad // tile_n) * nb,
        ),
    )(x.astype(jnp.float32), ub.astype(jnp.float32)[..., None],
      cyr, y_planes, oy)
    d = outs[0]
    if not with_idx:
        return d[:, :n, 0], None
    return d[:, :n, 0], outs[1][:, :n, 0]


def _prep_target_sorted(ys: jax.Array, perm: jax.Array, bs: int):
    """Block an ALREADY Morton-sorted target cloud (``sort_cloud`` output):
    returns (y_planes, oy, cyr). Split from :func:`_prep_target` so
    ``nn_distance_hier`` can reuse the one sort it already did per cloud
    instead of sorting each cloud twice (the sorts + inverse-perm gathers
    dominate this kernel's cost — see the module negative-result note)."""
    b, m, _ = ys.shape
    m_pad = _round_up(max(m, bs), bs)
    if m_pad != m:
        ys = jnp.pad(ys, ((0, 0), (0, m_pad - m), (0, 0)),
                     constant_values=_PAD_COORD)
        perm = jnp.pad(perm, ((0, 0), (0, m_pad - m)),
                       constant_values=_BIG_IDX)
    y_planes, cyr = build_block_structure(ys, bs)
    oy = perm.reshape(b, m_pad // bs, bs)
    return y_planes, oy, cyr


def _prep_target(y: jax.Array, bs: int):
    """Sort + block a target cloud: returns (y_planes, oy, cyr)."""
    ys, perm = sort_cloud(y.astype(jnp.float32))
    return _prep_target_sorted(ys, perm, bs)


def nn_direction_sorted(x: jax.Array, y: jax.Array, *, bs: int | None = None,
                        with_idx: bool = True):
    """For each x[i]: (min_j |x_i - y_j|^2, argmin ORIGINAL j) — pruned.

    x order is preserved in the outputs; callers that control x's order
    should pass it Morton-sorted for maximum pruning (spatially coherent
    tiles share candidate blocks).
    """
    b, m, _ = y.shape
    bs = bs or _pick_bs(_round_up(max(m, DEFAULT_BS), DEFAULT_BS))
    y_planes, oy, cyr = _prep_target(y, bs)
    ub = seed_upper_bounds(x.astype(jnp.float32), cyr)
    return _nn_direction_hier(
        x.astype(jnp.float32), y_planes, oy, cyr, ub,
        bs=bs, with_idx=with_idx,
    )


def _inverse_perm(perm: jax.Array) -> jax.Array:
    """[b, k] permutation -> inverse (scatter of iota)."""
    b, k = perm.shape
    iota = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (b, k))
    inv = jnp.zeros((b, k), jnp.int32)
    return jax.vmap(lambda z, p, v: z.at[p].set(v))(inv, perm, iota)


@jax.jit
def nn_distance_hier(x: jax.Array, y: jax.Array):
    """Drop-in exact nn_distance via pruned direction kernels.

    Same contract as nn_distance_pallas_v2: [b,n,3],[b,m,3] ->
    (d1 [b,n], i1 [b,n], d2 [b,m], i2 [b,m]) in ORIGINAL point order with
    first-occurrence argmin ties. Both clouds are Morton-sorted internally;
    outputs are unsorted back.
    """
    lead = x.shape[:-2]
    n, m = x.shape[-2], y.shape[-2]
    x3 = x.reshape((-1, n, 3)).astype(jnp.float32)
    y3 = y.reshape((-1, m, 3)).astype(jnp.float32)

    xs, perm_x = sort_cloud(x3)
    ys, perm_y = sort_cloud(y3)

    # each cloud is sorted ONCE and reused as both query (xs/ys) and
    # blocked target (_prep_target_sorted) — two sorts total, not four
    bs_y = _pick_bs(_round_up(max(m, DEFAULT_BS), DEFAULT_BS))
    y_planes, oy, cyr_y = _prep_target_sorted(ys, perm_y, bs_y)
    ub1 = seed_upper_bounds(xs, cyr_y)
    d1s, i1s = _nn_direction_hier(  # follows xs order, ids original
        xs, y_planes, oy, cyr_y, ub1, bs=bs_y, with_idx=True
    )
    bs_x = _pick_bs(_round_up(max(n, DEFAULT_BS), DEFAULT_BS))
    x_planes, ox, cyr_x = _prep_target_sorted(xs, perm_x, bs_x)
    ub2 = seed_upper_bounds(ys, cyr_x)
    d2s, i2s = _nn_direction_hier(
        ys, x_planes, ox, cyr_x, ub2, bs=bs_x, with_idx=True
    )

    inv_x = _inverse_perm(perm_x)
    inv_y = _inverse_perm(perm_y)
    d1 = jnp.take_along_axis(d1s, inv_x, axis=-1)
    i1 = jnp.take_along_axis(i1s, inv_x, axis=-1)
    d2 = jnp.take_along_axis(d2s, inv_y, axis=-1)
    i2 = jnp.take_along_axis(i2s, inv_y, axis=-1)
    return (
        d1.reshape(lead + (n,)),
        i1.reshape(lead + (n,)),
        d2.reshape(lead + (m,)),
        i2.reshape(lead + (m,)),
    )
