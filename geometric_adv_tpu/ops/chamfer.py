"""Chamfer / nearest-neighbor distance (the reference's ``nn_distance`` op).

Contract (reference: external/structural_losses/tf_nndistance.py:15-26):

    nn_distance(xyz1[b, n, 3], xyz2[b, m, 3])
        -> (dist1[b, n], idx1[b, n], dist2[b, m], idx2[b, m])

``dist*`` are **squared** L2 distances to the nearest neighbor in the other
cloud; ``idx*`` are the argmin indices. The gradient matches the reference's
hand-written scatter-add backward (reference:
external/structural_losses/tf_nndistance.cpp:130-163): each of the four pair
terms contributes ``2 * g * (a - b)`` to its endpoints; the integer index
outputs carry no gradient.

TPU design notes
----------------
Two pairwise-distance formulations are provided:

- ``"direct"``: ``sum((x - y)**2)`` over the coordinate axis, computed on the
  VPU. Bit-comparable with a brute-force numpy double loop — this is the
  semantics the reference CUDA kernel implements
  (reference: external/structural_losses/tf_nndistance_g.cu:5-30).
- ``"mxu"``: ``|x|^2 + |y|^2 - 2 x @ y.T``, which lands the O(n*m) work on the
  MXU systolic array. Used for throughput-critical jobs (the 4379^2 chamfer
  NN matrix) where ~1e-6 absolute drift from cancellation is acceptable.

Both are static-shape, fuse under ``jit``, and vmap/shard cleanly. A fused
Pallas kernel (min/argmin computed tile-by-tile without materialising the
[n, m] matrix in HBM) lives in ``ops/pallas/chamfer_kernel_v2.py`` and is
used automatically on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def pairwise_sqdist(x: Array, y: Array, method: str = "direct") -> Array:
    """Squared L2 distance matrix between two point sets.

    Args:
        x: [..., n, 3] points.
        y: [..., m, 3] points.
        method: "direct" (VPU, exact) or "mxu" (matmul formulation).

    Returns:
        [..., n, m] squared distances.
    """
    if method == "direct":
        d = x[..., :, None, :] - y[..., None, :, :]
        return jnp.sum(d * d, axis=-1)
    elif method == "mxu":
        xx = jnp.sum(x * x, axis=-1)
        yy = jnp.sum(y * y, axis=-1)
        xy = jnp.einsum(
            "...nc,...mc->...nm", x, y, preferred_element_type=jnp.float32
        )
        d = xx[..., :, None] + yy[..., None, :] - 2.0 * xy
        return jnp.maximum(d, 0.0)
    raise ValueError(f"unknown pairwise_sqdist method: {method!r}")


def _nn_one_side(sqd: Array) -> tuple[Array, Array]:
    """Min + argmin over the last axis of a [..., n, m] distance matrix."""
    return jnp.min(sqd, axis=-1), jnp.argmin(sqd, axis=-1).astype(jnp.int32)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _nn_distance_fwd_impl(xyz1: Array, xyz2: Array, method: str):
    if method == "auto":
        method = "pallas" if _on_tpu() else "direct"
    if method == "pallas":
        if _on_tpu():
            # v2: direct-difference VPU kernel — bit-exact vs the XLA direct
            # path and ~5x faster than the MXU-expansion v1 at K=3.
            from geometric_adv_tpu.ops.pallas.chamfer_kernel_v2 import (
                nn_distance_pallas_v2,
            )

            return nn_distance_pallas_v2(xyz1, xyz2)
        method = "direct"  # CPU fallback: same contract, pure XLA
    sqd = pairwise_sqdist(xyz1, xyz2, method=method)
    dist1, idx1 = _nn_one_side(sqd)
    dist2, idx2 = _nn_one_side(jnp.swapaxes(sqd, -1, -2))
    return dist1, idx1, dist2, idx2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def nn_distance(
    xyz1: Array, xyz2: Array, method: str = "auto"
) -> tuple[Array, Array, Array, Array]:
    """Bidirectional nearest-neighbor squared distances + indices.

    Mirrors reference: external/structural_losses/tf_nndistance.py:15.
    Supports arbitrary leading batch dims.
    """
    return _nn_distance_fwd_impl(xyz1, xyz2, method)


def _nn_distance_fwd(xyz1, xyz2, method):
    dist1, idx1, dist2, idx2 = _nn_distance_fwd_impl(xyz1, xyz2, method)
    return (dist1, idx1, dist2, idx2), (xyz1, xyz2, idx1, idx2)


def _take_points(pts: Array, idx: Array) -> Array:
    """Gather pts[..., idx, :] along the point axis with batched indices."""
    return jnp.take_along_axis(pts, idx[..., None].astype(jnp.int32), axis=-2)


def _nn_distance_bwd(method, res, cotangents):
    del method
    xyz1, xyz2, idx1, idx2 = res
    g_dist1, _, g_dist2, _ = cotangents  # index cotangents are zero/float0

    if _on_tpu():
        # Fully fused backward: gather + scatter as masked MXU matmuls
        # (XLA's TPU gather/scatter serialize; see chamfer_bwd_kernel.py).
        # grad2 is the same computation with the two clouds swapped; the
        # unused direction is dead-code-eliminated by XLA.
        from geometric_adv_tpu.ops.pallas.chamfer_bwd_kernel import (
            chamfer_grad1_pallas,
        )

        grad1 = chamfer_grad1_pallas(
            xyz1, xyz2, idx1, idx2, g_dist1, g_dist2
        )
        grad2 = chamfer_grad1_pallas(
            xyz2, xyz1, idx2, idx1, g_dist2, g_dist1
        )
        return grad1, grad2

    # Forward pairs: (x1[i], x2[idx1[i]]) and (x2[j], x1[idx2[j]]).
    # d(dist)/dx = 2*(x - nn(x)); scatter-add the opposite endpoint
    # (reference: external/structural_losses/tf_nndistance.cpp:130-163).
    nn12 = _take_points(xyz2, idx1)  # [..., n, 3] = xyz2 gathered at idx1
    nn21 = _take_points(xyz1, idx2)  # [..., m, 3]

    t1 = 2.0 * g_dist1[..., None] * (xyz1 - nn12)  # contribution of dist1
    t2 = 2.0 * g_dist2[..., None] * (xyz2 - nn21)  # contribution of dist2

    # grad_xyz1 = t1  - scatter_add of t2 at idx2
    # grad_xyz2 = t2  - scatter_add of t1 at idx1
    # pure-XLA fallback (the TPU path returned above via the fused kernel)
    def scatter_add(target_like, idx, updates):
        zeros = jnp.zeros_like(target_like)
        # flatten leading batch dims for a single scatter
        flat_zeros = zeros.reshape((-1,) + zeros.shape[-2:])
        flat_idx = idx.reshape((flat_zeros.shape[0], -1))
        flat_upd = updates.reshape((flat_zeros.shape[0], -1, updates.shape[-1]))
        out = jax.vmap(lambda z, i, u: z.at[i].add(u))(
            flat_zeros, flat_idx, flat_upd
        )
        return out.reshape(zeros.shape)

    grad1 = t1 - scatter_add(xyz1, idx2, t2)
    grad2 = t2 - scatter_add(xyz2, idx1, t1)
    return grad1, grad2


nn_distance.defvjp(_nn_distance_fwd, _nn_distance_bwd)


def nn_distance_values(
    xyz1: Array, xyz2: Array, method: str = "auto"
) -> tuple[Array, Array]:
    """Bidirectional NN squared distances only — no argmin indices.

    Non-differentiable fast path for consumers that never read the indices
    (the all-pairs chamfer matrix job): on TPU the min-only Pallas kernel
    skips the argmin bookkeeping (~40% of the VPU ops of the full kernel).
    Same distance semantics as ``nn_distance``.
    """
    if method == "auto":
        method = "pallas" if _on_tpu() else "direct"
    if method == "pallas":
        if _on_tpu():
            from geometric_adv_tpu.ops.pallas.chamfer_kernel_v2 import (
                nn_distance_values_pallas,
            )

            return nn_distance_values_pallas(xyz1, xyz2)
        method = "direct"
    sqd = pairwise_sqdist(xyz1, xyz2, method=method)
    return jnp.min(sqd, axis=-1), jnp.min(sqd, axis=-2)


# escape hatch / A-B switch for the fused loss+grad kernel path.
# Tri-state: None (default) = library auto-routing (fused only for
# n <= 1024, see _fused_loss_supported); True = force fused wherever the
# kernel exists (n <= 2048); False = force composed everywhere. CLIs set
# True/False when --chamfer_impl forces an implementation process-wide.
FUSED_LOSS_ENABLED = None


def _fused_loss_shape_ok(n: int) -> bool:
    """Shape-only support gate for the fused loss+payload kernel (the
    single-tile kernel covers n <= 1024, the 2-subtile variant n <= 2048).
    Deliberately independent of FUSED_LOSS_ENABLED so the attack runner's
    calibration gate is not disabled by an earlier composed decision."""
    return max(n, 256) <= 2048


def _fused_loss_supported(n: int) -> bool:
    # UNCALIBRATED auto-routing admits the fused kernel only for n <= 1024;
    # the n <= 2048 2-subtile variant is reachable through explicit binding
    # (``method="fused"`` / AttackRunner's per-runner calibration, gated by
    # _fused_loss_shape_ok). Rationale, all measured on the v5e:
    #
    # - The round-4 wide-m retune (chamfer_loss_kernel.TILE_M_2N=2048,
    #   vmem_limit 100M) put the 2-subtile KERNEL ahead of the composed
    #   fwd+bwd pair in isolation (12.8 vs ~15 ms/call at [250, 2048^2],
    #   bit-exact) — but every WORKLOAD-level A/B at 2048 favored composed:
    #   attack 13.2k vs 7.1k pair-iters/s (2026-08-19; the calibrator's own
    #   in-step measurement read 7.4k vs 6.2k the same day), train epoch
    #   6,599 vs 6,089 samples/s (+8.4%). The gap is scheduling/pipelining
    #   against the encoder backward, not kernel quality — so the
    #   UNCALIBRATED default for 2048-pt trainer/eval users is composed,
    #   and the 2048 fused kernel is only taken when a calibrator measured
    #   it winning on the live chip.
    # - At n <= 1024 the ordering is CHIP-STATE DEPENDENT (fused +4-5% in
    #   round 2; composed +32% on 2026-08-17), which is what the per-runner
    #   calibration exists for; auto keeps fused reachable there for
    #   parity with the calibrated paths.
    #
    # FUSED_LOSS_ENABLED is the process-wide escape hatch for pipelines:
    # forcing True reaches the fused kernel at EVERY supported shape
    # (n <= 2048), so --chamfer_impl fused stays honored at 2048 for
    # method="auto" call sites outside a calibrated runner too.
    if FUSED_LOSS_ENABLED is None:
        return max(n, 256) <= 1024
    return FUSED_LOSS_ENABLED and _fused_loss_shape_ok(n)


@jax.custom_vjp
def _chamfer_per_pc_fused(x1: Array, x2: Array) -> Array:
    """mean(d1) + mean(d2) per cloud; under differentiation the fwd rule
    runs the fused loss+grad-payload kernel
    (ops/pallas/chamfer_loss_kernel.py). This primal runs only for
    NON-differentiated calls (eval/metrics paths), where the min-only kernel
    does the same job in ~1/3 the VPU passes."""
    from geometric_adv_tpu.ops.pallas.chamfer_kernel_v2 import (
        nn_distance_values_pallas,
    )

    d1, d2 = nn_distance_values_pallas(x1, x2)
    return jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)


def _chamfer_per_pc_fused_fwd(x1, x2):
    from geometric_adv_tpu.ops.pallas.chamfer_loss_kernel import (
        chamfer_loss_payloads,
    )

    d1, i1, d2, i2, nn1, snn1, cnt1 = chamfer_loss_payloads(x1, x2)
    loss = jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)
    return loss, (x1, x2, i1, i2, nn1, snn1, cnt1)


def _chamfer_per_pc_fused_bwd(res, g):
    x1, x2, i1, i2, nn1, snn1, cnt1 = res
    n = x1.shape[-2]
    m = x2.shape[-2]
    gexp = g[..., None, None]
    # reference formula (tf_nndistance.cpp:130-163) with the per-pc mean's
    # uniform weights folded in; payloads make this pure elementwise
    grad1 = gexp * (
        (2.0 / n) * (x1 - nn1)
        + (2.0 / m) * (x1 * cnt1[..., None] - snn1)
    )
    # grad2 (same structure, other side) goes through the general payload-
    # free kernel; XLA removes it when the cotangent path is unused (the
    # attack differentiates w.r.t. x1 only).
    if _on_tpu():
        from geometric_adv_tpu.ops.pallas.chamfer_bwd_kernel import (
            chamfer_grad1_pallas,
        )

        g1v = jnp.broadcast_to(g[..., None] / n, x1.shape[:-1])
        g2v = jnp.broadcast_to(g[..., None] / m, x2.shape[:-1])
        grad2 = chamfer_grad1_pallas(x2, x1, i2, i1, g2v, g1v)
    else:
        # XLA fallback (interpret-mode tests / CPU): same reference formula
        x1_at_i2 = _take_points(x1, i2)  # [..., m, 3]

        def seg(upd3, upd1):
            flat_i = i1.reshape((-1,) + i1.shape[-1:])
            flat_u3 = upd3.reshape((-1,) + upd3.shape[-2:])
            flat_u1 = upd1.reshape((-1,) + upd1.shape[-1:])
            z3 = jnp.zeros((flat_i.shape[0], m, 3), x2.dtype)
            z1 = jnp.zeros((flat_i.shape[0], m), x2.dtype)
            s3 = jax.vmap(lambda z, i, u: z.at[i].add(u))(z3, flat_i, flat_u3)
            s1 = jax.vmap(lambda z, i, u: z.at[i].add(u))(z1, flat_i, flat_u1)
            return (
                s3.reshape(x2.shape),
                s1.reshape(x2.shape[:-1]),
            )

        sx1, cnt2 = seg(x1, jnp.ones(x1.shape[:-1], x1.dtype))
        grad2 = gexp * (
            (2.0 / m) * (x2 - x1_at_i2)
            + (2.0 / n) * (x2 * cnt2[..., None] - sx1)
        )
    return grad1, grad2


_chamfer_per_pc_fused.defvjp(_chamfer_per_pc_fused_fwd, _chamfer_per_pc_fused_bwd)


def chamfer_loss_per_pc(pred: Array, gt: Array, method: str = "auto") -> Array:
    """Per-cloud Chamfer distance: mean(d1) + mean(d2) of squared L2 NN dists.

    Matches the per-pc attack metric (reference: src/adv_ae.py:118-121) and,
    averaged over the batch, the AE training loss
    (reference: src/pointnet_ae.py:74-76). On TPU (n small enough for the
    single-tile kernel) the loss+grad run as one fused pass.

    ``method``: "auto" routes fused-vs-composed via the module-global
    FUSED_LOSS_ENABLED (read at TRACE time — process-wide); "fused" /
    "composed" bind the choice explicitly at the call site, which is how
    AttackRunner applies its per-runner calibration decision without
    touching process state. "fused" falls back to composed where the
    kernel does not apply (CPU, n > 2048).
    """
    if method == "fused":
        if _on_tpu() and _fused_loss_shape_ok(pred.shape[-2]):
            return _chamfer_per_pc_fused(pred, gt)
        method = "auto"  # composed fallback (nn_distance auto-routing)
    elif method == "composed":
        method = "auto"  # skip the fused branch below
    elif method == "auto" and _on_tpu() and _fused_loss_supported(
        pred.shape[-2]
    ):
        return _chamfer_per_pc_fused(pred, gt)
    d1, _, d2, _ = nn_distance(pred, gt, method)
    return jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)


def chamfer_frozen_payloads(
    x1: Array, x2: Array, method: str = "auto"
) -> tuple[Array, Array, Array, Array, Array]:
    """(d1, d2, nn1, snn1, cnt1) — everything the frozen-assignment
    ("temporal-coherence") chamfer evaluation carries between refreshes.

    With the NN assignments FROZEN at the state where this was computed,
    the chamfer loss and its gradient w.r.t. ``x1`` become pure elementwise
    expressions of these payloads (no gathers/scatters):

        d1_frozen(x1')[i] = ||x1'[i] - nn1[i]||^2
        sum_j d2_frozen(x1')[j]
            = sum(d2) - 2 sum_i delta[i].r[i] + sum_i cnt1[i] ||delta[i]||^2
        where delta = x1' - x1, r = snn1 - cnt1*x1
        (the difference-correction form; the expanded quadratic
        ``|x2|^2 - 2 x1.snn + cnt|x1|^2`` cancels catastrophically at f32)

    and autodiff of those forms reproduces the reference's exact scatter-add
    backward (tf_nndistance.cpp:130-163) for the frozen assignments, which
    equals the true chamfer gradient wherever the argmins are unchanged.
    The attack's fast mode (attack/core.py, ``chamfer_refresh``) exploits
    that the two clouds of each attack chamfer move slowly across the
    500-iteration scan, so assignments stay valid for many steps.

    Payload meanings (reference backward formula):
        nn1[i]  = x2[idx1[i]]                      (NN coords of x1 in x2)
        snn1[i] = sum_{j: idx2[j]==i} x2[j]        (reverse scatter sum)
        cnt1[i] = #{j: idx2[j]==i}                 (reverse scatter count)

    NOT differentiable — callers compute payloads outside the
    differentiated region (they are constants of the frozen evaluation).
    On TPU (n <= 2048) one fused kernel pass produces everything
    (ops/pallas/chamfer_loss_kernel.py); elsewhere a composed
    nn_distance + scatter-add fallback with identical semantics.
    """
    n = x1.shape[-2]
    if method == "auto":
        method = (
            "kernel"
            if _on_tpu() and _fused_loss_shape_ok(n)
            else "composed"
        )
    if method == "kernel":
        from geometric_adv_tpu.ops.pallas.chamfer_loss_kernel import (
            chamfer_loss_payloads,
        )

        d1, _, d2, _, nn1, snn1, cnt1 = chamfer_loss_payloads(x1, x2)
        return d1, d2, nn1, snn1, cnt1

    d1, i1, d2, i2 = _nn_distance_fwd_impl(
        x1, x2, "direct" if not _on_tpu() else "auto"
    )
    nn1 = _take_points(x2, i1)
    flat_i = i2.reshape((-1,) + i2.shape[-1:])
    flat_x2 = x2.reshape((-1,) + x2.shape[-2:])
    z3 = jnp.zeros((flat_i.shape[0], n, 3), x1.dtype)
    z1 = jnp.zeros((flat_i.shape[0], n), x1.dtype)
    snn1 = jax.vmap(lambda z, i, u: z.at[i].add(u))(z3, flat_i, flat_x2)
    cnt1 = jax.vmap(lambda z, i: z.at[i].add(1.0))(z1, flat_i)
    lead = x1.shape[:-2]
    return (
        d1,
        d2,
        nn1,
        snn1.reshape(lead + (n, 3)),
        cnt1.reshape(lead + (n,)),
    )


def chamfer_loss(pred: Array, gt: Array, method: str = "auto") -> Array:
    """Scalar Chamfer loss: mean over all points in the batch, both directions.

    reference: src/pointnet_ae.py:74-76 (reduce_mean over the full [b, n]
    tensors, i.e. equals mean over batch of chamfer_loss_per_pc).
    """
    d1, _, d2, _ = nn_distance(pred, gt, method)
    return jnp.mean(d1) + jnp.mean(d2)


def fscore(
    dist1: Array, dist2: Array, threshold: float = 0.001
) -> tuple[Array, Array, Array]:
    """F-score of two clouds from their squared NN distances.

    reference: transfer/atlasnet/auxiliary/ChamferDistancePytorch/fscore.py:
    3-16 — precision_i = fraction of points with squared dist < threshold;
    fscore = harmonic mean, 0 where undefined.
    """
    precision_1 = jnp.mean((dist1 < threshold).astype(jnp.float32), axis=-1)
    precision_2 = jnp.mean((dist2 < threshold).astype(jnp.float32), axis=-1)
    denom = precision_1 + precision_2
    f = jnp.where(
        denom > 0, 2 * precision_1 * precision_2 / jnp.maximum(denom, 1e-12),
        0.0,
    )
    return f, precision_1, precision_2
