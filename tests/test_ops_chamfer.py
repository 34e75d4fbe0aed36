"""nn_distance vs a brute-force numpy reference.

Acceptance bars follow the reference's own op tests: CUDA-vs-python chamfer
agreement to 1e-8 (reference: ChamferDistancePytorch/unit_test.py:24-33) and
index equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometric_adv_tpu.ops import chamfer_loss, chamfer_loss_per_pc, nn_distance


def nn_distance_np(xyz1, xyz2):
    """Brute-force reference: squared L2 NN distances + argmin indices."""
    d = np.sum(
        (xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2, axis=-1
    )  # [b, n, m]
    return (
        d.min(axis=2),
        d.argmin(axis=2).astype(np.int32),
        d.min(axis=1),
        d.argmin(axis=1).astype(np.int32),
    )


@pytest.mark.parametrize("n,m", [(64, 64), (128, 48), (37, 91)])
def test_forward_matches_numpy(rng, n, m):
    xyz1 = rng.randn(4, n, 3).astype(np.float32)
    xyz2 = rng.randn(4, m, 3).astype(np.float32)
    d1, i1, d2, i2 = jax.jit(nn_distance)(xyz1, xyz2)
    rd1, ri1, rd2, ri2 = nn_distance_np(xyz1, xyz2)
    np.testing.assert_allclose(d1, rd1, atol=1e-8, rtol=1e-6)
    np.testing.assert_allclose(d2, rd2, atol=1e-8, rtol=1e-6)
    np.testing.assert_array_equal(i1, ri1)
    np.testing.assert_array_equal(i2, ri2)


def test_mxu_method_close(rng):
    xyz1 = rng.rand(2, 128, 3).astype(np.float32)
    xyz2 = rng.rand(2, 96, 3).astype(np.float32)
    d1, _, d2, _ = nn_distance(xyz1, xyz2, method="mxu")
    rd1, _, rd2, _ = nn_distance_np(xyz1, xyz2)
    # matmul formulation trades ~1e-6 cancellation error for MXU throughput
    np.testing.assert_allclose(d1, rd1, atol=2e-6)
    np.testing.assert_allclose(d2, rd2, atol=2e-6)


def test_gradient_matches_reference_formula(rng):
    """Backward must equal the hand-written scatter-add gradient
    (reference: external/structural_losses/tf_nndistance.cpp:130-163)."""
    b, n, m = 2, 32, 24
    xyz1 = rng.randn(b, n, 3).astype(np.float32)
    xyz2 = rng.randn(b, m, 3).astype(np.float32)
    g1 = rng.randn(b, n).astype(np.float32)
    g2 = rng.randn(b, m).astype(np.float32)

    def f(x1, x2):
        d1, _, d2, _ = nn_distance(x1, x2)
        return jnp.sum(d1 * g1) + jnp.sum(d2 * g2)

    grad1, grad2 = jax.grad(f, argnums=(0, 1))(xyz1, xyz2)

    _, ri1, _, ri2 = nn_distance_np(xyz1, xyz2)
    ref1 = np.zeros_like(xyz1)
    ref2 = np.zeros_like(xyz2)
    for bi in range(b):
        for i in range(n):
            j = ri1[bi, i]
            t = 2 * g1[bi, i] * (xyz1[bi, i] - xyz2[bi, j])
            ref1[bi, i] += t
            ref2[bi, j] -= t
        for j in range(m):
            i = ri2[bi, j]
            t = 2 * g2[bi, j] * (xyz2[bi, j] - xyz1[bi, i])
            ref2[bi, j] += t
            ref1[bi, i] -= t
    np.testing.assert_allclose(grad1, ref1, atol=1e-5)
    np.testing.assert_allclose(grad2, ref2, atol=1e-5)


def test_gradient_vs_finite_differences(rng):
    xyz1 = rng.randn(1, 16, 3).astype(np.float64)
    xyz2 = rng.randn(1, 12, 3).astype(np.float64)

    def loss(x1):
        return chamfer_loss(x1, jnp.asarray(xyz2))

    g = jax.grad(loss)(jnp.asarray(xyz1))
    eps = 1e-6
    for idx in [(0, 0, 0), (0, 5, 1), (0, 15, 2)]:
        xp = xyz1.copy()
        xp[idx] += eps
        xm = xyz1.copy()
        xm[idx] -= eps
        fd = (loss(jnp.asarray(xp)) - loss(jnp.asarray(xm))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=1e-4, atol=1e-7)


def test_per_pc_loss_reduction(rng):
    x = rng.randn(5, 40, 3).astype(np.float32)
    y = rng.randn(5, 40, 3).astype(np.float32)
    per_pc = chamfer_loss_per_pc(x, y)
    total = chamfer_loss(x, y)
    assert per_pc.shape == (5,)
    np.testing.assert_allclose(np.mean(per_pc), total, rtol=1e-6)


def test_vmap_and_unbatched(rng):
    """Op supports arbitrary leading dims (vmapped attack grids)."""
    x = rng.randn(2, 3, 20, 3).astype(np.float32)
    y = rng.randn(2, 3, 20, 3).astype(np.float32)
    d1, _, _, _ = nn_distance(x, y)
    assert d1.shape == (2, 3, 20)
    d1v, _, _, _ = jax.vmap(nn_distance)(x, y)
    np.testing.assert_allclose(d1, d1v, atol=1e-7)


def test_nn_distance_values(rng):
    """Min-only fast path matches the full op's distances exactly."""
    from geometric_adv_tpu.ops.chamfer import nn_distance_values

    x = rng.randn(4, 33, 3).astype(np.float32)
    y = rng.randn(4, 57, 3).astype(np.float32)
    d1, _, d2, _ = nn_distance(x, y)
    v1, v2 = nn_distance_values(x, y)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(v2))


def test_fused_loss_kernel_interpret_mode(rng):
    """The fused loss+grad-payload kernel (ops/pallas/chamfer_loss_kernel.py)
    matches the composed path — values bit-wise, grads to float tolerance —
    run in Pallas interpreter mode on CPU (the TPU path is the same kernel).
    Includes duplicate points so argmin tie-handling (first occurrence,
    reference scatter semantics) is exercised."""
    from jax.experimental.pallas import tpu as pltpu

    from geometric_adv_tpu.ops.chamfer import _chamfer_per_pc_fused

    x1 = rng.randn(2, 70, 3).astype(np.float32)
    x2 = rng.randn(2, 50, 3).astype(np.float32)
    x2[:, 5] = x2[:, 17]  # argmin ties
    x1[:, 9] = x1[:, 40]
    w = rng.rand(2).astype(np.float32)

    def composed(a, b):
        d1, _, d2, _ = nn_distance(a, b, method="direct")
        return jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)

    with pltpu.force_tpu_interpret_mode():
        loss_f = np.asarray(_chamfer_per_pc_fused(x1, x2))
        g1f, g2f = jax.grad(
            lambda a, b: jnp.sum(_chamfer_per_pc_fused(a, b) * w),
            argnums=(0, 1),
        )(x1, x2)
    loss_c = np.asarray(composed(x1, x2))
    g1c, g2c = jax.grad(
        lambda a, b: jnp.sum(composed(a, b) * w), argnums=(0, 1)
    )(x1, x2)

    np.testing.assert_array_equal(loss_f, loss_c)
    np.testing.assert_allclose(np.asarray(g1f), np.asarray(g1c), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2f), np.asarray(g2c), atol=1e-6)


def test_fused_loss_kernel_2n_interpret_mode(rng):
    """The 2-subtile (n_pad=2048) fused kernel variant matches the composed
    path — exercised with n that pads above 1024, including a nearest
    neighbor that lives in the SECOND subtile and duplicate-point ties."""
    from jax.experimental.pallas import tpu as pltpu

    from geometric_adv_tpu.ops.chamfer import _chamfer_per_pc_fused

    x1 = rng.randn(1, 1100, 3).astype(np.float32)
    x2 = rng.randn(1, 300, 3).astype(np.float32)
    x1[0, 1050] = x2[0, 7] + 1e-3  # subtile-1 row wins a column argmin
    x2[0, 5] = x2[0, 17]  # ties
    x1[0, 9] = x1[0, 1040]  # cross-subtile duplicate -> cross-tile tie
    w = rng.rand(1).astype(np.float32)

    def composed(a, b):
        d1, _, d2, _ = nn_distance(a, b, method="direct")
        return jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)

    with pltpu.force_tpu_interpret_mode():
        loss_f = np.asarray(_chamfer_per_pc_fused(x1, x2))
        g1f, g2f = jax.grad(
            lambda a, b: jnp.sum(_chamfer_per_pc_fused(a, b) * w),
            argnums=(0, 1),
        )(x1, x2)
    loss_c = np.asarray(composed(x1, x2))
    g1c, g2c = jax.grad(
        lambda a, b: jnp.sum(composed(a, b) * w), argnums=(0, 1)
    )(x1, x2)

    np.testing.assert_array_equal(loss_f, loss_c)
    np.testing.assert_allclose(np.asarray(g1f), np.asarray(g1c), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2f), np.asarray(g2c), atol=1e-6)


def test_bwd_kernel_split3_interpret_mode(rng):
    """The one-hot-matmul backward's split3_bf16 contraction (the round-3
    default, ops/pallas/chamfer_bwd_kernel.py) matches both the exact-f32
    "highest_f32" contraction and the reference scatter-add formula, run in
    Pallas interpreter mode on CPU. The three bf16 mantissa-split passes
    make every mask product exact, so agreement is f32-summation-order
    level (the on-device bound is pinned by cli/verify_tpu.py)."""
    from jax.experimental.pallas import tpu as pltpu

    import geometric_adv_tpu.ops.pallas.chamfer_bwd_kernel as bwd_mod

    x1 = rng.randn(2, 70, 3).astype(np.float32)
    x2 = rng.randn(2, 50, 3).astype(np.float32)
    g1 = rng.rand(2, 70).astype(np.float32)
    g2 = rng.rand(2, 50).astype(np.float32)
    d1, i1, d2, i2 = nn_distance(x1, x2, method="direct")
    i1 = np.asarray(i1)
    i2 = np.asarray(i2)

    def run(impl):
        orig = bwd_mod.MATMUL_IMPL
        bwd_mod.MATMUL_IMPL = impl
        bwd_mod.chamfer_grad1_pallas.clear_cache()
        try:
            with pltpu.force_tpu_interpret_mode():
                return np.asarray(
                    bwd_mod.chamfer_grad1_pallas(x1, x2, i1, i2, g1, g2)
                )
        finally:
            bwd_mod.MATMUL_IMPL = orig
            bwd_mod.chamfer_grad1_pallas.clear_cache()

    out_split = run("split3_bf16")
    out_highest = run("highest_f32")

    # reference formula: t1 - scatter_add(t2, idx2) per
    # external/structural_losses/tf_nndistance.cpp:130-163
    nn12 = np.take_along_axis(x2, i1[..., None], axis=-2)
    t1 = 2.0 * g1[..., None] * (x1 - nn12)
    ref = t1.copy()
    for b in range(x1.shape[0]):
        for j in range(x2.shape[1]):
            ref[b, i2[b, j]] -= 2.0 * g2[b, j] * (
                x2[b, j] - x1[b, i2[b, j]]
            )
    np.testing.assert_allclose(out_split, out_highest, atol=2e-6)
    np.testing.assert_allclose(out_split, ref, atol=2e-6)


def test_v2_forward_kernel_interpret_mode(rng, monkeypatch):
    """The v2 argmin forward + min-only values kernels vs the XLA-direct
    path, in Pallas interpreter mode on CPU, pinning the kernel MATH
    (distance arithmetic, within-tile first-occurrence tie selection).

    Single-tile only: the production grid accumulates d2 by revisiting its
    output block once per n-tile, which real TPU grids support but the
    interpreter's revisit checker rejects (revisits are only tolerated on
    the fastest grid dim) — so tiles are forced to the full padded extent
    here, and the cross-tile accumulation/tie path is covered on hardware
    by cli/verify_tpu.py instead.
    """
    from jax.experimental.pallas import tpu as pltpu

    from geometric_adv_tpu.ops import pallas as _  # noqa: F401
    from geometric_adv_tpu.ops.chamfer import nn_distance
    from geometric_adv_tpu.ops.pallas import chamfer_kernel_v2 as k

    monkeypatch.setattr(k, "_pick_tile_n", lambda n_pad: n_pad)
    monkeypatch.setattr(k, "_pick_tile_m", lambda m_pad: m_pad)
    monkeypatch.setattr(k, "_pick_tile", lambda size: size)
    k.nn_distance_pallas_v2.clear_cache()
    k.nn_distance_values_pallas.clear_cache()

    x = (rng.rand(2, 300, 3) - 0.5).astype(np.float32)
    y = (rng.rand(2, 520, 3) - 0.5).astype(np.float32)
    # exact-duplicate y points: the argmin must keep the FIRST occurrence
    y[:, 519] = y[:, 7]
    # and a duplicate x pair for the d2 direction
    x[:, 299] = x[:, 3]

    d1_ref, i1_ref, d2_ref, i2_ref = nn_distance(x, y)

    try:
        with pltpu.force_tpu_interpret_mode():
            d1, i1, d2, i2 = k.nn_distance_pallas_v2(x, y)
            dv1, dv2 = k.nn_distance_values_pallas(x, y)
    finally:
        k.nn_distance_pallas_v2.clear_cache()
        k.nn_distance_values_pallas.clear_cache()

    # values: 1e-8 bar — XLA:CPU contracts the interpreter's mul/add chain
    # into FMAs differently than the direct path (~2e-9); on TPU hardware
    # the two are bit-equal (verify_tpu pins |dd| = 0)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_ref), atol=1e-8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i1_ref))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i2_ref))
    np.testing.assert_allclose(np.asarray(dv1), np.asarray(d1_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(dv2), np.asarray(d2_ref), atol=1e-8)


def test_hier_kernel_interpret_mode(rng):
    """The hierarchical (block-bound pruned) forward — a documented
    NEGATIVE perf result kept in-tree (chamfer_hier_kernel.py docstring:
    ~15x slower than v2 at [250, 2048^2] on the v5e) — must stay EXACT:
    values match brute force and indices keep first-occurrence tie
    semantics through the Morton sort round trip (original-id tie
    bookkeeping in-kernel)."""
    from jax.experimental.pallas import tpu as pltpu

    from geometric_adv_tpu.ops.pallas.chamfer_hier_kernel import (
        nn_distance_hier,
    )

    b, n, m = 3, 300, 257  # awkward non-multiples: exercises padding
    x = (rng.rand(b, n, 3) - 0.5).astype(np.float32)
    y = (rng.rand(b, m, 3) - 0.5).astype(np.float32)
    # exact duplicates: first-occurrence ties in both directions, across
    # the sort permutation
    y[0, 100] = y[0, 7]
    y[1, 5] = y[1, 200]
    x[2, 50] = x[2, 3]
    x[0, 10] = y[0, 7]  # a zero-distance pair

    d1_ref, i1_ref, d2_ref, i2_ref = nn_distance_np(x, y)

    with pltpu.force_tpu_interpret_mode():
        d1, i1, d2, i2 = jax.jit(nn_distance_hier)(x, y)

    # 1e-8 bar as in the other interpret-mode tests (FMA contraction in
    # the interpreter); on TPU hardware the drive scripts measured the
    # values bit-equal to v2's
    np.testing.assert_allclose(np.asarray(d1), d1_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(d2), d2_ref, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(i1), i1_ref)
    np.testing.assert_array_equal(np.asarray(i2), i2_ref)

    # min-only direction call: values exact and NO idx output (the kernel
    # never writes one, so returning an allocated-but-unwritten buffer
    # would hand the caller garbage indices)
    from geometric_adv_tpu.ops.pallas.chamfer_hier_kernel import (
        nn_direction_sorted,
    )

    with pltpu.force_tpu_interpret_mode():
        d1o, i1o = jax.jit(
            lambda a, b2: nn_direction_sorted(a, b2, with_idx=False)
        )(x, y)
    assert i1o is None
    np.testing.assert_allclose(np.asarray(d1o), d1_ref, atol=1e-8)
