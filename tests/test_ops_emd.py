"""approx_match / match_cost vs a numpy port of the reference CPU kernel.

The reference's own CPU-vs-GPU test accepts 1e-2 per match entry
(reference: external/structural_losses/approxmatch.cpp:218-230); we compare
against a float64 numpy transcription of approxmatch_cpu and hold a much
tighter bar since both run the same arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometric_adv_tpu.ops import approx_match, emd_loss_per_pc, match_cost


def approx_match_np(xyz1, xyz2):
    """Numpy transcription of approxmatch_cpu
    (reference: external/structural_losses/approxmatch.cpp:17-78) with the
    GPU kernel's multiplier convention (tf_approxmatch_g.cu:3-10), which is
    what the Python op exposes. Returns match[b, m, n]."""
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if n >= m:
        mult_l, mult_r = 1.0, float(n // m)
    else:
        mult_l, mult_r = float(m // n), 1.0

    out = np.zeros((b, m, n))
    for bi in range(b):
        d = np.sum(
            (xyz1[bi][:, None, :] - xyz2[bi][None, :, :]) ** 2, axis=-1
        )  # [n, m]
        match = np.zeros((n, m))
        remain_l = np.full(n, mult_l)
        remain_r = np.full(m, mult_r)
        for j in range(7, -3, -1):
            level = 0.0 if j == -2 else -(4.0**j)
            k = np.exp(level * d)
            suml = k @ remain_r + 1e-9
            ratio_l = remain_l / suml
            sumr = (ratio_l @ k) * remain_r
            ratio_r = np.minimum(remain_r / (sumr + 1e-9), 1.0) * remain_r
            remain_r = np.maximum(remain_r - sumr, 0.0)
            w = k * ratio_l[:, None] * ratio_r[None, :]
            match += w
            remain_l = np.maximum(remain_l - w.sum(axis=1), 0.0)
        out[bi] = match.T
    return out


@pytest.mark.parametrize("n,m", [(64, 64), (128, 32), (32, 128)])
def test_match_matches_numpy(rng, n, m):
    xyz1 = rng.rand(2, n, 3).astype(np.float32)
    xyz2 = rng.rand(2, m, 3).astype(np.float32)
    match = jax.jit(approx_match)(xyz1, xyz2)
    ref = approx_match_np(xyz1, xyz2)
    assert match.shape == (2, m, n)
    np.testing.assert_allclose(match, ref, atol=1e-4)


def test_match_is_doubly_stochastic_like(rng):
    """Row/col sums match the auction invariants the reference self-checks
    (reference: approxmatch.cpp:148-171): each xyz1 point distributes ~multiL
    mass, each xyz2 point absorbs ~multiR."""
    n, m = 256, 64
    xyz1 = rng.rand(1, n, 3).astype(np.float32)
    xyz2 = rng.rand(1, m, 3).astype(np.float32)
    match = np.asarray(approx_match(xyz1, xyz2))[0]  # [m, n]
    np.testing.assert_allclose(match.sum(axis=0), 1.0, atol=1e-3)
    np.testing.assert_allclose(match.sum(axis=1), n / m, atol=1e-2)


def test_match_cost_value(rng):
    xyz1 = rng.rand(2, 48, 3).astype(np.float32)
    xyz2 = rng.rand(2, 48, 3).astype(np.float32)
    match = approx_match(xyz1, xyz2)
    cost = match_cost(xyz1, xyz2, match)
    d = np.sqrt(
        np.sum((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2, axis=-1)
    )  # [b, n, m]
    ref = np.sum(np.transpose(np.asarray(match), (0, 2, 1)) * d, axis=(1, 2))
    np.testing.assert_allclose(cost, ref, rtol=1e-5)


def test_match_cost_gradient_formula(rng):
    """Backward must equal the reference's (a-b)/d scatter
    (reference: tf_approxmatch_g.cu:229-292)."""
    b, n, m = 1, 24, 16
    xyz1 = rng.rand(b, n, 3).astype(np.float32)
    xyz2 = rng.rand(b, m, 3).astype(np.float32)
    match = np.asarray(approx_match(xyz1, xyz2))

    g1, g2 = jax.grad(
        lambda a, c: jnp.sum(match_cost(a, c, match)), argnums=(0, 1)
    )(xyz1, xyz2)

    ref1 = np.zeros_like(xyz1)
    ref2 = np.zeros_like(xyz2)
    for bi in range(b):
        for k in range(n):
            for l in range(m):  # noqa: E741
                diff = xyz1[bi, k] - xyz2[bi, l]
                d = max(np.sqrt(np.sum(diff**2)), 1e-10)
                ref1[bi, k] += match[bi, l, k] * diff / d
                ref2[bi, l] -= match[bi, l, k] * diff / d
    np.testing.assert_allclose(g1, ref1, atol=1e-4)
    np.testing.assert_allclose(g2, ref2, atol=1e-4)


def test_match_has_no_gradient(rng):
    """approx_match output is stop-gradiented
    (reference: tf_approxmatch.py:19 NoGradient)."""
    xyz1 = jnp.asarray(rng.rand(1, 16, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.rand(1, 16, 3).astype(np.float32))
    g = jax.grad(lambda a: jnp.sum(approx_match(a, xyz2)))(xyz1)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_emd_loss_gradient_descent_converges(rng):
    """EMD loss must pull a random cloud toward a target under Adam-like GD
    (mirrors the reference op's __main__ sanity loop,
    tf_approxmatch.py:52-108)."""
    target = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
    pred = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32) + 1.0)

    loss_fn = jax.jit(lambda p: jnp.mean(emd_loss_per_pc(p, target)))
    grad_fn = jax.jit(jax.grad(lambda p: jnp.mean(emd_loss_per_pc(p, target))))
    l0 = float(loss_fn(pred))
    for _ in range(50):
        pred = pred - 0.05 * grad_fn(pred)
    assert float(loss_fn(pred)) < 0.5 * l0


def test_fused_emd_matches_unfused(rng):
    """emd_loss_fused must equal match_cost(approx_match(...)) in value and
    gradient (it is the same sweep with per-round accumulation)."""
    from geometric_adv_tpu.ops.emd import emd_loss_fused

    for n, m in [(48, 48), (64, 32)]:
        x = rng.rand(2, n, 3).astype(np.float32)
        y = rng.rand(2, m, 3).astype(np.float32)
        fused = emd_loss_fused(x, y)
        match = approx_match(x, y)
        unfused = match_cost(x, y, match)
        np.testing.assert_allclose(fused, unfused, rtol=1e-4, atol=1e-4)

        gf = jax.grad(lambda a: jnp.sum(emd_loss_fused(a, y)))(x)
        gu = jax.grad(
            lambda a: jnp.sum(match_cost(a, y, match))
        )(x)
        np.testing.assert_allclose(gf, gu, atol=2e-4)

        gf2 = jax.grad(lambda c: jnp.sum(emd_loss_fused(x, c)))(y)
        gu2 = jax.grad(lambda c: jnp.sum(match_cost(x, c, match)))(y)
        np.testing.assert_allclose(gf2, gu2, atol=2e-4)


def test_emd_fused_pallas_routing(rng, monkeypatch):
    """EMD_FUSED_IMPL='pallas' routes emd_loss_fused (value AND custom-VJP
    gradient) through the round kernels; off-TPU the switch is inert. The
    pallas leg runs under interpret mode with the TPU check patched."""
    from jax.experimental.pallas import tpu as pltpu

    import geometric_adv_tpu.ops.emd as emd_mod

    x = jnp.asarray(rng.rand(2, 32, 3).astype(np.float32) - 0.5)
    y = jnp.asarray(rng.rand(2, 24, 3).astype(np.float32) - 0.5)
    v_ref = np.asarray(emd_mod.emd_loss_fused(x, y))
    g_ref = np.asarray(
        jax.grad(lambda a: jnp.sum(emd_mod.emd_loss_fused(a, y)))(x)
    )

    monkeypatch.setattr(emd_mod, "EMD_FUSED_IMPL", "pallas")
    # off-TPU the switch must not engage (pin the platform check False so
    # the assertion also holds if this suite ever runs on a TPU host)
    monkeypatch.setattr(emd_mod, "_on_tpu", lambda: False)
    v_off = np.asarray(emd_mod.emd_loss_fused(x, y))
    np.testing.assert_array_equal(v_off, v_ref)

    monkeypatch.setattr(emd_mod, "_on_tpu", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        v_p = np.asarray(emd_mod.emd_loss_fused(x, y))
        vg_p, g_p = jax.value_and_grad(
            lambda a: jnp.sum(emd_mod.emd_loss_fused(a, y))
        )(x)
    np.testing.assert_allclose(v_p, v_ref, rtol=1e-5)
    # forward and value_and_grad accumulate the cost with the same
    # in-kernel reduction order -> bit-identical
    np.testing.assert_array_equal(float(np.sum(v_p)), float(vg_p))
    scale = float(np.max(np.abs(g_ref))) + 1e-9
    np.testing.assert_allclose(np.asarray(g_p), g_ref, atol=1e-5 * scale)


def test_emd_round_kernel_interpret_mode(rng):
    """The Pallas two-stage round kernel (ops/pallas/emd_round_kernel.py)
    must match the XLA sweep (_emd_sweep_single) in cost AND both gradient
    accumulations, including padding (n, m not tile multiples) and the
    unequal-cardinality multipliers. The cost is accumulated directly
    in-kernel with ONE reduction order in BOTH modes (the shipped path) —
    grads mode and value-only mode must agree; the sum(x.g1)+sum(y.g2)
    identity is documented in the kernel but is NOT the shipped cost."""
    import functools

    from jax.experimental.pallas import tpu as pltpu

    from geometric_adv_tpu.ops.emd import _LEVELS, _emd_fused_impl
    from geometric_adv_tpu.ops.pallas.emd_round_kernel import emd_sweep_pallas

    for n, m in [(40, 24), (24, 40), (32, 32)]:
        x = jnp.asarray(rng.rand(2, n, 3).astype(np.float32) - 0.5)
        y = jnp.asarray(rng.rand(2, m, 3).astype(np.float32) - 0.5)
        cost_ref, g1_ref, g2_ref = _emd_fused_impl(x, y, want_grads=True)

        with pltpu.force_tpu_interpret_mode():
            cost, g1, g2 = jax.jit(
                functools.partial(
                    emd_sweep_pallas, want_grads=True, levels=_LEVELS,
                    tile_n=8,
                )
            )(x, y)
            cost_v, _, _ = jax.jit(
                functools.partial(
                    emd_sweep_pallas, want_grads=False, levels=_LEVELS,
                    tile_n=8,
                )
            )(x, y)

        np.testing.assert_allclose(
            np.asarray(cost), np.asarray(cost_ref), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(cost_v), np.asarray(cost_ref), rtol=1e-5
        )
        scale = float(np.max(np.abs(np.asarray(g1_ref)))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g1_ref), atol=1e-5 * scale
        )
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g2_ref), atol=1e-5 * scale
        )


def test_emd_fused_sweep_kernel_interpret_mode(rng):
    """The single-pass full-plane sweep kernel
    (ops/pallas/emd_fused_kernel.py) must match the XLA sweep in cost and
    both gradients, including padding (n, m not lane multiples), the
    unequal-cardinality multipliers, and value-only mode (cost equal to
    grads mode; zero grads returned)."""
    import functools

    from jax.experimental.pallas import tpu as pltpu

    from geometric_adv_tpu.ops.emd import _LEVELS, _emd_fused_impl
    from geometric_adv_tpu.ops.pallas.emd_fused_kernel import (
        emd_sweep_fused_pallas,
        fused_sweep_supported,
    )

    assert fused_sweep_supported(1024, 1024)
    assert not fused_sweep_supported(2048, 2048)

    for n, m in [(40, 24), (24, 40), (32, 32), (130, 32)]:
        x = jnp.asarray(rng.rand(2, n, 3).astype(np.float32) - 0.5)
        y = jnp.asarray(rng.rand(2, m, 3).astype(np.float32) - 0.5)
        cost_ref, g1_ref, g2_ref = _emd_fused_impl(x, y, want_grads=True)

        with pltpu.force_tpu_interpret_mode():
            cost, g1, g2 = jax.jit(
                functools.partial(
                    emd_sweep_fused_pallas, want_grads=True, levels=_LEVELS,
                )
            )(x, y)
            cost_v, g1_v, g2_v = jax.jit(
                functools.partial(
                    emd_sweep_fused_pallas, want_grads=False, levels=_LEVELS,
                )
            )(x, y)

        np.testing.assert_allclose(
            np.asarray(cost), np.asarray(cost_ref), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(cost_v), np.asarray(cost), rtol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(g1_v), 0.0)
        np.testing.assert_array_equal(np.asarray(g2_v), 0.0)
        scale = float(np.max(np.abs(np.asarray(g1_ref)))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g1_ref), atol=1e-5 * scale
        )
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g2_ref), atol=1e-5 * scale
        )


def test_emd_fused_impl_auto_routing(rng, monkeypatch):
    """EMD_FUSED_IMPL='auto' (the default) engages the single-pass kernel
    on TPU at supported shapes and stays on the XLA sweep off-TPU; 'fused'
    forces it (asserting the gate)."""
    from jax.experimental.pallas import tpu as pltpu

    import geometric_adv_tpu.ops.emd as emd_mod

    x = jnp.asarray(rng.rand(2, 40, 3).astype(np.float32) - 0.5)
    y = jnp.asarray(rng.rand(2, 24, 3).astype(np.float32) - 0.5)
    v_ref = np.asarray(emd_mod.emd_loss_fused(x, y))
    g_ref = np.asarray(
        jax.grad(lambda a: jnp.sum(emd_mod.emd_loss_fused(a, y)))(x)
    )

    assert emd_mod.EMD_FUSED_IMPL == "auto"
    monkeypatch.setattr(emd_mod, "_on_tpu", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        v_p = np.asarray(emd_mod.emd_loss_fused(x, y))
        g_p = np.asarray(
            jax.grad(lambda a: jnp.sum(emd_mod.emd_loss_fused(a, y)))(x)
        )
    np.testing.assert_allclose(v_p, v_ref, rtol=1e-5)
    scale = float(np.max(np.abs(g_ref))) + 1e-9
    np.testing.assert_allclose(g_p, g_ref, atol=1e-5 * scale)

    # 'fused' at an unsupported shape must refuse, not silently fall back
    monkeypatch.setattr(emd_mod, "EMD_FUSED_IMPL", "fused")
    big = jnp.zeros((1, 2048, 3), jnp.float32)
    with pytest.raises(AssertionError):
        emd_mod._emd_fused_impl(big, big, want_grads=False)
