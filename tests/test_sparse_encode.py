"""Sparse (argmax-gathered) encoder VJP vs dense autodiff.

The attack's input-gradient path (models/sparse_encode.py) must match plain
flax autodiff: bit-identical forward, gradient equal up to f32 summation
order (the paths tile/accumulate the same contractions differently).
Documented deviation: on EXACT max-pool ties the dense VJP splits the
cotangent evenly while the sparse path follows the first argmax row
(PARITY.md deviation ledger)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import geometric_adv_tpu.models.sparse_encode as se
from geometric_adv_tpu.attack.core import AttackRunner, attack_batch
from geometric_adv_tpu.models import PointNetAE
from geometric_adv_tpu.train import AETrainer, Configuration


def build(n=64, bneck=16, filters=None, dtype=jnp.float32, seed=3):
    model = PointNetAE(
        n_points=n,
        bneck_size=bneck,
        encoder_filters=filters or [16, 32, bneck],
        decoder_sizes=[16, 16],
        dtype=dtype,
    )
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, n, 3)), train=False
    )
    # non-trivial BN stats so the backward scale gamma*rsqrt(var+eps) != 1
    variables = jax.tree.map(lambda a: a, variables)
    stats = jax.tree.map(
        lambda a: a + 0.3 * jnp.abs(a) + 0.01, variables["batch_stats"]
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    return model, variables


def dense_encode(model, variables):
    return lambda x: model.apply(
        variables, x, train=False, method=PointNetAE.encode
    )


def test_forward_bit_identical():
    model, variables = build()
    sparse = se.make_sparse_encode(model, variables)
    dense = dense_encode(model, variables)
    x = jnp.asarray(
        np.random.RandomState(0).randn(4, 64, 3), jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(sparse(x)), np.asarray(dense(x))
    )


@pytest.mark.parametrize("scatter_impl", ["onehot", "scatter"])
def test_input_gradient_matches_dense(scatter_impl, monkeypatch):
    monkeypatch.setattr(se, "SCATTER_IMPL", scatter_impl)
    model, variables = build()
    sparse = se.make_sparse_encode(model, variables)
    dense = dense_encode(model, variables)
    x = jnp.asarray(
        np.random.RandomState(1).randn(5, 64, 3), jnp.float32
    )
    # a non-linear scalarization so every z channel gets a distinct cotangent
    scalarize = lambda enc: lambda x: jnp.sum(  # noqa: E731
        jnp.sin(enc(x)) * jnp.arange(1.0, 1.0 + enc(x).shape[-1])
    )
    g_sparse = jax.grad(scalarize(sparse))(x)
    g_dense = jax.grad(scalarize(dense))(x)
    np.testing.assert_allclose(
        np.asarray(g_sparse), np.asarray(g_dense), rtol=2e-5, atol=1e-7
    )


def test_gradient_under_vmap_and_jit():
    model, variables = build()
    sparse = se.make_sparse_encode(model, variables)
    dense = dense_encode(model, variables)
    x = jnp.asarray(
        np.random.RandomState(2).randn(3, 2, 64, 3), jnp.float32
    )

    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def grads(enc_kind, xs):
        enc = sparse if enc_kind else dense
        f = lambda x: jnp.sum(enc(x) ** 2)  # noqa: E731
        return jax.vmap(jax.grad(f))(xs)

    np.testing.assert_allclose(
        np.asarray(grads(True, x)),
        np.asarray(grads(False, x)),
        rtol=2e-5,
        atol=1e-7,
    )


def test_bf16_model_dtype_runs():
    model, variables = build(dtype=jnp.bfloat16)
    sparse = se.make_sparse_encode(model, variables)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 64, 3), jnp.float32)
    z = sparse(x)
    assert z.dtype == jnp.bfloat16
    g = jax.grad(lambda x: jnp.sum(sparse(x).astype(jnp.float32)))(x)
    assert g.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(g)))


def test_dead_channel_zero_gradient_both_paths():
    """All-rows-dead ReLU channel: dense splits the max-tie cotangent over
    every row but the ReLU mask kills it; sparse kills it at the argmax row.
    Both must return exactly zero for that channel's contribution."""
    model, variables = build(n=16, bneck=4, filters=[8, 4])
    # force the last layer's BN shift very negative -> ReLU output all zero
    bn_last = sorted(
        k for k in variables["params"]["encoder"] if k.startswith("bn_")
    )[-1]
    variables["params"]["encoder"][bn_last]["bias"] = (
        variables["params"]["encoder"][bn_last]["bias"] - 1e3
    )
    sparse = se.make_sparse_encode(model, variables)
    dense = dense_encode(model, variables)
    x = jnp.asarray(np.random.RandomState(5).randn(2, 16, 3), jnp.float32)
    assert float(jnp.max(jnp.abs(dense(x)))) == 0.0
    g_s = jax.grad(lambda x: jnp.sum(sparse(x)))(x)
    g_d = jax.grad(lambda x: jnp.sum(dense(x)))(x)
    np.testing.assert_array_equal(np.asarray(g_s), 0.0)
    np.testing.assert_array_equal(np.asarray(g_d), 0.0)


def test_attack_trajectory_matches_dense_vjp():
    """Short attack run: sparse-vs-dense encoder VJP trajectories agree to
    float-noise level (same semantics, different summation order)."""
    model, variables = build(n=64, bneck=16)
    sparse = se.make_sparse_encode(model, variables)
    dense = dense_encode(model, variables)
    decode = lambda z: model.apply(  # noqa: E731
        variables, z, train=False, method=PointNetAE.decode
    )
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(4, 64, 3) - 0.5, jnp.float32)
    gt = jnp.asarray(rng.rand(4, 64, 3) - 0.5, jnp.float32)
    ref = jnp.ones((4,), jnp.float32)
    tz = dense(gt)
    kw = dict(
        num_iterations=25, num_iterations_thresh=1, learning_rate=0.01
    )
    out_s = attack_batch(
        lambda x: sparse(x).astype(jnp.float32),
        decode, x, tz, gt, ref, jnp.asarray([1.0]), **kw,
    )
    out_d = attack_batch(
        lambda x: dense(x).astype(jnp.float32),
        decode, x, tz, gt, ref, jnp.asarray([1.0]), **kw,
    )
    np.testing.assert_allclose(
        np.asarray(out_s.metrics), np.asarray(out_d.metrics),
        rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_s.pc_input), np.asarray(out_d.pc_input),
        rtol=1e-4, atol=2e-6,
    )


def test_attack_runner_uses_sparse_path(monkeypatch):
    """AttackRunner routes through sparse_encode when the switch is on
    (default is auto: TPU only, so CPU goldens keep the dense-autodiff
    bits — force it on here)."""
    calls = []
    real = se.make_sparse_encode

    def spy(model, variables):
        calls.append(1)
        return real(model, variables)

    monkeypatch.setattr(se, "make_sparse_encode", spy)
    monkeypatch.setattr(se, "SPARSE_ENCODER_VJP", True)
    conf = Configuration(
        n_input=[32, 3], bneck_size=8, encoder_filters=[16, 8],
        decoder_sizes=[16, 16], dist_weight_list=[1.0],
        num_iterations=3, num_iterations_thresh=1, saver_step=None,
    )
    trainer = AETrainer(conf)
    AttackRunner(
        trainer.model, trainer.state.params, trainer.state.batch_stats, conf
    )
    assert calls, "sparse encoder VJP was not built"

    monkeypatch.setattr(se, "SPARSE_ENCODER_VJP", False)
    calls.clear()
    AttackRunner(
        trainer.model, trainer.state.params, trainer.state.batch_stats, conf
    )
    assert not calls, "dense escape hatch did not disable the sparse path"
