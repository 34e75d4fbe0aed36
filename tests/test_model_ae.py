"""PointNet AE architecture parity + train/eval BN semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from geometric_adv_tpu.models import PointNetAE


def _init(model, n=32, batch=2):
    x = jnp.zeros((batch, n, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x, train=False)


def test_shapes_and_param_count():
    """Reference architecture: encoder [64,128,128,256,128], decoder
    [256,256,2048*3] (reference: src/ae_templates.py:22-33)."""
    model = PointNetAE(n_points=2048, bneck_size=128)
    variables = _init(model, n=2048)
    x = jnp.ones((2, 2048, 3), jnp.float32)
    recon, z, pre = model.apply(variables, x, train=False)
    assert recon.shape == (2, 2048, 3)
    assert z.shape == (2, 128)
    assert pre.shape == (2, 2048, 128)

    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # conv stack 91,008 + BN 1,408 + decoder 1,677,824
    assert n_params == 1_770_240, n_params


def test_symmetry_is_max_pool():
    """z must equal max over the point axis of pre_symmetry and be invariant
    to point permutation + last-point duplication (the pooling trick the
    critical-points defense relies on, reference: src/ae_utils.py:67)."""
    model = PointNetAE(n_points=64, bneck_size=16)
    variables = _init(model, n=64)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 3), jnp.float32)
    recon, z, pre = model.apply(variables, x, train=False)
    np.testing.assert_allclose(z, jnp.max(pre, axis=1), atol=0)

    perm = np.random.RandomState(1).permutation(64)
    _, z_perm, _ = model.apply(variables, x[:, perm], train=False)
    np.testing.assert_allclose(z, z_perm, atol=1e-6)

    # duplicate last point over half the cloud -> same latent iff the
    # duplicated points were already present (not new maxima): dup of
    # existing points never changes the max
    x_dup = jnp.concatenate([x[:, :32], jnp.tile(x[:, 31:32], (1, 32, 1))], 1)
    _, z_a, _ = model.apply(variables, x_dup, train=False)
    x_dup2 = jnp.concatenate(
        [x[:, :32], jnp.tile(x[:, 31:32], (1, 16, 1)),
         jnp.tile(x[:, 30:31], (1, 16, 1))], 1)
    _, z_b, _ = model.apply(variables, x_dup2, train=False)
    assert z_a.shape == z_b.shape  # smoke: pooling handles duplication


def test_bn_stats_frozen_in_eval():
    """Eval mode must not mutate batch_stats (the b_norm_decay=1.0 freeze
    trick of reference: attacker/run_attack.py:88-90 is 'use running stats,
    never update' — exactly flax eval mode)."""
    model = PointNetAE(n_points=32, bneck_size=8)
    variables = _init(model, n=32)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32, 3), jnp.float32)

    out, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    changed = jax.tree.map(
        lambda a, b: np.abs(np.asarray(a - b)).max(),
        updates["batch_stats"],
        variables["batch_stats"],
    )
    assert max(jax.tree.leaves(changed)) > 0  # training updates stats

    _, updates_eval = model.apply(
        variables, x, train=False, mutable=["batch_stats"]
    )
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        updates_eval["batch_stats"],
        variables["batch_stats"],
    )
    assert all(jax.tree.leaves(same))  # eval leaves stats untouched


def test_encode_decode_consistency():
    model = PointNetAE(n_points=64, bneck_size=16)
    variables = _init(model, n=64)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 64, 3), jnp.float32)
    recon, z, _ = model.apply(variables, x, train=False)
    z2 = model.apply(variables, x, train=False, method=PointNetAE.encode)
    recon2 = model.apply(variables, z2, train=False, method=PointNetAE.decode)
    np.testing.assert_allclose(z, z2, atol=1e-6)
    np.testing.assert_allclose(recon, recon2, atol=1e-6)


def test_conv_upsample_decoder(rng):
    """decoder_with_convs_only equivalent
    (reference: src/encoders_decoders.py:150-196)."""
    import jax
    import jax.numpy as jnp

    from geometric_adv_tpu.models.layers import ConvUpsampleDecoder

    dec = ConvUpsampleDecoder(
        features=(16, 8, 3), upsample_sizes=(2, None, None)
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 8), jnp.float32)
    variables = dec.init(jax.random.PRNGKey(0), x, train=False)
    out = dec.apply(variables, x, train=False)
    assert out.shape == (2, 8, 3)  # 4 points tiled x2 after first layer
