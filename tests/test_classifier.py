"""PointNet classifier: architecture invariants + learning on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometric_adv_tpu.classify import ClassifierTrainer
from geometric_adv_tpu.data.synthetic import make_dataset
from geometric_adv_tpu.models.pointnet_cls import (
    PointNetClassifier,
    TNet,
    classifier_loss,
)


def test_tnet_starts_as_identity(rng):
    model = TNet(k=3)
    x = jnp.asarray(rng.randn(2, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    t = model.apply(variables, x, train=False)
    assert t.shape == (2, 3, 3)
    # final layer zero-init + identity bias -> exactly the identity at init
    np.testing.assert_allclose(
        np.asarray(t), np.tile(np.eye(3), (2, 1, 1)), atol=1e-6
    )


def test_classifier_shapes_and_loss(rng):
    model = PointNetClassifier(num_classes=13)
    x = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, t_feat = model.apply(variables, x, train=False)
    assert logits.shape == (4, 13)
    assert t_feat.shape == (4, 64, 64)
    labels = jnp.asarray([0, 5, 12, 3])
    loss = classifier_loss(logits, labels, t_feat)
    assert np.isfinite(float(loss))
    # at init t_feat == I so the orthogonality term is ~0: loss ~ CE only
    ce_only = classifier_loss(logits, labels, t_feat, reg_weight=0.0)
    np.testing.assert_allclose(float(loss), float(ce_only), rtol=1e-4)


def test_bn_momentum_schedule_matches_reference():
    """Annealed BN decay 0.5 -> 0.99
    (reference: classifier/train_classifier.py:80-83,104-110):
    bn_decay = min(0.99, 1 - 0.5 * 0.5^floor(step*bs/200000)), staircase."""
    from geometric_adv_tpu.classify.trainer import bn_momentum_schedule

    bs = 32
    # step 0: 1 - 0.5 = 0.5
    assert float(bn_momentum_schedule(0, bs)) == 0.5
    # just below one staircase step: still 0.5
    assert float(bn_momentum_schedule(200000 // bs - 1, bs)) == 0.5
    # one staircase step: 1 - 0.25 = 0.75
    assert float(bn_momentum_schedule(200000 // bs, bs)) == 0.75
    # two steps: 1 - 0.125 = 0.875
    assert float(bn_momentum_schedule(2 * 200000 // bs, bs)) == 0.875
    # far out: clipped at 0.99
    assert float(bn_momentum_schedule(10**8, bs)) == np.float32(0.99)


def test_bn_momentum_override_updates_running_stats():
    """A per-call (traced) momentum must steer flax BatchNorm's moving
    stats: momentum ~ 0 adopts the batch stats almost entirely."""
    model = PointNetClassifier(num_classes=3, use_tnets=False)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def new_stats(mom):
        _, upd = model.apply(
            variables, x, train=True, bn_momentum=jnp.asarray(mom),
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return upd["batch_stats"]["conv1_bn"]["mean"]

    m_low = np.asarray(new_stats(0.01))
    m_high = np.asarray(new_stats(0.99))
    # low momentum moves the running mean much further from its init (0)
    assert np.abs(m_low).mean() > 10 * np.abs(m_high).mean()


@pytest.mark.slow  # trainer/e2e smoke: full gate only
def test_classifier_learns_synthetic_classes():
    pcs, _, labels, _ = make_dataset(
        class_names=("sphere", "plane_xy", "helix"), n_per_class=16,
        n_points=64, seed=3,
    )
    trainer = ClassifierTrainer(
        num_classes=3, num_points=64, batch_size=16, base_lr=0.003,
        bn_momentum=0.7,
    )
    trainer.train(pcs, labels, epochs=20)
    acc = float((trainer.classify(pcs) == labels).mean())
    assert acc > 0.8, acc


@pytest.mark.slow  # trainer/e2e smoke: full gate only
def test_classifier_checkpoint_roundtrip(tmp_path):
    pcs, _, labels, _ = make_dataset(
        class_names=("sphere", "cube"), n_per_class=8, n_points=32
    )
    tr = ClassifierTrainer(num_classes=2, num_points=32, batch_size=8)
    tr.train(pcs, labels, epochs=1)
    tr.save(str(tmp_path))
    pred_a = tr.classify(pcs)

    tr2 = ClassifierTrainer(num_classes=2, num_points=32, batch_size=8, seed=9)
    tr2.restore(str(tmp_path))
    pred_b = tr2.classify(pcs)
    np.testing.assert_array_equal(pred_a, pred_b)


def test_basic_variant_no_tnets(rng):
    """pointnet_cls_basic parity: no transform nets, identity t_feat
    (reference: classifier/pointnet_cls_basic.py)."""
    model = PointNetClassifier(num_classes=5, use_tnets=False)
    x = jnp.asarray(rng.randn(2, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, t_feat = model.apply(variables, x, train=False)
    assert logits.shape == (2, 5)
    np.testing.assert_allclose(
        np.asarray(t_feat), np.tile(np.eye(64), (2, 1, 1)), atol=0
    )
    # fewer params than the full model (no T-Nets)
    n_basic = sum(p.size for p in jax.tree.leaves(variables["params"]))
    full = PointNetClassifier(num_classes=5)
    vf = full.init(jax.random.PRNGKey(0), x, train=False)
    n_full = sum(p.size for p in jax.tree.leaves(vf["params"]))
    assert n_basic < n_full
