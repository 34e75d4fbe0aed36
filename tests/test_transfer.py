"""Transfer AEs: architecture shapes, graph features, learning smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometric_adv_tpu.models.atlasnet import (
    AtlasNet,
    sphere_template_points,
    square_template_points,
)
from geometric_adv_tpu.models.foldingnet import (
    FoldingNet,
    folding_grid,
    graph_features,
    graph_max_pool,
)
from geometric_adv_tpu.ops import fscore, nn_distance
from geometric_adv_tpu.transfer import AtlasNetTrainer, FoldingNetTrainer


def test_templates():
    sph = sphere_template_points(2500)
    assert sph.shape == (2500, 3)
    np.testing.assert_allclose(np.linalg.norm(sph, axis=1), 1.0, atol=1e-5)
    sq = square_template_points(625)
    assert sq.shape == (625, 2)
    assert sq.min() == 0.0 and sq.max() == 1.0

    grid = folding_grid()
    assert grid.shape == (2025, 2)
    assert grid.min() == -0.3 and grid.max() == 0.3


def test_atlasnet_shapes(rng):
    model = AtlasNet(number_points=250, nb_primitives=1)
    x = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    recon, latent = model.apply(variables, x, train=False)
    assert recon.shape == (2, 250, 3)
    assert latent.shape == (2, 1024)


def test_atlasnet_multi_primitive(rng):
    model = AtlasNet(number_points=100, nb_primitives=4, template_type="SQUARE")
    x = jnp.asarray(rng.rand(2, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    recon, _ = model.apply(variables, x, train=False)
    assert recon.shape == (2, 100, 3)  # 4 patches x 25 points


def test_graph_features_match_numpy(rng):
    pcs = rng.rand(2, 40, 3).astype(np.float32)
    nbr_idx, cov = graph_features(pcs)
    assert nbr_idx.shape == (2, 40, 16)
    assert cov.shape == (2, 40, 9)
    # numpy reference for one point (reference: prepare_graph.py:56-57)
    d = np.linalg.norm(pcs[0][:, None] - pcs[0][None, :], axis=-1)
    nn = np.argsort(d[5], kind="stable")[1:17]
    np.testing.assert_array_equal(np.asarray(nbr_idx)[0, 5], nn)
    ref_cov = np.cov(pcs[0][nn].T).reshape(-1)
    np.testing.assert_allclose(np.asarray(cov)[0, 5], ref_cov, atol=1e-5)


def test_graph_max_pool(rng):
    feats = jnp.asarray(rng.rand(1, 10, 4), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 10, (1, 10, 3)), jnp.int32)
    pooled = graph_max_pool(feats, idx)
    for i in range(10):
        nbrs = np.asarray(feats)[0, np.asarray(idx)[0, i]]
        expect = np.maximum(nbrs.max(0), np.asarray(feats)[0, i])
        np.testing.assert_allclose(np.asarray(pooled)[0, i], expect, atol=0)


def test_foldingnet_shapes(rng):
    model = FoldingNet()
    x = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    nbr, cov = graph_features(x)
    variables = model.init(jax.random.PRNGKey(0), x, cov, nbr, train=False)
    recon, p1, code = model.apply(variables, x, cov, nbr, train=False)
    assert recon.shape == (2, 2025, 3)
    assert p1.shape == (2, 2025, 3)
    assert code.shape == (2, 512)


@pytest.mark.slow  # trainer/e2e smoke: full gate only
def test_atlasnet_trainer_learns(rng):
    pcs = (rng.rand(16, 64, 3).astype(np.float32) - 0.5) * 0.8
    tr = AtlasNetTrainer(
        number_points=128, n_points_input=64, learning_rate=0.003,
        bn_momentum=0.5,
    )
    tr.train(pcs, epochs=25, batch_size=8)
    l1 = float(np.mean(tr.get_loss_per_pc(pcs)))
    assert l1 < 0.06, l1  # well below the ~0.09 all-points-at-origin level
    recon = tr.get_reconstructions(pcs[:3])
    assert recon.shape == (3, 128, 3)


@pytest.mark.slow  # trainer/e2e smoke: full gate only
def test_foldingnet_trainer_smoke(rng):
    pcs = (rng.rand(8, 64, 3).astype(np.float32) - 0.5) * 0.8
    tr = FoldingNetTrainer(
        n_points_input=64, learning_rate=0.001, bn_momentum=0.5
    )
    tr.train(pcs, epochs=12, batch_size=4)
    l1 = float(np.mean(tr.get_loss_per_pc(pcs)))
    # smoke bound: 24 train steps can't fully converge the two-fold decoder,
    # but eval loss must be well inside learning territory (init ~4.5)
    assert l1 < 0.5, l1
    recon = tr.get_reconstructions(pcs[:2])
    assert recon.shape == (2, 2025, 3)


def test_fscore(rng):
    x = rng.rand(2, 50, 3).astype(np.float32)
    d1, _, d2, _ = nn_distance(x, x)
    f, p1, p2 = fscore(d1, d2)
    np.testing.assert_allclose(f, 1.0, atol=1e-6)  # identical clouds
    y = x + 10.0
    d1, _, d2, _ = nn_distance(x, y)
    f, _, _ = fscore(d1, d2)
    np.testing.assert_allclose(f, 0.0, atol=0)  # disjoint clouds
