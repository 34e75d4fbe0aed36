"""Defenses: critical-points pooling invariance, off-surface outlier split."""

import jax
import jax.numpy as jnp
import numpy as np

from geometric_adv_tpu.defense import (
    get_critical_pc_non_critical_pc,
    get_critical_points,
    get_outlier_pc_inlier_pc,
    knn_dists_per_point,
)
from geometric_adv_tpu.models import PointNetAE


def _model_and_apply(n=64, bneck=16, seed=0):
    model = PointNetAE(
        n_points=n, bneck_size=bneck, encoder_filters=[16, bneck],
        decoder_sizes=[16, 16],
    )
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, n, 3)), train=False
    )
    def fwd(x):
        return model.apply(variables, jnp.asarray(x), train=False)
    return fwd


def test_critical_points_pooling_invariance(rng):
    """The reference's core invariant: reconstructing only the critical
    points equals reconstructing the full cloud
    (reference: defender/run_defense_critical.py:189-192)."""
    fwd = _model_and_apply()
    x = rng.rand(5, 64, 3).astype(np.float32)
    recon, z, pre = fwd(x)

    crit_pts, crit_idx, crit_num, critical_pc, non_critical_pc = \
        get_critical_pc_non_critical_pc(x, np.asarray(pre))

    recon_crit, z_crit, _ = fwd(critical_pc)
    np.testing.assert_allclose(z, z_crit, atol=1e-5)
    np.testing.assert_allclose(recon, recon_crit, atol=1e-4)

    # zero-padding invariants (reference: src/ae_utils.py:59-61)
    for k in range(5):
        assert not np.any(crit_idx[k, crit_num[k]:])
        # critical count can't exceed bottleneck size
        assert crit_num[k] <= 16


def test_critical_points_sorted_by_count(rng):
    """Most critical points (winning most channels) come first."""
    x = rng.rand(1, 16, 3).astype(np.float32)
    pre = np.zeros((1, 16, 8), np.float32)
    # point 3 wins 5 channels, point 7 wins 2, point 1 wins 1
    pre[0, 3, 0:5] = 1.0
    pre[0, 7, 5:7] = 1.0
    pre[0, 1, 7] = 1.0
    pts, idx, num = get_critical_points(x, pre)
    assert num[0] == 3
    np.testing.assert_array_equal(idx[0, :3], [3, 7, 1])
    np.testing.assert_allclose(pts[0, 0], x[0, 3], atol=0)


def test_knn_dists_per_point(rng):
    pcs = rng.rand(3, 40, 3).astype(np.float32)
    dists = knn_dists_per_point(pcs, num_knn=4)
    assert dists.shape == (3, 40, 4)
    # matches brute-force: sorted true L2 distances, self excluded
    d = np.linalg.norm(pcs[0][:, None] - pcs[0][None, :], axis=-1)
    d_sorted = np.sort(d, axis=1)[:, 1:5]
    np.testing.assert_allclose(dists[0], d_sorted, atol=1e-5)


def test_outlier_inlier_split(rng):
    pcs = rng.rand(2, 20, 3).astype(np.float32)
    knn = np.full((2, 20), 0.01, np.float32)
    knn[0, [3, 7]] = 0.2  # two outliers in cloud 0
    out_pc, out_idx, out_num, in_pc = get_outlier_pc_inlier_pc(pcs, knn, 0.04)
    assert out_num[0] == 2 and out_num[1] == 0
    np.testing.assert_array_equal(out_idx[0, :2], [3, 7])
    np.testing.assert_allclose(out_pc[0, 0], pcs[0, 3], atol=0)
    # padding with last outlier point
    np.testing.assert_allclose(out_pc[0, 5], pcs[0, 7], atol=0)
    # inliers: first 18 are the non-outliers, rest padded with last inlier
    comp = [i for i in range(20) if i not in (3, 7)]
    np.testing.assert_allclose(in_pc[0, :18], pcs[0, comp], atol=0)
    np.testing.assert_allclose(
        in_pc[0, 18:], np.tile(pcs[0, comp[-1]], (2, 1)), atol=0
    )
    # cloud with zero outliers: inliers == original
    np.testing.assert_allclose(in_pc[1], pcs[1], atol=0)


def test_surface_defense_restores_reconstruction(rng):
    """Adding off-surface noise points then defending must recover the
    clean latent better than the corrupted cloud does."""
    fwd = _model_and_apply()
    x = (rng.rand(4, 64, 3).astype(np.float32) - 0.5) * 0.5
    corrupted = x.copy()
    # blatant off-surface outliers, scattered so they don't form a cluster
    offsets = np.array(
        [[3, 0, 0], [-3, 0, 0], [0, 3, 0], [0, -3, 0], [0, 0, 3], [0, 0, -3]],
        np.float32,
    )
    corrupted[:, :6] += offsets

    knn = knn_dists_per_point(corrupted, num_knn=8)
    knn_mean = knn[:, :, :2].mean(-1)
    _, _, out_num, defended = get_outlier_pc_inlier_pc(
        corrupted, knn_mean, 0.25
    )
    assert np.all(out_num == 6)

    _, z_clean, _ = fwd(x)
    _, z_corrupt, _ = fwd(corrupted)
    _, z_def, _ = fwd(defended)
    d_corrupt = np.linalg.norm(np.asarray(z_corrupt - z_clean), axis=1)
    d_def = np.linalg.norm(np.asarray(z_def - z_clean), axis=1)
    assert np.all(d_def < d_corrupt)
