"""kNN / grouping ops vs numpy brute force.

Gradient bar from the reference op test: group_point grad err < 1e-4
(reference: external/grouping/tf_grouping_op_test.py:9-25).
"""

import jax
import jax.numpy as jnp
import numpy as np

from geometric_adv_tpu.ops import (
    group_point,
    knn_point,
    query_ball_point,
    select_top_k,
)


def test_knn_matches_numpy(rng):
    b, n, m, k = 3, 96, 40, 8
    dataset = rng.randn(b, n, 3).astype(np.float32)
    queries = rng.randn(b, m, 3).astype(np.float32)
    dist, idx = jax.jit(lambda a, c: knn_point(k, a, c))(dataset, queries)

    d = np.sum(
        (queries[:, :, None, :] - dataset[:, None, :, :]) ** 2, axis=-1
    )  # [b, m, n]
    ref_idx = np.argsort(d, axis=-1, kind="stable")[:, :, :k]
    ref_dist = np.take_along_axis(d, ref_idx, axis=-1)
    np.testing.assert_allclose(dist, ref_dist, atol=1e-6)
    np.testing.assert_array_equal(idx, ref_idx)


def test_knn_self_excludes_via_offset(rng):
    """Defense usage: knn of a cloud against itself returns self as the 0th
    neighbor (d=0), dropped by the caller
    (reference: defender/get_knn_dists_per_point.py:73-81)."""
    pc = rng.randn(2, 64, 3).astype(np.float32)
    dist, idx = knn_point(5, pc, pc)
    np.testing.assert_allclose(dist[:, :, 0], 0.0, atol=1e-7)
    np.testing.assert_array_equal(idx[:, :, 0], np.arange(64)[None, :].repeat(2, 0))


def test_select_top_k(rng):
    d = rng.rand(2, 10, 32).astype(np.float32)
    idx, dist_out = select_top_k(4, d)
    ref_idx = np.argsort(d, axis=-1, kind="stable")[:, :, :4]
    np.testing.assert_array_equal(idx[:, :, :4], ref_idx)
    np.testing.assert_allclose(
        dist_out[:, :, :4], np.take_along_axis(d, ref_idx, axis=-1), atol=0
    )


def test_group_point_and_gradient(rng):
    b, n, c, m, s = 2, 30, 5, 7, 3
    points = rng.randn(b, n, c).astype(np.float32)
    idx = rng.randint(0, n, size=(b, m, s)).astype(np.int32)
    out = group_point(points, idx)
    assert out.shape == (b, m, s, c)
    for bi in range(b):
        for mi in range(m):
            for si in range(s):
                np.testing.assert_array_equal(
                    np.asarray(out)[bi, mi, si], points[bi, idx[bi, mi, si]]
                )

    # gradient: scatter-add (reference: tf_grouping_g.cu:59-76)
    g_out = rng.randn(b, m, s, c).astype(np.float32)
    grad = jax.grad(lambda p: jnp.sum(group_point(p, idx) * g_out))(points)
    ref = np.zeros_like(points)
    for bi in range(b):
        for mi in range(m):
            for si in range(s):
                ref[bi, idx[bi, mi, si]] += g_out[bi, mi, si]
    np.testing.assert_allclose(grad, ref, atol=1e-4)


def test_query_ball_point(rng):
    b, n, m, nsample, radius = 2, 60, 12, 6, 0.45
    dataset = rng.rand(b, n, 3).astype(np.float32)
    queries = rng.rand(b, m, 3).astype(np.float32)
    idx, cnt = jax.jit(
        lambda a, c: query_ball_point(radius, nsample, a, c)
    )(dataset, queries)

    d = np.sum((queries[:, :, None, :] - dataset[:, None, :, :]) ** 2, -1)
    for bi in range(b):
        for mi in range(m):
            hits = np.where(d[bi, mi] < radius**2)[0]
            expect_cnt = min(len(hits), nsample)
            assert cnt[bi, mi] == expect_cnt
            if len(hits) == 0:
                continue
            kept = hits[:nsample]
            np.testing.assert_array_equal(
                np.asarray(idx)[bi, mi, :expect_cnt], kept
            )
            # padding with first hit (reference: tf_grouping_g.cu:17-24)
            np.testing.assert_array_equal(
                np.asarray(idx)[bi, mi, expect_cnt:], kept[0]
            )
