"""Data layer: PLY roundtrip, split parity, dataset semantics, sort_axes."""

import numpy as np
import pytest

from geometric_adv_tpu.data import (
    PointCloudDataSet,
    load_ply,
    save_ply,
    sort_axes,
    split_data,
)
from geometric_adv_tpu.data.datasets import (
    load_and_split_all_point_clouds_under_folder,
    load_dataset,
)
from geometric_adv_tpu.data.synthetic import make_dataset, make_shapenet_like_dir


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, rng, binary):
    pc = rng.randn(100, 3).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    save_ply(path, pc, binary=binary)
    loaded = load_ply(path)
    np.testing.assert_allclose(loaded, pc, atol=1e-6 if not binary else 0)


def test_split_parity_with_reference_formula(rng):
    """85/5/10, seed 42, round-half-up — must match the reference
    element-for-element (reference: src/in_out.py:194-218)."""
    data = rng.randn(103, 4).astype(np.float32)

    tr, va, te, perm = split_data(data, (0.85, 0.05, 0.10), seed=42)

    # independent transcription of the reference's arithmetic
    np.random.seed(42)
    ref_perm = np.arange(103)
    np.random.shuffle(ref_perm)
    assert np.array_equal(perm, ref_perm)
    train_end = int(0.85 * 103 + 0.5)  # 88
    val_end = int(0.90 * 103 + 0.5)  # 93
    assert (len(tr), len(va), len(te)) == (train_end, val_end - train_end,
                                           103 - val_end)
    np.testing.assert_array_equal(tr, data[ref_perm][:train_end])


def test_dataset_batching(rng):
    pcs = rng.randn(25, 16, 3).astype(np.float32)
    ds = PointCloudDataSet(pcs, init_shuffle=False)
    b1, _, _ = ds.next_batch(10, shuffle=False)
    b2, _, _ = ds.next_batch(10, shuffle=False)
    b3, _, _ = ds.next_batch(10, shuffle=False)  # wraps: restarts epoch
    np.testing.assert_array_equal(b1, pcs[:10])
    np.testing.assert_array_equal(b2, pcs[10:20])
    assert ds.epochs_completed == 1
    assert b3.shape == (10, 16, 3)


def test_dataset_merge(rng):
    a = PointCloudDataSet(rng.randn(5, 8, 3).astype(np.float32),
                          labels=np.zeros(5), init_shuffle=False)
    b = PointCloudDataSet(rng.randn(7, 8, 3).astype(np.float32),
                          labels=np.ones(7), init_shuffle=False)
    a.merge(b)
    assert a.num_examples == 12
    assert a.labels.shape == (12,)


def test_sort_axes_property(rng):
    pcs = rng.randn(20, 64, 3).astype(np.float32)
    out = sort_axes(pcs)
    ext = out.max(axis=1) - out.min(axis=1)
    assert np.all(ext[:, 0] >= ext[:, 1])  # x extent >= y extent
    # z coordinates are preserved exactly (only xy may permute/mirror)
    np.testing.assert_allclose(
        np.sort(out[..., 2], axis=1), np.sort(pcs[..., 2], axis=1), atol=0
    )
    # proper rotation: point norms unchanged
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=2), np.linalg.norm(pcs, axis=2), atol=1e-5
    )


def test_synthetic_dataset():
    pcs, slice_idx, labels, names = make_dataset(
        class_names=("sphere", "cube", "torus"), n_per_class=4, n_points=128
    )
    assert pcs.shape == (12, 128, 3)
    assert list(slice_idx) == [0, 4, 8, 12]
    assert labels.tolist() == [0] * 4 + [1] * 4 + [2] * 4
    # normalised into the unit sphere
    assert np.linalg.norm(pcs, axis=2).max() <= 0.5 + 1e-5


def test_shapenet_like_dir_loading(tmp_path):
    root = make_shapenet_like_dir(
        str(tmp_path), class_names=("sphere", "cube"), n_per_class=10,
        n_points=64,
    )
    tr, va, te = load_and_split_all_point_clouds_under_folder(
        str(tmp_path) + "/sphere"
    )
    assert tr.num_examples == 9  # int(.85*10+.5) = 9
    assert va.num_examples == 0  # int(.90*10+.5) = 9 -> empty val at n=10
    assert te.num_examples == 1

    ds, slice_idx, labels = load_dataset(
        ["sphere", "cube"], "train_set", root
    )
    assert ds.num_examples == 18
    assert slice_idx == [0, 9, 18]
    assert labels == [0] * 9 + [1] * 9


def test_shuffle_points(rng):
    pcs = rng.randn(3, 32, 3).astype(np.float32)
    ds = PointCloudDataSet(pcs, init_shuffle=False)
    ds.shuffle_points(seed=1)
    for i in range(3):
        # same multiset of points, different order
        np.testing.assert_allclose(
            np.sort(ds.point_clouds[i], axis=0), np.sort(pcs[i], axis=0),
            atol=0,
        )
    assert not np.array_equal(ds.point_clouds, pcs)
