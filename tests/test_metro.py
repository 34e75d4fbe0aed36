"""Metro (sampled mesh Hausdorff) eval — the port of the reference's
external-binary metro pipeline (trainer_loss.py:60-101, metro.py:14-32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometric_adv_tpu.transfer import AtlasNetTrainer
from geometric_adv_tpu.transfer.metro import (
    atlasnet_generate_mesh,
    hausdorff_sampled,
    merge_patch_meshes,
    metro_distance,
    metro_eval,
    sample_mesh_surface,
    square_grid_faces,
)


def _unit_square_mesh():
    verts = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    faces = np.asarray([[0, 1, 2], [1, 3, 2]], np.int32)
    return verts, faces


def test_square_grid_faces_tile_the_unit_square():
    grain = 5
    xs = np.linspace(0, 1, grain)
    verts = np.stack(
        np.meshgrid(xs, xs, indexing="ij"), -1
    ).reshape(-1, 2)
    verts3 = np.concatenate([verts, np.zeros((len(verts), 1))], axis=1)
    faces = square_grid_faces(grain)
    assert faces.shape == ((grain - 1) ** 2 * 2, 3)
    assert faces.min() >= 0 and faces.max() < grain * grain
    v0, v1, v2 = (verts3[faces[:, k]] for k in range(3))
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    np.testing.assert_allclose(areas.sum(), 1.0, rtol=1e-6)


def test_sample_mesh_surface_stays_on_surface():
    verts, faces = _unit_square_mesh()
    s = np.asarray(
        sample_mesh_surface(verts, faces, 2000, jax.random.PRNGKey(0))
    )
    assert s.shape == (2000, 3)
    assert (s[:, :2] >= 0).all() and (s[:, :2] <= 1).all()
    np.testing.assert_allclose(s[:, 2], 0.0, atol=1e-7)
    # area-weighted sampling covers the square roughly uniformly
    assert abs(s[:, 0].mean() - 0.5) < 0.05
    assert abs(s[:, 1].mean() - 0.5) < 0.05


def test_metro_distance_recovers_a_known_offset():
    verts, faces = _unit_square_mesh()
    shifted = verts + np.asarray([0.0, 0.0, 0.25], np.float32)
    d = metro_distance(verts, faces, shifted, faces, n_samples=4000)
    # parallel planes: true Hausdorff = 0.25; sampling error O(spacing)
    np.testing.assert_allclose(d, 0.25, atol=0.02)
    # self-distance is pure sampling noise
    d_self = metro_distance(verts, faces, verts, faces, n_samples=4000)
    assert d_self < 0.05


def test_hausdorff_sampled_exact_on_points():
    a = np.zeros((4, 3), np.float32)
    b = np.zeros((4, 3), np.float32)
    b[0] = [3.0, 4.0, 0.0]  # farthest pair: distance 5
    assert float(hausdorff_sampled(a, b)) == 5.0


def test_merge_patch_meshes_offsets_faces():
    pts = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)
    faces = np.asarray([[0, 1, 2]], np.int32)
    verts, merged = merge_patch_meshes(pts, faces)
    assert verts.shape == (8, 3)
    np.testing.assert_array_equal(merged, [[0, 1, 2], [4, 5, 6]])


def test_directed_max_min_chunked_matches_direct():
    """The off-TPU Hausdorff fallback (row-chunked, 3-plane form) must
    agree with the direct [n, m] reduction, including when n is not a
    multiple of the chunk (the pad rows duplicate a[0])."""
    from geometric_adv_tpu.transfer.metro import _directed_max_min_sq

    rng = np.random.RandomState(3)
    a = rng.rand(37, 3).astype(np.float32)
    b = rng.rand(53, 3).astype(np.float32)
    direct = np.max(
        np.min(((a[:, None] - b[None]) ** 2).sum(-1), axis=1)
    )
    chunked = float(_directed_max_min_sq(jnp.asarray(a), jnp.asarray(b),
                                         chunk=8))
    np.testing.assert_allclose(chunked, direct, rtol=1e-6)


@pytest.mark.slow  # trainer/e2e smoke: full gate only
def test_atlasnet_mesh_and_metro_eval():
    trainer = AtlasNetTrainer(
        number_points=64,
        nb_primitives=4,
        template_type="SQUARE",
        n_points_input=32,
    )
    rng = np.random.RandomState(0)
    cloud = rng.rand(32, 3).astype(np.float32) - 0.5
    verts, faces = atlasnet_generate_mesh(trainer, cloud)
    assert verts.shape == (64, 3)  # 4 patches x 4x4 grid
    assert faces.shape == (4 * 9 * 2, 3)
    assert faces.max() < len(verts)
    # vertices are exactly the trainer's reconstruction points
    recon = np.asarray(trainer._jit_forward(trainer.state, cloud[None]))[0]
    np.testing.assert_allclose(verts, recon.reshape(-1, 3), atol=1e-6)

    gt = _unit_square_mesh()
    mean, per = metro_eval(
        trainer, [cloud, cloud], [gt, gt], n_samples=1000
    )
    assert len(per) == 2 and np.isfinite(mean) and mean > 0
