"""Analytic GT meshes for the synthetic dataset (the metro leg's ground
truth — data/synthetic.py::shape_mesh_raw / sample_shape_and_mesh) and the
transfer arch.json round trip."""

import numpy as np
import pytest

import jax

from geometric_adv_tpu.data.synthetic import (
    MESHABLE_CLASSES,
    SHAPE_CLASSES,
    sample_shape,
    sample_shape_and_mesh,
)
from geometric_adv_tpu.transfer.metro import (
    hausdorff_sampled,
    sample_mesh_surface,
)


@pytest.mark.parametrize("name", SHAPE_CLASSES)
def test_sample_shape_and_mesh_preserves_cloud_stream(name):
    """Mesh construction must consume NO rng draws: the cloud from
    sample_shape_and_mesh is bit-identical to sample_shape at the same rng
    state (datasets/goldens built on sample_shape stay valid)."""
    pc_plain = sample_shape(name, 256, np.random.RandomState(5))
    pc_mesh, mesh = sample_shape_and_mesh(name, 256, np.random.RandomState(5))
    np.testing.assert_array_equal(pc_plain, pc_mesh)
    if name in MESHABLE_CLASSES:
        assert mesh is not None
        verts, faces = mesh
        assert verts.dtype == np.float32 and verts.shape[1] == 3
        assert faces.dtype == np.int32 and faces.shape[1] == 3
        assert faces.min() >= 0 and faces.max() < len(verts)
    else:
        assert mesh is None


@pytest.mark.parametrize("name", MESHABLE_CLASSES)
def test_mesh_is_the_surface_the_cloud_samples(name):
    """The analytic mesh and the sampled cloud describe the SAME surface in
    the same normalised frame: the sampled symmetric Hausdorff between
    mesh-surface samples and the cloud is bounded by combined sampling
    spacing (unit-scale shapes), far below any frame/scale error."""
    rng = np.random.RandomState(11)
    pc, (verts, faces) = sample_shape_and_mesh(name, 2048, rng)
    s = sample_mesh_surface(verts, faces, 4096, jax.random.PRNGKey(0))
    d = float(hausdorff_sampled(s, pc))
    assert d < 0.15, f"{name}: hausdorff {d:.3f}"
    # mean NN distance is tighter: the surfaces coincide, only sampling
    # spacing remains
    from geometric_adv_tpu.ops.chamfer import nn_distance_values

    d1, d2 = nn_distance_values(np.asarray(s)[None], pc[None])
    mean_nn = float(np.mean(np.sqrt(np.asarray(d1))))
    assert mean_nn < 0.03, f"{name}: mean NN dist {mean_nn:.4f}"

    # negative control: a different instance of a different class is far
    other, _ = sample_shape_and_mesh(
        "cube" if name != "cube" else "sphere", 2048, np.random.RandomState(3)
    )
    d_other = float(hausdorff_sampled(s, other))
    assert d_other > d


def test_meshable_classes_subset():
    assert set(MESHABLE_CLASSES) <= set(SHAPE_CLASSES)


def test_transfer_arch_roundtrip(tmp_path):
    from geometric_adv_tpu.transfer import (
        load_transfer_arch,
        save_transfer_arch,
    )

    assert load_transfer_arch(str(tmp_path)) is None
    save_transfer_arch(
        str(tmp_path), "atlasnet",
        number_points=100, nb_primitives=25, template_type="SQUARE",
    )
    arch = load_transfer_arch(str(tmp_path))
    assert arch == {
        "ae_type": "atlasnet", "number_points": 100,
        "nb_primitives": 25, "template_type": "SQUARE",
    }
