"""Native C++ PLY batch loader vs the pure-python parser."""

import numpy as np
import pytest

from geometric_adv_tpu.data.datasets import load_point_clouds_from_filenames
from geometric_adv_tpu.data.ply import load_ply, save_ply
from geometric_adv_tpu.native import get_module


@pytest.fixture(scope="module")
def native():
    mod = get_module()
    if mod is None:
        pytest.skip("native extension unavailable (no g++?)")
    return mod


def _write_tree(tmp_path, rng, n_files=6, n_pts=50, binary=True):
    d = tmp_path / "class_a"
    d.mkdir(parents=True, exist_ok=True)
    paths, arrays = [], []
    for i in range(n_files):
        pc = rng.randn(n_pts, 3).astype(np.float32)
        p = str(d / f"model_{i}.ply")
        save_ply(p, pc, binary=binary)
        paths.append(p)
        arrays.append(pc)
    return paths, np.stack(arrays)


def test_load_file_matches_python(native, tmp_path, rng):
    paths, ref = _write_tree(tmp_path, rng, n_files=1)
    buf, n = native.load_file(paths[0])
    pc = np.frombuffer(buf, np.float32).reshape(n, 3)
    np.testing.assert_array_equal(pc, ref[0])
    np.testing.assert_array_equal(pc, load_ply(paths[0]))


@pytest.mark.parametrize("binary", [True, False])
def test_load_batch_matches_python(native, tmp_path, rng, binary):
    paths, ref = _write_tree(tmp_path, rng, binary=binary)
    buf, n_files, n_vertex = native.load_batch(paths, 4)
    pcs = np.frombuffer(buf, np.float32).reshape(n_files, n_vertex, 3)
    np.testing.assert_allclose(pcs, ref, atol=1e-6 if not binary else 0)


def test_integrated_loader_uses_native(native, tmp_path, rng):
    paths, ref = _write_tree(tmp_path, rng)
    pcs, model_names, class_ids = load_point_clouds_from_filenames(paths)
    np.testing.assert_array_equal(pcs, ref)
    assert model_names[0] == "model_0"
    assert class_ids[0] == "class_a"


def test_native_error_paths(native, tmp_path):
    with pytest.raises(ValueError):
        native.load_file(str(tmp_path / "missing.ply"))
    bad = tmp_path / "bad.ply"
    bad.write_bytes(b"not a ply\n")
    with pytest.raises(ValueError):
        native.load_file(str(bad))
