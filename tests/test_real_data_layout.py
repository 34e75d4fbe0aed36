"""Real-data-layout rehearsal: a reference-shaped ShapeNet tree end-to-end.

The reference's download_data_set.sh materialises
``shape_net_core_uniform_samples_2048/<synset_id>/<model>.ply`` (binary
little-endian vertex lists) and every run starts with
``load_dataset -> sort_axes -> train`` over that tree
(reference: src/in_out.py:79-99,156-191, autoencoder/train_ae.py:83-105).
No egress in this environment, so rehearse on a synthesized tree with the
exact layout: synset-id class dirs, binary .ply payloads (plus one
big-endian and one ascii file to cover every on-disk variant plyfile
accepts), real category names mapped through the synset table.
"""

import os
import os.path as osp
import subprocess
import sys

import numpy as np

from geometric_adv_tpu.data import PointCloudDataSet, load_dataset, sort_axes
from geometric_adv_tpu.data.datasets import (
    load_point_clouds_from_filenames,
    snc_category_to_synth_id,
)
from geometric_adv_tpu.data.ply import save_ply

import pytest

pytestmark = pytest.mark.slow  # minutes-scale; quick tier runs -m "not slow"

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
N_PER_CLASS = 20
N_POINTS = 128
CLASSES = ("chair", "table")


def _write_shapenet_tree(root, rng):
    """synset-id dirs + .ply files, mostly binary LE like the real data."""
    cat2id = snc_category_to_synth_id()
    clouds = {}
    for cname in CLASSES:
        syn_dir = osp.join(root, cat2id[cname])
        os.makedirs(syn_dir)
        for k in range(N_PER_CLASS):
            pc = rng.rand(N_POINTS, 3).astype(np.float32) - 0.5
            name = f"model_{cname}_{k:03d}"
            path = osp.join(syn_dir, name + ".ply")
            if k == 0:
                save_ply(path, pc, binary=False)  # ascii variant
            elif k == 1:
                # big-endian variant, written by hand
                header = (
                    f"ply\nformat binary_big_endian 1.0\n"
                    f"element vertex {N_POINTS}\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "end_header\n"
                )
                with open(path, "wb") as f:
                    f.write(header.encode("ascii"))
                    f.write(pc.astype(">f4").tobytes())
            else:
                save_ply(path, pc, binary=True)
            clouds[(cat2id[cname], name)] = pc
    return clouds


def test_shapenet_layout_tree_end_to_end(tmp_path):
    rng = np.random.RandomState(7)
    root = str(tmp_path / "shape_net_core_uniform_samples_2048")
    os.makedirs(root)
    clouds = _write_shapenet_tree(root, rng)

    # --- raw loader parity: native C++ batch loader vs python parser ------
    cat2id = snc_category_to_synth_id()
    chair_files = sorted(
        osp.join(root, cat2id["chair"], f)
        for f in os.listdir(osp.join(root, cat2id["chair"]))
    )
    pcs_native, models, syns = load_point_clouds_from_filenames(
        chair_files, n_threads=4, use_native=True
    )
    pcs_python, _, _ = load_point_clouds_from_filenames(
        chair_files, n_threads=4, use_native=False
    )
    np.testing.assert_array_equal(pcs_native, pcs_python)
    assert set(syns) == {cat2id["chair"]}
    for pc, mod, syn in zip(pcs_native, models, syns):
        np.testing.assert_allclose(pc, clouds[(syn, mod)], atol=1e-6)

    # --- load_dataset over category NAMES (synset mapping + 85/5/10) ------
    train, sl_tr, lab_tr = load_dataset(CLASSES, "train_set", root)
    val, _, _ = load_dataset(CLASSES, "val_set", root)
    test, sl_te, lab_te = load_dataset(CLASSES, "test_set", root)
    # round-half-up split of 20: 17 train / 1 val / 2 test per class
    # (reference: src/in_out.py:194-218, seed 42)
    assert train.num_examples == 34 and sl_tr == [0, 17, 34]
    assert val.num_examples == 2
    assert test.num_examples == 4 and sl_te == [0, 2, 4]
    assert lab_tr == [0] * 17 + [1] * 17 and lab_te == [0, 0, 1, 1]
    # every loaded cloud is one of the written ones, matched via labels
    for pc, label in zip(test.point_clouds, test.labels):
        syn, mod = str(label).split("_", 1)
        np.testing.assert_allclose(pc, clouds[(syn, mod)], atol=1e-6)

    # --- sort_axes -> 1-epoch train over the tree -------------------------
    from geometric_adv_tpu.train import AETrainer, Configuration

    pcs_sorted = sort_axes(train.point_clouds)
    conf = Configuration(
        n_input=[N_POINTS, 3], bneck_size=16,
        encoder_filters=[16, 32, 16], decoder_sizes=[32, 32],
        batch_size=8, training_epochs=1, learning_rate=0.001,
        saver_step=None, held_out_step=None,
        train_dir=str(tmp_path / "log"),
    )
    trainer = AETrainer(conf)
    stats = trainer.train(PointCloudDataSet(pcs_sorted, init_shuffle=False), conf)
    assert len(stats) == 1 and np.isfinite(stats[0][1])


def test_train_ae_cli_over_shapenet_layout(tmp_path):
    """--data_folder smoke: the CLI trains directly over a reference-layout
    tree addressed by real category names (reference: train_ae.py:83-105)."""
    rng = np.random.RandomState(11)
    d = str(tmp_path)
    root = osp.join(d, "data", "shape_net_core_uniform_samples_2048")
    os.makedirs(root)
    _write_shapenet_tree(root, rng)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [sys.executable, "-m", "geometric_adv_tpu.cli.train_ae",
         "--project_dir", d,
         "--data_folder", "data/shape_net_core_uniform_samples_2048",
         "--class_names", "chair", "table",
         "--n_points", str(N_POINTS), "--bneck_size", "16",
         "--batch_size", "8", "--training_epochs", "1",
         "--train_folder", "log/autoencoder_victim"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, (
        f"STDOUT:\n{result.stdout[-3000:]}\nSTDERR:\n{result.stderr[-3000:]}"
    )
    assert osp.exists(osp.join(d, "log/autoencoder_victim", "train_stats.txt"))
