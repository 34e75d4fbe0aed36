"""Metro (mesh-to-mesh Hausdorff) eval of the AtlasNet transfer AE.

The port of the reference's metro pipeline
(reference: transfer/atlasnet/training/trainer_loss.py:60-101 — generate a
mesh per eval shape with the SQUARE patch decoders, compare against the
ground-truth mesh with the external ``metro`` binary, joblib-parallel over
a file list; transfer/atlasnet/training/metro.py:14-32). Here both sides
run on-device: ``atlasnet_generate_mesh`` deforms the square template grids
and carries their triangulation, and ``metro_distance`` computes the
sampled symmetric Hausdorff through the chamfer kernels
(transfer/metro.py documents the sampling tolerance).

Ground truth: ShapeNet GT meshes do not exist in this environment (zero
egress), so the GT side uses the synthetic dataset's ANALYTIC meshes —
``sample_shape_and_mesh`` rebuilds each instance's exact parametric surface
mesh in the same normalised frame as its sampled cloud
(data/synthetic.py::shape_mesh_raw; only MESHABLE_CLASSES have one). The
eval generates fresh instances with a fixed seed rather than re-deriving
the artifact-tree test split — the quantity measured (AtlasNet mesh vs GT
surface) is the same as the reference's metro loop; drop-in ShapeNet data
with real GT meshes would use the same CLI surface.
"""

import argparse
import os.path as osp

import numpy as np

from geometric_adv_tpu.cli.common import ensure_dir
from geometric_adv_tpu.data.synthetic import (
    MESHABLE_CLASSES,
    sample_shape_and_mesh,
)
from geometric_adv_tpu.train import Configuration
from geometric_adv_tpu.transfer import get_transfer_ae, load_transfer_arch
from geometric_adv_tpu.transfer.metro import metro_eval


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--transfer_ae_folder", type=str, default="log/atlasnet_for_transfer"
    )
    parser.add_argument("--transfer_ae_restore_epoch", type=int, default=None)
    parser.add_argument(
        "--ae_folder", type=str, default="log/autoencoder_victim"
    )
    parser.add_argument(
        "--class_names", nargs="+", default=None,
        help="meshable synthetic classes to evaluate (default: the "
        "intersection of the victim's classes with MESHABLE_CLASSES)",
    )
    parser.add_argument("--num_per_class", type=int, default=2)
    parser.add_argument(
        "--n_samples", type=int, default=30_000,
        help="surface samples per side of each Hausdorff evaluation "
        "(the reference metro default scale; transfer/metro.py)",
    )
    parser.add_argument("--seed", type=int, default=17)
    parser.add_argument("--project_dir", type=str, default=".")
    flags = parser.parse_args()
    print("Run metro flags:", flags)

    conf = Configuration.load(
        osp.join(flags.project_dir, flags.ae_folder, "configuration")
    )
    classes = flags.class_names or [
        c for c in conf.class_names if c in MESHABLE_CLASSES
    ]
    if not classes:
        raise SystemExit(
            "no meshable classes to evaluate (see "
            "data/synthetic.py::MESHABLE_CLASSES)"
        )

    transfer_dir = osp.join(flags.project_dir, flags.transfer_ae_folder)
    arch = load_transfer_arch(transfer_dir) or {}
    arch.pop("ae_type", None)
    trainer = get_transfer_ae(
        "atlasnet", n_points_input=conf.n_points, **arch
    )
    if trainer.model.template_type != "SQUARE":
        raise SystemExit(
            "metro mesh generation needs the SQUARE template (grid "
            "triangulation); this checkpoint was trained with "
            f"{trainer.model.template_type}"
        )
    trainer.restore(transfer_dir, flags.transfer_ae_restore_epoch)
    print("Checkpoint successfully loaded")

    rng = np.random.RandomState(flags.seed)
    out_dir = ensure_dir(osp.join(transfer_dir, "eval"))
    per_class = {}
    rows = []
    for name in classes:
        clouds, meshes = [], []
        for _ in range(flags.num_per_class):
            pc, mesh = sample_shape_and_mesh(name, conf.n_points, rng)
            assert mesh is not None, name
            clouds.append(pc)
            meshes.append(mesh)
        mean, per = metro_eval(
            trainer, clouds, meshes,
            n_samples=flags.n_samples, seed=flags.seed,
        )
        per_class[name] = mean
        rows += [(name, d) for d in per]
        print(f"metro {name}: mean {mean:.6f} ({per})")

    over = float(np.mean([d for _, d in rows]))
    np.save(
        osp.join(out_dir, "metro_distances.npy"),
        np.asarray([d for _, d in rows], np.float32),
    )
    with open(osp.join(out_dir, "metro_stats.txt"), "w", 1) as f:
        f.write("Metro (sampled mesh Hausdorff) per class\n")
        for name in classes:
            f.write(f"{name}: {per_class[name]:.6f}\n")
        f.write(f"over classes: {over:.6f}\n")
    print(f"metro over classes: {over:.6f}")


if __name__ == "__main__":
    main()
