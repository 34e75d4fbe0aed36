"""Generate a ShapeNet-like synthetic dataset (PLY tree).

This environment has no network access to ShapeNetCore (the reference's
download_data_set.sh); this stage materialises procedurally generated shape
classes in the same /class/model.ply layout so every later stage runs
unmodified.
"""

import argparse
import os.path as osp

from geometric_adv_tpu.data.synthetic import SHAPE_CLASSES, make_shapenet_like_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--project_dir", type=str, default=".")
    parser.add_argument(
        "--data_folder", type=str, default="data/synthetic_2048"
    )
    parser.add_argument(
        "--class_names", nargs="+", default=list(SHAPE_CLASSES)
    )
    parser.add_argument("--n_per_class", type=int, default=40)
    parser.add_argument("--n_points", type=int, default=2048)
    parser.add_argument("--seed", type=int, default=0)
    flags = parser.parse_args()
    print("Make synthetic data flags:", flags)

    out = make_shapenet_like_dir(
        osp.join(flags.project_dir, flags.data_folder),
        class_names=flags.class_names,
        n_per_class=flags.n_per_class,
        n_points=flags.n_points,
        seed=flags.seed,
    )
    print(f"wrote {len(flags.class_names)} classes x {flags.n_per_class} "
          f"models to {out}")


if __name__ == "__main__":
    main()
