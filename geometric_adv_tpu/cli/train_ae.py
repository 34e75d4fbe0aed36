"""Train the victim autoencoder (reference: autoencoder/train_ae.py)."""

import argparse
import os.path as osp

from geometric_adv_tpu.cli.common import ensure_dir
from geometric_adv_tpu.data import load_dataset, sort_axes
from geometric_adv_tpu.data.synthetic import SHAPE_CLASSES
from geometric_adv_tpu.train import AETrainer, Configuration
from geometric_adv_tpu.train.config import default_train_params

REFERENCE_CLASS_NAMES = [
    "table", "car", "chair", "airplane", "sofa", "rifle", "lamp",
    "watercraft", "bench", "loudspeaker", "cabinet", "display", "telephone",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--training_epochs", type=int, default=500)
    parser.add_argument("--save_config_and_exit", type=int, default=0)
    parser.add_argument("--sort_axes", type=int, default=1)
    parser.add_argument(
        "--train_folder", type=str, default="log/autoencoder_victim"
    )
    parser.add_argument("--project_dir", type=str, default=".")
    parser.add_argument(
        "--data_folder", type=str, default="data/synthetic_2048",
        help="ShapeNetCore-style PLY tree (class dirs of .ply models)",
    )
    parser.add_argument(
        "--class_names", nargs="+", default=None,
        help="default: the 13 reference classes if present in data_folder, "
        "else the synthetic classes",
    )
    parser.add_argument("--n_points", type=int, default=2048)
    parser.add_argument("--bneck_size", type=int, default=128)
    parser.add_argument("--loss", type=str, default="chamfer")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--learning_rate", type=float, default=None)
    parser.add_argument("--object_class", nargs="+", default=["13l"])
    flags = parser.parse_args()
    print("Train autoencoder flags:", flags)

    top_in_dir = osp.join(flags.project_dir, flags.data_folder)
    train_dir = ensure_dir(osp.join(flags.project_dir, flags.train_folder))

    class_names = flags.class_names
    if class_names is None:
        import os

        present = set(os.listdir(top_in_dir)) if osp.isdir(top_in_dir) else set()
        if set(REFERENCE_CLASS_NAMES) <= present:
            class_names = REFERENCE_CLASS_NAMES
        else:
            class_names = [c for c in SHAPE_CLASSES if c in present] or list(
                SHAPE_CLASSES
            )

    params = default_train_params()
    conf = Configuration(
        n_input=[flags.n_points, 3],
        loss=flags.loss,
        bneck_size=flags.bneck_size,
        training_epochs=flags.training_epochs,
        batch_size=flags.batch_size or params["batch_size"],
        learning_rate=flags.learning_rate or params["learning_rate"],
        train_dir=train_dir,
        saver_step=params["saver_step"],
        loss_display_step=params["loss_display_step"],
        z_rotate=params["z_rotate"],
        is_denoising=params["denoising"],
        experiment_name="autoencoder",
        object_class=flags.object_class,
        class_names=class_names,
        sort_axes=bool(flags.sort_axes),
        held_out_step=5,
    )
    conf.save(osp.join(train_dir, "configuration"))
    if flags.save_config_and_exit:
        return

    pc_data_train, _, _ = load_dataset(class_names, "train_set", top_in_dir)
    pc_data_val, _, _ = load_dataset(class_names, "val_set", top_in_dir)
    if flags.sort_axes:
        pc_data_train.point_clouds = sort_axes(pc_data_train.point_clouds)
        if pc_data_val.num_examples:
            pc_data_val.point_clouds = sort_axes(pc_data_val.point_clouds)
    if len(class_names) > 1:
        # cross-class shuffle, seed 55 (reference: train_ae.py:103-105)
        pc_data_train.shuffle_data(seed=55)
        pc_data_val.shuffle_data(seed=55)

    # Global mesh for real scale-out: any multi-host launch (cli.common
    # initialised jax.distributed from env vars, so jax.devices() spans the
    # pod) or a multi-chip TPU host. Deliberately NOT for multi-device CPU —
    # the golden-parity contract pins single-process CPU numerics, and a
    # virtual CPU mesh would reorder reductions.
    import jax

    from geometric_adv_tpu.parallel import get_mesh

    devices = jax.devices()
    use_mesh = jax.process_count() > 1 or (
        len(devices) > 1 and devices[0].platform == "tpu"
    )
    mesh = get_mesh() if use_mesh else None
    trainer = AETrainer(conf, mesh=mesh)
    with open(osp.join(train_dir, "train_stats.txt"), "a", 1) as fout:
        trainer.train(
            pc_data_train, conf, log_file=fout,
            held_out_data=pc_data_val if pc_data_val.num_examples else None,
        )


if __name__ == "__main__":
    main()
