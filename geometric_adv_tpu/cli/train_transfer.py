"""Train a transfer autoencoder on the shared eval artifacts
(reference: transfer/atlasnet/train.py via runner_atlasnet.sh --custom_data,
transfer/train_foldingnet.py, and autoencoder/train_ae.py for the PointNet
transfer victim)."""

import argparse
import os.path as osp

from geometric_adv_tpu.cli.common import ensure_dir
from geometric_adv_tpu.data import load_dataset, sort_axes
from geometric_adv_tpu.train import Configuration
from geometric_adv_tpu.transfer import get_transfer_ae


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--ae_type", type=str, default="atlasnet",
        choices=["atlasnet", "foldingnet"],
    )
    parser.add_argument("--epochs", type=int, default=150)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--learning_rate", type=float, default=None)
    parser.add_argument("--bn_momentum", type=float, default=0.9)
    parser.add_argument("--number_points", type=int, default=2500)
    parser.add_argument("--nb_primitives", type=int, default=1)
    parser.add_argument("--template_type", type=str, default="SPHERE")
    parser.add_argument("--train_folder", type=str, default=None)
    parser.add_argument(
        "--val_step", type=int, default=1,
        help="epochs between held-out evals; 0 disables",
    )
    parser.add_argument("--ae_folder", type=str, default="log/autoencoder_victim")
    parser.add_argument("--project_dir", type=str, default=".")
    parser.add_argument("--data_folder", type=str, default="data/synthetic_2048")
    flags = parser.parse_args()
    print("Train transfer flags:", flags)

    conf = Configuration.load(
        osp.join(flags.project_dir, flags.ae_folder, "configuration")
    )
    train_folder = flags.train_folder or f"log/{flags.ae_type}_for_transfer"
    train_dir = ensure_dir(osp.join(flags.project_dir, train_folder))

    ds, _, _ = load_dataset(
        conf.class_names, "train_set",
        osp.join(flags.project_dir, flags.data_folder),
    )
    pcs = sort_axes(ds.point_clouds) if conf.sort_axes else ds.point_clouds

    # per-epoch validation eval, like both reference transfer trainers
    # (reference: transfer/foldingnet/train_foldingnet.py:129-171,
    # transfer/atlasnet/training/trainer.py:83-110)
    val_pcs = None
    if flags.val_step > 0:
        val_ds, _, _ = load_dataset(
            conf.class_names, "val_set",
            osp.join(flags.project_dir, flags.data_folder),
        )
        val_pcs = (
            sort_axes(val_ds.point_clouds) if conf.sort_axes
            else val_ds.point_clouds
        )

    kwargs = dict(
        n_points_input=conf.n_points, bn_momentum=flags.bn_momentum
    )
    if flags.learning_rate is not None:
        kwargs["learning_rate"] = flags.learning_rate
    if flags.ae_type == "atlasnet":
        kwargs.update(
            number_points=flags.number_points,
            nb_primitives=flags.nb_primitives,
            template_type=flags.template_type,
        )
    trainer = get_transfer_ae(flags.ae_type, **kwargs)
    # record the architecture so inference CLIs (tst/run_transfer,
    # run_metro) rebuild the matching module from the checkpoint dir alone
    from geometric_adv_tpu.transfer import save_transfer_arch

    arch = {}
    if flags.ae_type == "atlasnet":
        arch = dict(
            number_points=flags.number_points,
            nb_primitives=flags.nb_primitives,
            template_type=flags.template_type,
        )
    save_transfer_arch(train_dir, flags.ae_type, **arch)
    with open(osp.join(train_dir, "train_stats.txt"), "a", 1) as log:
        trainer.train(
            pcs, epochs=flags.epochs, batch_size=flags.batch_size,
            log_file=log, tag=flags.ae_type,
            held_out=val_pcs, val_step=max(flags.val_step, 1),
        )
    trainer.save(train_dir)
    print("saved checkpoint to", train_dir)


if __name__ == "__main__":
    main()
