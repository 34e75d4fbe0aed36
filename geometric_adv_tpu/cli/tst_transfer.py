"""Evaluate a trained transfer AE on the clean test set
(reference: transfer/foldingnet/tst_foldingnet.py:1-98 — load the victim's
``point_clouds_test_set`` eval artifact, reconstruct every cloud with the
restored transfer AE, and report the example-weighted mean chamfer loss,
plus the middle-fold loss for FoldingNet).

Beyond the reference's printed losses, this driver dumps the recon/loss
artifacts under ``<train_folder>/eval/`` with the tst_ae naming convention
so transfer recon quality is inspectable offline."""

import argparse
import os.path as osp

import numpy as np

from geometric_adv_tpu.cli.common import ensure_dir, eval_dir, list_files
from geometric_adv_tpu.ops import chamfer_loss_per_pc
from geometric_adv_tpu.train import Configuration
from geometric_adv_tpu.transfer import get_transfer_ae
from geometric_adv_tpu.utils.artifacts import load_data


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--ae_type", type=str, default="foldingnet",
        choices=["atlasnet", "foldingnet"],
    )
    parser.add_argument("--train_folder", type=str, required=True)
    parser.add_argument("--restore_epoch", type=int, default=None)
    parser.add_argument("--ae_folder", type=str, default="log/autoencoder_victim")
    parser.add_argument("--set_type", type=str, default="test_set")
    parser.add_argument("--batch_size", type=int, default=100)
    parser.add_argument("--number_points", type=int, default=2500)
    parser.add_argument("--nb_primitives", type=int, default=1)
    parser.add_argument("--template_type", type=str, default="SPHERE")
    parser.add_argument("--project_dir", type=str, default=".")
    flags = parser.parse_args()
    print("Test transfer flags:", flags)

    conf = Configuration.load(
        osp.join(flags.project_dir, flags.ae_folder, "configuration")
    )
    data_path = eval_dir(flags.project_dir, flags.ae_folder)
    point_clouds = load_data(
        data_path, list_files(data_path), [f"point_clouds_{flags.set_type}"]
    ).astype(np.float32)
    print(f"{flags.set_type}: {len(point_clouds)} examples")

    train_dir = osp.join(flags.project_dir, flags.train_folder)
    from geometric_adv_tpu.transfer import load_transfer_arch

    kwargs = dict(n_points_input=conf.n_points)
    arch = load_transfer_arch(train_dir)
    if arch is not None:
        # the checkpoint's recorded architecture wins over the flags (a
        # mismatched module could not restore anyway)
        arch.pop("ae_type", None)
        kwargs.update(arch)
        if arch:
            print(f"transfer arch from {train_dir}/arch.json: {arch}")
    elif flags.ae_type == "atlasnet":
        kwargs.update(
            number_points=flags.number_points,
            nb_primitives=flags.nb_primitives,
            template_type=flags.template_type,
        )
    ae = get_transfer_ae(flags.ae_type, **kwargs)
    ae.restore(train_dir, flags.restore_epoch)
    print("Checkpoint successfully loaded")

    recon = ae.get_reconstructions(point_clouds, batch_size=flags.batch_size)
    loss_per_pc = np.asarray(chamfer_loss_per_pc(recon, point_clouds))
    ev = ae.evaluate(point_clouds, batch_size=flags.batch_size)

    out_dir = ensure_dir(osp.join(train_dir, "eval"))
    # the reference's free-form object-class tag, e.g. "_13l"
    # (reference: src/adversary_utils.py:13-23 substring lookup)
    suffix = "_" + "_".join(conf.object_class)
    np.save(
        osp.join(out_dir, f"reconstructions_{flags.set_type}{suffix}"), recon
    )
    np.save(
        osp.join(out_dir, f"ae_loss_{flags.set_type}{suffix}"), loss_per_pc
    )

    msg = f"Testing test loss: {ev['loss']:f}"
    if "mid_loss" in ev:
        msg += f" middle test loss: {ev['mid_loss']:f}"
    print(msg)
    with open(osp.join(out_dir, "test_stats.txt"), "a", 1) as f:
        f.write(msg + "\n")


if __name__ == "__main__":
    main()
