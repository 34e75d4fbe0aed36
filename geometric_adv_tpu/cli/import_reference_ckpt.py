"""Import a reference pretrained AE checkpoint (and optionally its config).

The reference ships pretrained models as TF1 ``tf.train.Saver`` checkpoints
(download_models_and_data.sh -> ``log/autoencoder_victim/models.ckpt-500``
etc.). This driver converts one into this framework's experiment layout so
every downstream stage (tst_ae, run_attack, defenses, transfer) picks it up
via ``--restore_epoch`` exactly as if it had been trained here:

    python -m geometric_adv_tpu.cli.import_reference_ckpt \
        --reference_ckpt ref_log/autoencoder_victim/models.ckpt-500 \
        --reference_config ref_log/autoencoder_victim/configuration.txt \
        --train_folder log/autoencoder_victim

Needs the `tensorflow` package (checkpoint reader only — no graph/session);
see MIGRATION.md section 5 and train/import_tf.py for the name mapping.
"""

import argparse
import os.path as osp

from geometric_adv_tpu.cli.common import ensure_dir
from geometric_adv_tpu.train import Configuration
from geometric_adv_tpu.train.import_tf import import_reference_checkpoint


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--reference_ckpt", type=str, required=True,
        help="saver prefix, e.g. .../models.ckpt-500 (not the .index file)",
    )
    parser.add_argument(
        "--reference_config", type=str, default=None,
        help="the reference experiment's configuration.txt dump; when given, "
        "a configuration.json/.txt pair is written to the train folder and "
        "the imported weights are shape-checked against the architecture",
    )
    parser.add_argument(
        "--train_folder", type=str, default="log/autoencoder_victim"
    )
    parser.add_argument("--project_dir", type=str, default=".")
    parser.add_argument(
        "--ae_name", type=str, default=None,
        help="reference model scope; default: auto-detected from the "
        "checkpoint's variable names",
    )
    parser.add_argument(
        "--epoch", type=int, default=None,
        help="default: the saver-prefix suffix, else the epoch variable",
    )
    flags = parser.parse_args()
    print("Import reference checkpoint flags:", flags)

    if flags.reference_ckpt.endswith((".index", ".meta")) or ".data-" in (
        flags.reference_ckpt
    ):
        raise SystemExit(
            "--reference_ckpt must be the saver PREFIX (strip the "
            ".index/.data-*/.meta suffix)"
        )

    train_dir = ensure_dir(osp.join(flags.project_dir, flags.train_folder))

    conf = None
    if flags.reference_config is not None:
        conf = Configuration.from_reference_txt(flags.reference_config)
        conf.train_dir = train_dir
        conf.save(osp.join(train_dir, "configuration"))
        print(f"wrote {osp.join(train_dir, 'configuration')}.json/.txt")

    path, epoch = import_reference_checkpoint(
        flags.reference_ckpt,
        train_dir,
        ae_name=flags.ae_name,
        epoch=flags.epoch,
        conf=conf,
    )
    print(f"imported epoch {epoch} -> {path}")
    print(
        "restore with: --train_folder "
        f"{flags.train_folder} --restore_epoch {epoch}"
    )


if __name__ == "__main__":
    main()
