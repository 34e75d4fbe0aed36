"""Classifier test-set accuracy (reference: classifier/tst_classifier.py)."""

import argparse
import os.path as osp


from geometric_adv_tpu.classify import ClassifierTrainer
from geometric_adv_tpu.cli.common import eval_dir, list_files
from geometric_adv_tpu.train import Configuration
from geometric_adv_tpu.utils.artifacts import load_data


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--classifier_folder", type=str, default="log/pointnet")
    parser.add_argument("--classifier_restore_epoch", type=int, default=None)
    parser.add_argument("--ae_folder", type=str, default="log/autoencoder_victim")
    parser.add_argument("--project_dir", type=str, default=".")
    flags = parser.parse_args()
    print("Test classifier flags:", flags)

    conf = Configuration.load(
        osp.join(flags.project_dir, flags.ae_folder, "configuration")
    )
    data_path = eval_dir(flags.project_dir, flags.ae_folder)
    files = list_files(data_path)
    point_clouds, pc_label = load_data(
        data_path, files, ["point_clouds_test_set", "pc_label_test_set"]
    )

    trainer = ClassifierTrainer(
        num_classes=len(conf.class_names), num_points=conf.n_points
    )
    trainer.restore(
        osp.join(flags.project_dir, flags.classifier_folder),
        flags.classifier_restore_epoch,
    )
    pred = trainer.classify(point_clouds)
    acc = float((pred == pc_label).mean())
    print(f"test accuracy: {acc:.4f}")
    per_class = {}
    for c, name in enumerate(conf.class_names):
        mask = pc_label == c
        if mask.any():
            per_class[name] = float((pred[mask] == c).mean())
    for name, a in per_class.items():
        print(f"  {name}: {a:.4f}")


if __name__ == "__main__":
    main()
