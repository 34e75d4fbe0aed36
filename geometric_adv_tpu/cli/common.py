"""Shared CLI plumbing: eval-artifact loading, attack-context assembly.

Mirrors the preamble every reference driver repeats
(e.g. attacker/run_attack.py:54-77, defender/run_defense_critical.py:39-84).
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from geometric_adv_tpu.attack.pipeline import prepare_data_for_attack
from geometric_adv_tpu.data.datasets import create_dir
from geometric_adv_tpu.parallel import maybe_initialize_from_env
from geometric_adv_tpu.train.config import Configuration
from geometric_adv_tpu.utils.artifacts import load_data

# Multi-host wiring for every pipeline CLI: when the GAT_*/JAX_* cluster env
# vars are present, the distributed runtime comes up before any stage touches
# a device, so jax.devices()/get_mesh() are global and any stage runs on a
# pod without code changes (SURVEY §2.3 TPU plan). No-op otherwise.
maybe_initialize_from_env()

NN_IDX_DICT = {
    "latent_nn": "latent_nn_idx_test_set",
    "chamfer_nn_complete": "chamfer_nn_idx_complete_test_set",
}


def eval_dir(project_dir: str, ae_folder: str) -> str:
    return osp.join(project_dir, ae_folder, "eval")


def list_files(data_path: str):
    return [
        f for f in os.listdir(data_path) if osp.isfile(osp.join(data_path, f))
    ]


class AttackContext:
    """Everything the attack/defense/classifier/transfer stages share."""

    def __init__(self, project_dir, ae_folder, attack_folder=None,
                 attack_pc_idx=None, num_pc_for_attack=None):
        self.project_dir = project_dir
        self.ae_dir = osp.join(project_dir, ae_folder)
        self.data_path = eval_dir(project_dir, ae_folder)
        self.files = list_files(self.data_path)

        (self.point_clouds, self.latent_vectors, self.pc_classes,
         self.slice_idx, self.ae_loss) = load_data(
            self.data_path, self.files,
            ["point_clouds_test_set", "latent_vectors_test_set", "pc_classes",
             "slice_idx_test_set", "ae_loss_test_set"],
        )
        assert np.all(self.ae_loss > 0), (
            "not all autoencoder loss values are larger than 0"
        )
        try:
            self.reconstructions = load_data(
                self.data_path, self.files, ["reconstructions_test_set"]
            )
        except FileNotFoundError:
            self.reconstructions = None

        self.attack_dir = (
            osp.join(self.data_path, attack_folder) if attack_folder else None
        )
        if self.attack_dir and osp.exists(
            osp.join(self.attack_dir, "attack_configuration.json")
        ):
            self.conf = Configuration.load(
                osp.join(self.attack_dir, "attack_configuration")
            )
        else:
            self.conf = Configuration.load(
                osp.join(self.ae_dir, "configuration")
            )

        self.nn_idx = None
        if self.conf.target_pc_idx_type in NN_IDX_DICT:
            try:
                self.nn_idx = load_data(
                    self.data_path, self.files,
                    [NN_IDX_DICT[self.conf.target_pc_idx_type]],
                )
            except FileNotFoundError:
                pass

        self.correct_pred = None
        if self.conf.correct_pred_only:
            pc_labels, pc_pred_labels = load_data(
                self.data_path, self.files,
                ["pc_label_test_set", "pc_pred_labels_test_set"],
            )
            self.correct_pred = pc_labels == pc_pred_labels

        self.attack_pc_idx = None
        if attack_pc_idx:
            idx = np.load(osp.join(project_dir, attack_pc_idx))
            n = num_pc_for_attack or self.conf.num_pc_for_attack
            self.attack_pc_idx = idx[:, :n]

    def class_attack_data(self, class_name, data, num_pc_for_target=None):
        """Pair-grid rows of ``data`` for one source class
        (reference: attacker/run_attack.py:127-129)."""
        return prepare_data_for_attack(
            self.pc_classes,
            [class_name],
            list(self.conf.class_names),
            data,
            self.slice_idx,
            self.attack_pc_idx,
            num_pc_for_target or self.conf.num_pc_for_target,
            self.nn_idx,
            self.correct_pred,
        )

    def classes_iter(self):
        for i, name in enumerate(self.pc_classes):
            if name in self.conf.class_names:
                yield i, str(name)


def restore_victim(conf: Configuration, ae_dir: str, restore_epoch=None,
                   mesh=None):
    """Build + restore the victim AE
    (reference: run_attack.py:120-122, run_defense_critical.py:87-91)."""
    from geometric_adv_tpu.train.trainer import AETrainer

    trainer = AETrainer(conf, mesh=mesh)
    trainer.restore(ae_dir, restore_epoch)
    return trainer


def ensure_dir(path: str) -> str:
    return create_dir(path)


def set_matmul_precision(precision: str | None) -> None:
    """Optionally pin XLA matmul precision.

    TPU matmuls default to bf16, which limits cross-program AE replay to
    ~1e-3 (different XLA programs tile/fuse differently). The chamfer/EMD
    metrics are exact regardless (dedicated f32 kernels); pass
    --matmul_precision float32 to EVERY stage for strict 1e-6 replay parity
    at ~15% throughput cost."""
    if precision:
        import jax

        jax.config.update("jax_default_matmul_precision", precision)
