"""Geometric adversarial attack (output-space and latent-space variants)."""

from geometric_adv_tpu.attack.core import AttackRunner, attack_batch
from geometric_adv_tpu.attack.pipeline import (
    get_idx_for_correct_pred,
    prepare_data_for_attack,
)

__all__ = [
    "attack_batch",
    "AttackRunner",
    "prepare_data_for_attack",
    "get_idx_for_correct_pred",
]
