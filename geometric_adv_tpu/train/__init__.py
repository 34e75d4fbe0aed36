"""Training infrastructure: configuration, AE trainer, checkpointing."""

from geometric_adv_tpu.train.config import Configuration
from geometric_adv_tpu.train.trainer import AETrainer, AEState

__all__ = ["Configuration", "AETrainer", "AEState"]
