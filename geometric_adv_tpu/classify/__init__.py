"""Semantic evaluation: PointNet classifier training and inference."""

from geometric_adv_tpu.classify.trainer import ClassifierTrainer

__all__ = ["ClassifierTrainer"]
