"""Data & IO: PLY parsing, ShapeNetCore loading/splitting, augmentations."""

from geometric_adv_tpu.data.augment import (
    apply_augmentations,
    rand_rotation_matrix,
    sort_axes,
)
from geometric_adv_tpu.data.datasets import (
    PointCloudDataSet,
    load_dataset,
    split_data,
)
from geometric_adv_tpu.data.ply import load_ply, save_ply

__all__ = [
    "load_ply",
    "save_ply",
    "PointCloudDataSet",
    "load_dataset",
    "split_data",
    "sort_axes",
    "apply_augmentations",
    "rand_rotation_matrix",
]
