"""Geometry ops: Chamfer / nn_distance, approximate EMD, kNN / grouping.

TPU-native equivalents of the reference's three CUDA op libraries
(reference: external/structural_losses/, external/grouping/).
"""

from geometric_adv_tpu.ops.chamfer import (
    chamfer_loss,
    chamfer_loss_per_pc,
    fscore,
    nn_distance,
    pairwise_sqdist,
)
from geometric_adv_tpu.ops.emd import approx_match, emd_loss_per_pc, match_cost
from geometric_adv_tpu.ops.grouping import (
    group_point,
    knn_point,
    query_ball_point,
    select_top_k,
)

__all__ = [
    "fscore",
    "nn_distance",
    "pairwise_sqdist",
    "chamfer_loss",
    "chamfer_loss_per_pc",
    "approx_match",
    "match_cost",
    "emd_loss_per_pc",
    "knn_point",
    "group_point",
    "query_ball_point",
    "select_top_k",
]
