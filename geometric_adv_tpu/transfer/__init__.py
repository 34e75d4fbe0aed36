"""Transfer autoencoders (AtlasNet, FoldingNet, PointNet) used to evaluate
attack transferability (reference: transfer/run_transfer.py)."""

from geometric_adv_tpu.transfer.trainers import (
    AtlasNetTrainer,
    FoldingNetTrainer,
    get_transfer_ae,
    load_transfer_arch,
    save_transfer_arch,
)
from geometric_adv_tpu.transfer.metro import (
    atlasnet_generate_mesh,
    metro_distance,
    metro_eval,
)

__all__ = [
    "AtlasNetTrainer",
    "FoldingNetTrainer",
    "get_transfer_ae",
    "load_transfer_arch",
    "save_transfer_arch",
    "atlasnet_generate_mesh",
    "metro_distance",
    "metro_eval",
]
