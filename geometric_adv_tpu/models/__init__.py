"""Model families: PointNet AE (victim / transfer), PointNet classifier,
AtlasNet and FoldingNet transfer autoencoders."""

from geometric_adv_tpu.models.pointnet_ae import PointNetAE

__all__ = ["PointNetAE"]
