"""PointNet autoencoder — the victim (and PointNet-transfer) model.

Architecture parity with the reference's ``mlp_architecture``
(reference: src/ae_templates.py:11-39, src/pointnet_ae.py:29-48):

- encoder: per-point MLP [64, 128, 128, 256, bneck] with BN+ReLU after every
  layer, then a max-pool symmetry over the point axis -> z[b, bneck];
- decoder: FC [256, 256, n_points*3], ReLU between, last layer linear
  (no BN anywhere in the decoder — decoder_args b_norm=False), reshaped to
  [b, n_points, 3];
- loss: Chamfer (mean of both directed means of squared NN distances) or
  approximate EMD (mean of match costs)
  (reference: src/pointnet_ae.py:71-88).

The pre-symmetry feature map [b, n, bneck] is exposed for the
critical-points defense (reference: src/autoencoder.py:170-172,
src/ae_utils.py:12-48).

TPU notes: both halves are pure MXU work (per-point Dense == k=1 conv;
the max symmetry is a VPU reduce). Everything is static-shape, jits once,
and shards over the batch axis with ``jax.sharding`` — see
``geometric_adv_tpu.parallel``.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from geometric_adv_tpu.models.layers import FCStack, PointMLP

Array = jnp.ndarray

# reference: src/ae_templates.py:22-33
DEFAULT_ENCODER_FILTERS = (64, 128, 128, 256, 128)
DEFAULT_DECODER_SIZES = (256, 256)


class PointNetAE(nn.Module):
    """Victim autoencoder: 2048 points -> 128-d bottleneck -> 2048 points."""

    n_points: int = 2048
    bneck_size: int = 128
    encoder_filters: Sequence[int] | None = None
    decoder_sizes: Sequence[int] | None = None
    bn_momentum: float = 0.9
    close_with_tanh: bool = False  # reference: src/pointnet_ae.py:40-41
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        filters = (
            tuple(self.encoder_filters)
            if self.encoder_filters is not None
            else DEFAULT_ENCODER_FILTERS[:-1] + (self.bneck_size,)
        )
        decoder_features = (
            tuple(self.decoder_sizes)
            if self.decoder_sizes is not None
            else DEFAULT_DECODER_SIZES
        ) + (self.n_points * 3,)
        self.encoder = PointMLP(
            filters,
            use_bn=True,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
        )
        self.decoder = FCStack(
            decoder_features,
            use_bn=False,
            dtype=self.dtype,
        )

    def __call__(
        self, x: Array, train: bool = False
    ) -> tuple[Array, Array, Array]:
        """Full forward pass.

        Args:
            x: [batch, n_points, 3] input clouds.
            train: BN mode — True updates batch stats (training), False uses
                the moving averages (eval / attack, where stats are frozen).

        Returns:
            (reconstruction [b, n_points, 3], z [b, bneck], pre_symmetry
            [b, n_points, bneck]).
        """
        pre_symmetry = self.encoder(x, train=train)
        z = jnp.max(pre_symmetry, axis=-2)  # symmetry: reduce_max over points
        recon = self.decode(z, train=train)
        return recon, z, pre_symmetry

    def encode(self, x: Array, train: bool = False) -> Array:
        """Latent codes only (reference: src/autoencoder.py:174-176)."""
        return jnp.max(self.encoder(x, train=train), axis=-2)

    def decode(self, z: Array, train: bool = False) -> Array:
        """Decode latent codes (reference: src/autoencoder.py:191-194)."""
        out = self.decoder(z, train=train)
        if self.close_with_tanh:
            out = nn.tanh(out)
        return out.reshape(out.shape[:-1] + (self.n_points, 3))
