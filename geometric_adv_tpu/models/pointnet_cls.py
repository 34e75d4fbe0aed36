"""PointNet classifier with input/feature T-Nets (the semantic evaluator).

Architecture parity with the reference (itself based on Qi et al.'s
PointNet): input 3x3 T-Net -> per-point conv 64-64 -> feature 64x64 T-Net ->
conv 64-128-1024 -> max pool -> FC 512-256-num_classes with dropout
keep_prob 0.7, BN everywhere except the logits layer
(reference: classifier/pointnet_cls.py:30-84,
classifier/transform_nets.py:22-107).

Loss: softmax cross entropy + 0.001 * l2_loss(T T^T - I) on the feature
transform (reference: classifier/pointnet_cls.py:87-102; l2_loss is TF's
sum(x^2)/2 convention).

BN momentum: the reference anneals bn_decay 0.5 -> 0.99 over training
(classifier/train_classifier.py:104-110, staircase exponential on the
example count). Both models here accept a per-call ``bn_momentum`` override
— flax BatchNorm uses momentum arithmetically, so a traced scalar computed
from the step counter works; ``classify.trainer.bn_momentum_schedule``
reproduces the reference schedule exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray

# The reference's hand-rolled BN normalizes with epsilon 1e-3
# (classifier/tf_util.py:500, tf.nn.batch_normalization(..., 1e-3)) — NOT
# the 1e-5 default used everywhere tflearn-based (the AE side). Matching it
# keeps imported reference classifier checkpoints bit-faithful.
_BN_EPS = 1e-3


class TNet(nn.Module):
    """Spatial/feature transform regressor -> [B, K, K] matrix.

    Final layer is zero-initialised with an identity bias so the net starts
    as the identity transform (reference: transform_nets.py:51-63,95-106).
    """

    k: int
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(
        self, x: Array, train: bool = False, bn_momentum=None
    ) -> Array:
        mom = self.bn_momentum if bn_momentum is None else bn_momentum
        for i, width in enumerate((64, 128, 1024)):
            x = nn.Dense(width, name=f"tconv{i + 1}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=mom,
                epsilon=_BN_EPS, name=f"tbn{i + 1}",
            )(x)
            x = nn.relu(x)
        x = jnp.max(x, axis=-2)  # max over points
        for i, width in enumerate((512, 256)):
            x = nn.Dense(width, name=f"tfc{i + 1}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=mom,
                epsilon=_BN_EPS, name=f"tfc_bn{i + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.Dense(
            self.k * self.k,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="transform",
        )(x)
        eye = jnp.eye(self.k, dtype=x.dtype).reshape(-1)
        return (x + eye).reshape(x.shape[:-1] + (self.k, self.k))


class PointNetClassifier(nn.Module):
    """Full PointNet classifier (reference: classifier/pointnet_cls.py:30-84).

    ``use_tnets=False`` gives the "basic" variant without the transform nets
    (reference: classifier/pointnet_cls_basic.py); its feature-transform
    output is then the identity, making the orthogonality regulariser zero.
    """

    num_classes: int = 13
    bn_momentum: float = 0.9
    dropout_rate: float = 0.3  # reference keep_prob 0.7
    use_tnets: bool = True

    @nn.compact
    def __call__(
        self, x: Array, train: bool = False, bn_momentum=None
    ) -> tuple[Array, Array]:
        """Returns (logits [B, num_classes], feature transform [B, 64, 64]).

        ``bn_momentum`` (scalar, may be traced) overrides the static default
        — the trainer passes the reference's annealed 0.5 -> 0.99 schedule.
        """
        mom = self.bn_momentum if bn_momentum is None else bn_momentum

        def conv_bn(h, width, name):
            h = nn.Dense(width, name=name)(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=mom,
                epsilon=_BN_EPS, name=name + "_bn",
            )(h)
            return nn.relu(h)

        if self.use_tnets:
            t_in = TNet(
                k=3, bn_momentum=self.bn_momentum, name="transform_net1"
            )(x, train=train, bn_momentum=bn_momentum)
            x = jnp.einsum("...nc,...ck->...nk", x, t_in)

        x = conv_bn(x, 64, "conv1")
        x = conv_bn(x, 64, "conv2")

        if self.use_tnets:
            t_feat = TNet(
                k=64, bn_momentum=self.bn_momentum, name="transform_net2"
            )(x, train=train, bn_momentum=bn_momentum)
            x = jnp.einsum("...nc,...ck->...nk", x, t_feat)
        else:
            t_feat = jnp.broadcast_to(
                jnp.eye(64, dtype=x.dtype), x.shape[:-2] + (64, 64)
            )

        x = conv_bn(x, 64, "conv3")
        x = conv_bn(x, 128, "conv4")
        x = conv_bn(x, 1024, "conv5")

        x = jnp.max(x, axis=-2)  # global max pool

        x = conv_bn(x, 512, "fc1")
        x = nn.Dropout(self.dropout_rate, deterministic=not train, name="dp1")(x)
        x = conv_bn(x, 256, "fc2")
        x = nn.Dropout(self.dropout_rate, deterministic=not train, name="dp2")(x)
        logits = nn.Dense(self.num_classes, name="fc3")(x)
        return logits, t_feat


def classifier_loss(
    logits: Array, labels: Array, transform: Array, reg_weight: float = 0.001
) -> Array:
    """Softmax CE + orthogonality regulariser
    (reference: classifier/pointnet_cls.py:87-102)."""
    log_probs = jax.nn.log_softmax(logits)
    ce = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1).mean()
    k = transform.shape[-1]
    diff = (
        jnp.einsum("...ij,...kj->...ik", transform, transform)
        - jnp.eye(k, dtype=transform.dtype)
    )
    mat_loss = 0.5 * jnp.sum(diff * diff)  # tf.nn.l2_loss convention
    return ce + reg_weight * mat_loss
