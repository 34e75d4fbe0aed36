"""Shared building blocks for the point-cloud models.

The reference builds everything from tflearn ``conv_1d`` with filter_size 1 —
i.e. a per-point shared MLP — plus tflearn ``batch_normalization`` and plain
``fully_connected`` stacks (reference: src/encoders_decoders.py:19-147).
On TPU a k=1 conv IS a Dense layer on the channel axis: it lowers to a single
[*, n, c_in] x [c_in, c_out] matmul on the MXU, so that is what we build.

BatchNorm semantics preserved from tflearn:
- ``decay`` (here ``momentum``) controls the moving-average update;
- the attack/defense stages freeze moving stats by forcing decay = 1.0 and
  running in inference mode (reference: attacker/run_attack.py:88-90) —
  with flax this is simply ``use_running_average=True`` and never mutating
  ``batch_stats``, which we get for free in the pure-functional apply.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class PointMLP(nn.Module):
    """Stack of per-point Dense layers (conv1d with filter size 1).

    Mirrors ``encoder_with_convs_and_symmetry``'s conv stack
    (reference: src/encoders_decoders.py:37-68): Dense -> [BN] -> ReLU per
    layer, applied identically to every point.
    """

    features: Sequence[int]
    use_bn: bool = True
    bn_momentum: float = 0.9
    activation: Callable[[Array], Array] = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for i, width in enumerate(self.features):
            x = nn.Dense(
                width, dtype=self.dtype, name=f"conv_{i}"
            )(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=self.bn_momentum,
                    dtype=self.dtype,
                    name=f"bn_{i}",
                )(x)
            x = self.activation(x)
        return x


class ConvUpsampleDecoder(nn.Module):
    """Per-point conv decoder with tile-upsampling between layers.

    Mirrors ``decoder_with_convs_only`` (reference:
    src/encoders_decoders.py:150-196): conv(k=1) -> [BN] -> ReLU per layer
    (last layer linear, optional finishing BN), with optional
    ``tf.tile``-style upsampling of the point axis after a layer. Unused by
    the reference's main experiment path but part of its model-framework
    surface.
    """

    features: Sequence[int]
    upsample_sizes: Sequence[int | None] | None = None
    use_bn: bool = True
    bn_finish: bool = False
    bn_momentum: float = 0.9
    activation: Callable[[Array], Array] = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        n_layers = len(self.features)
        for i, width in enumerate(self.features):
            last = i == n_layers - 1
            x = nn.Dense(width, dtype=self.dtype, name=f"conv_{i}")(x)
            if (self.use_bn and not last) or (last and self.bn_finish):
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=self.bn_momentum,
                    dtype=self.dtype,
                    name=f"bn_{i}",
                )(x)
            if not last:
                x = self.activation(x)
            if self.upsample_sizes is not None and self.upsample_sizes[i]:
                reps = self.upsample_sizes[i]
                x = jnp.tile(x, (1,) * (x.ndim - 2) + (reps, 1))
        return x


class FCStack(nn.Module):
    """Fully-connected stack; the last layer is always linear.

    Mirrors ``decoder_with_fc_only`` (reference: src/encoders_decoders.py:
    86-147): hidden layers Dense -> [BN] -> ReLU, final layer linear with
    optional finishing BN.
    """

    features: Sequence[int]
    use_bn: bool = False
    bn_finish: bool = False
    bn_momentum: float = 0.9
    activation: Callable[[Array], Array] = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        n_layers = len(self.features)
        for i, width in enumerate(self.features):
            last = i == n_layers - 1
            x = nn.Dense(width, dtype=self.dtype, name=f"fc_{i}")(x)
            if (self.use_bn and not last) or (last and self.bn_finish):
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=self.bn_momentum,
                    dtype=self.dtype,
                    name=f"bn_{i}",
                )(x)
            if not last:
                x = self.activation(x)
        return x
