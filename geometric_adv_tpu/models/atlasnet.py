"""AtlasNet transfer autoencoder.

Parity with the reference's vendored PyTorch trainer
(reference: transfer/atlasnet/model/model_blocks.py:28-105,
model/atlasnet.py:18-69, auxiliary/argument_parser.py defaults):

- encoder: PointNet conv 64-128-1024 (BN; last layer BN without relu) ->
  max pool -> two FC 1024 with BN+relu -> latent 1024;
- decoder: ``nb_primitives`` Mapping2Dto3D MLPs — template point (dim 3
  SPHERE / 2 SQUARE) lifted to bottleneck width with the latent **added as a
  bias after the first layer**, then BN+relu conv stack
  [bottleneck, 512, 512, 512] -> 3;
- default config: 2500 points, 1 SPHERE primitive, bottleneck 1024,
  hidden 512, 2 extra hidden layers.

TPU re-design notes:
- primitives are a vmapped axis instead of a sequential ModuleList
  (reference: model/atlasnet.py:64-66 runs them in a Python loop);
- "regular" eval sampling of the sphere uses a Fibonacci lattice (the
  reference uses a pymesh icosphere's vertices — same near-uniform coverage,
  dependency-free and static-shape); squares use a regular grid like the
  reference (template.py:91-117).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def sphere_template_points(n: int) -> np.ndarray:
    """Deterministic near-uniform points on the unit sphere (Fibonacci)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi),
         np.cos(phi)], axis=1,
    ).astype(np.float32)


def square_template_points(n: int) -> np.ndarray:
    """Regular grid in the unit square (reference: template.py:91-117)."""
    grain = int(np.sqrt(n))
    xs = np.linspace(0, 1, grain)
    g = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    return g.astype(np.float32)[:n]


def random_template_points(key, nb_primitives, n, dim):
    """Train-time uniform template sampling
    (reference: template.py:66-73 / 37-44)."""
    if dim == 2:
        return jax.random.uniform(key, (nb_primitives, n, 2), jnp.float32)
    v = jax.random.normal(key, (nb_primitives, n, 3), jnp.float32)
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)


class AtlasNetEncoder(nn.Module):
    """reference: model_blocks.py:28-60."""

    nlatent: int = 1024
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                name=name,
            )(h)

        x = nn.relu(bn(nn.Dense(64, name="conv1")(x), "bn1"))
        x = nn.relu(bn(nn.Dense(128, name="conv2")(x), "bn2"))
        x = bn(nn.Dense(self.nlatent, name="conv3")(x), "bn3")  # no relu
        x = jnp.max(x, axis=-2)
        x = nn.relu(bn(nn.Dense(self.nlatent, name="lin1")(x), "bn4"))
        x = nn.relu(bn(nn.Dense(self.nlatent, name="lin2")(x), "bn5"))
        return x


class Mapping2Dto3D(nn.Module):
    """One patch decoder (reference: model_blocks.py:63-105)."""

    bottleneck_size: int = 1024
    hidden_neurons: int = 512
    num_layers: int = 2
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(
        self, template_pts: Array, latent: Array, train: bool = False
    ) -> Array:
        """template_pts [..., P, dim], latent [..., bottleneck] -> [..., P, 3]."""

        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                name=name,
            )(h)

        # latent added as a bias after the first conv (model_blocks.py:103)
        h = nn.Dense(self.bottleneck_size, name="conv1")(template_pts)
        h = h + latent[..., None, :]
        h = nn.relu(bn(h, "bn1"))
        h = nn.relu(bn(nn.Dense(self.hidden_neurons, name="conv2")(h), "bn2"))
        for i in range(self.num_layers):
            h = nn.relu(
                bn(nn.Dense(self.hidden_neurons, name=f"conv_list{i}")(h),
                   f"bn_list{i}")
            )
        return nn.Dense(3, name="last_conv")(h)


class AtlasNet(nn.Module):
    """Full AtlasNet AE (reference: model/model.py:10, model/atlasnet.py:18)."""

    number_points: int = 2500
    nb_primitives: int = 1
    template_type: str = "SPHERE"  # {SPHERE (dim 3), SQUARE (dim 2)}
    bottleneck_size: int = 1024
    hidden_neurons: int = 512
    num_layers: int = 2
    bn_momentum: float = 0.9

    @property
    def template_dim(self) -> int:
        return 3 if self.template_type == "SPHERE" else 2

    @property
    def pts_per_primitive(self) -> int:
        return self.number_points // self.nb_primitives

    def setup(self):
        self.encoder = AtlasNetEncoder(
            nlatent=self.bottleneck_size, bn_momentum=self.bn_momentum
        )
        self.decoders = [
            Mapping2Dto3D(
                bottleneck_size=self.bottleneck_size,
                hidden_neurons=self.hidden_neurons,
                num_layers=self.num_layers,
                bn_momentum=self.bn_momentum,
                name=f"decoder_{i}",
            )
            for i in range(self.nb_primitives)
        ]

    def regular_template(self) -> np.ndarray:
        fn = (
            sphere_template_points
            if self.template_type == "SPHERE"
            else square_template_points
        )
        return fn(self.pts_per_primitive)

    def encode(self, x: Array, train: bool = False) -> Array:
        return self.encoder(x, train=train)

    def decode(
        self, latent: Array, template_pts: Array, train: bool = False
    ) -> Array:
        """template_pts: [nb_primitives, P, dim] -> [..., nb_prim * P, 3]."""
        outs = [
            dec(template_pts[i], latent, train=train)
            for i, dec in enumerate(self.decoders)
        ]
        out = jnp.concatenate(outs, axis=-2)
        return out

    def __call__(
        self, x: Array, template_pts: Array | None = None, train: bool = False
    ) -> tuple[Array, Array]:
        if template_pts is None:
            template_pts = jnp.asarray(self.regular_template())[None]
            template_pts = jnp.broadcast_to(
                template_pts,
                (self.nb_primitives,) + template_pts.shape[1:],
            )
        latent = self.encode(x, train=train)
        recon = self.decode(latent, template_pts, train=train)
        return recon, latent
