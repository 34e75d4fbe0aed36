"""FoldingNet transfer autoencoder.

Parity with the reference (transfer/foldingnet/foldingnet.py:57-189,
prepare_graph.py:45-114):

- graph features: per point, a 16-NN graph and the 3x3 covariance of the
  16 neighbors (flattened to 9 dims) — the reference builds these with a
  host KDTree + scipy sparse matrices in a multiprocessing pool; here they
  are one jitted TPU program over our knn/grouping ops;
- encoder: concat [xyz | cov9] (12) -> conv 64-64-64 (BN+relu) -> graph
  max-pool -> relu -> conv 128 -> BN+relu -> graph max-pool -> relu ->
  conv 1024 -> BN -> global max -> FC 512 (BN+relu) -> FC 512 -> code;
- graph max-pool: max over each point's 16 neighbors then elementwise max
  with the point itself (reference: foldingnet.py:33-54);
- decoder: two folds of a 45x45 grid in [-0.3, 0.3]^2 conditioned on the
  512 code (fold1: [code|grid] 514 -> 512 -> 512 -> 3; fold2:
  [code|fold1] 515 -> 512 -> 512 -> 3) -> 2025 points.

TPU re-design note: the reference samples 16 neighbors randomly without
replacement from the symmetrised adjacency (foldingnet.py:33-44) — a
reproducibility hazard its own authors comment on. The dense [n, 16]
knn-index formulation here is deterministic; the self-max makes the
asymmetric/symmetric distinction immaterial for the pooled features.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from geometric_adv_tpu.ops.grouping import group_point, knn_point

Array = jnp.ndarray

GRID_SIZE = 45  # 45^2 = 2025 output points (reference: foldingnet.py:158-166)
NUM_KNN = 16


def folding_grid() -> np.ndarray:
    """reference: foldingnet.py:138-155 (meshgrid [-0.3, 0.3, 45]^2)."""
    xs = np.linspace(-0.3, 0.3, GRID_SIZE)
    ret = np.meshgrid(xs, xs)
    grid = np.zeros((GRID_SIZE * GRID_SIZE, 2), np.float32)
    for d in range(2):
        grid[:, d] = ret[d].reshape(-1)
    return grid


@jax.jit
def graph_features(point_clouds: Array) -> tuple[Array, Array]:
    """16-NN indices + per-point neighbor covariance.

    Replaces the host KDTree + np.cov pipeline
    (reference: prepare_graph.py:45-74) with one jitted program.

    Returns (knn_idx [..., n, 16], cov [..., n, 9]).
    """
    _, idx = knn_point(NUM_KNN + 1, point_clouds, point_clouds)
    nbr_idx = idx[..., 1:]  # drop self (reference uses nbsi[1:])
    nbrs = group_point(point_clouds, nbr_idx)  # [..., n, 16, 3]
    mean = jnp.mean(nbrs, axis=-2, keepdims=True)
    centered = nbrs - mean
    # np.cov default: unbiased (divide by k-1)
    cov = jnp.einsum("...ki,...kj->...ij", centered, centered) / (NUM_KNN - 1)
    cov = cov.reshape(cov.shape[:-2] + (9,))
    return nbr_idx, cov


def graph_max_pool(features: Array, nbr_idx: Array) -> Array:
    """Max over each point's neighbors, then max with itself
    (reference: foldingnet.py:33-54)."""
    nbr_feats = group_point(features, nbr_idx)  # [..., n, k, c]
    return jnp.maximum(jnp.max(nbr_feats, axis=-2), features)


class FoldingNetEncoder(nn.Module):
    """reference: foldingnet.py:57-104 (FoldingNetEnc_with_graph)."""

    bn_momentum: float = 0.9

    @nn.compact
    def __call__(
        self, x: Array, cov: Array, nbr_idx: Array, train: bool = False
    ) -> Array:
        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                name=name,
            )(h)

        h = jnp.concatenate([x, cov], axis=-1)  # [..., n, 12]
        h = nn.relu(bn(nn.Dense(64, name="conv1")(h), "bn1"))
        h = nn.relu(bn(nn.Dense(64, name="conv2")(h), "bn2"))
        h = nn.relu(bn(nn.Dense(64, name="conv3")(h), "bn3"))
        h = nn.relu(graph_max_pool(h, nbr_idx))
        h = nn.relu(bn(nn.Dense(128, name="conv4")(h), "bn4"))
        h = nn.relu(graph_max_pool(h, nbr_idx))
        h = bn(nn.Dense(1024, name="conv5")(h), "bn5")
        h = jnp.max(h, axis=-2)  # global max
        h = nn.relu(bn(nn.Dense(512, name="fc1")(h), "bn6"))
        return nn.Dense(512, name="fc2")(h)


class FoldingNetDecoder(nn.Module):
    """Two-fold grid decoder (reference: foldingnet.py:107-189)."""

    @nn.compact
    def __call__(self, code: Array) -> tuple[Array, Array]:
        m = GRID_SIZE * GRID_SIZE
        grid = jnp.asarray(folding_grid())  # [m, 2]
        code_rep = jnp.broadcast_to(
            code[..., None, :], code.shape[:-1] + (m, code.shape[-1])
        )
        grid_rep = jnp.broadcast_to(grid, code.shape[:-1] + (m, 2))

        h = jnp.concatenate([code_rep, grid_rep], axis=-1)  # [..., m, 514]
        for i, width in enumerate((512, 512)):
            h = nn.relu(nn.Dense(width, name=f"fold1_conv{i + 1}")(h))
        p1 = nn.Dense(3, name="fold1_conv3")(h)  # first fold

        h = jnp.concatenate([code_rep, p1], axis=-1)  # [..., m, 515]
        for i, width in enumerate((512, 512)):
            h = nn.relu(nn.Dense(width, name=f"fold2_conv{i + 1}")(h))
        out = nn.Dense(3, name="fold2_conv3")(h)
        return out, p1


class FoldingNet(nn.Module):
    """reference: foldingnet.py:192-206 (FoldingNet_graph)."""

    bn_momentum: float = 0.9

    def setup(self):
        self.encoder = FoldingNetEncoder(bn_momentum=self.bn_momentum)
        self.decoder = FoldingNetDecoder()

    def __call__(
        self, x: Array, cov: Array, nbr_idx: Array, train: bool = False
    ) -> tuple[Array, Array, Array]:
        """Returns (recon [..., 2025, 3], first fold, code [..., 512])."""
        code = self.encoder(x, cov, nbr_idx, train=train)
        recon, p1 = self.decoder(code)
        return recon, p1, code

    def encode(
        self, x: Array, cov: Array, nbr_idx: Array, train: bool = False
    ) -> Array:
        return self.encoder(x, cov, nbr_idx, train=train)
