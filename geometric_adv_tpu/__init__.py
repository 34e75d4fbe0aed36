"""geometric_adv_tpu — TPU-native framework for geometric adversarial attacks
and defenses on 3D point clouds.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
itailang/geometric_adv ("Geometric Adversarial Attacks and Defenses on 3D
Point Clouds", Lang, Kotlicki, Avidan — 3DV 2021):

- ``ops``       geometry kernels: Chamfer / nn_distance, approximate EMD,
                kNN / grouping (TPU-first: MXU-tiled Pallas kernels + pure-XLA
                fallbacks, custom VJPs matching the reference CUDA gradients).
- ``models``    PointNet autoencoder (victim / transfer), PointNet classifier,
                AtlasNet and FoldingNet transfer autoencoders.
- ``data``      PLY IO, ShapeNetCore split logic, augmentations, axis sorting.
- ``attack``    the geometric adversarial attack as a single jitted
                ``lax.scan`` (no per-iteration host round trips), sharded over
                a device mesh with ``jax.sharding``.
- ``defense``   critical-points and off-surface defenses.
- ``parallel``  device-mesh/sharding helpers and the sharded pairwise
                chamfer-matrix job.
- ``utils``     the on-disk ``.npy`` artifact-store contract shared by all
                pipeline stages, plus the stats/report writers.

The reference implementation (TF1 + CUDA custom ops) is cited throughout as
``reference:<path>:<line>`` so feature parity can be audited.
"""

__version__ = "0.1.0"

# Restore standard JAX platform-selection semantics: some environments (the
# axon TPU relay) register their PJRT plugin from sitecustomize and force
# jax_platforms at interpreter startup, stomping an explicit JAX_PLATFORMS
# env var. If the user asked for a platform via the env var, honor it.
import os as _os  # noqa: E402

_requested_platforms = _os.environ.get("JAX_PLATFORMS")
if _requested_platforms:
    try:
        import jax as _jax

        if _jax.config.jax_platforms != _requested_platforms:
            _jax.config.update("jax_platforms", _requested_platforms)
    except Exception:
        pass
del _os
