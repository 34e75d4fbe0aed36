"""Mesh construction and batch-sharding utilities.

Design: all workloads in this framework are embarrassingly batch-parallel
(training batches; the 19,500-attack pair grid; the chamfer NN matrix), so
the canonical mesh is 1-D over every available chip with axis name ``data``.
Model parameters are tiny (~1.5 M for the victim AE) and are replicated;
XLA's all-reduce over ICI handles gradient sync under jit.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
(the helpers below use ``jax.devices()``, which is global across hosts).
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad ``x`` along ``axis`` (repeating the last element) to a multiple.

    Returns (padded, original_length). Sharded batch jobs need the global
    batch divisible by the mesh size; padding with a repeated element keeps
    shapes static and the pad rows are sliced off after the computation.
    """
    n = x.shape[axis]
    target = math.ceil(n / multiple) * multiple
    if target == n:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, target - n)
    return np.pad(x, pad_width, mode="edge"), n


def shard_batch(x, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put a host array with its leading dim sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
