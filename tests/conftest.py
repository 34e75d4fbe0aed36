"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (the driver separately dry-runs the multi-chip
path via __graft_entry__.dryrun_multichip).
"""

import os

# Hard override: the session environment pins jax to the real TPU (the axon
# PJRT plugin sets jax_platforms="axon,cpu" from sitecustomize at interpreter
# startup), so both the env var AND the jax config must be forced back to CPU
# before any backend initialises.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# float64 available for finite-difference gradient checks (explicit f32 test
# inputs stay f32).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
