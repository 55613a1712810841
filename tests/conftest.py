"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise real multi-device code paths without TPU hardware."""

import os

# The session environment pins JAX_PLATFORMS=axon (the tunneled TPU);
# tests must run hermetically on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
