"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise real multi-device code paths without TPU hardware."""

import os

# The session environment pins JAX_PLATFORMS=axon (the tunneled TPU);
# tests must run hermetically on the virtual CPU mesh.  jax 0.9 removed
# the xla_force_host_platform_device_count XLA flag; jax_num_cpu_devices
# is the supported mechanism (must be set before backend init).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
