"""Pallas fused conv1+pool1 parity tests (interpret mode on CPU; the
same kernel compiles and matches exactly on TPU — see module docstring
for the measured numbers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.models import layers as L
from squeezedet_tpu.ops.fused_frontend import conv1_pool1_fused


def _reference(x, k, b):
    return L.max_pool(L.conv2d({"kernel": k, "bias": b}, x, 2), 3, 2,
                      "SAME")


@pytest.mark.parametrize("shape", [(2, 64, 64), (1, 96, 160),
                                   (1, 32, 1248)])
def test_fused_frontend_matches_xla(shape, rng):
    b, h, w = shape
    x = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    ref = _reference(x, k, bias)
    got = conv1_pool1_fused(x, k, bias, interpret=True)
    assert got.shape == (b, h // 4, w // 4, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_frontend_rejects_bad_shapes(rng):
    x = jnp.zeros((1, 30, 64, 3))
    k = jnp.zeros((3, 3, 3, 64))
    with pytest.raises(AssertionError):
        conv1_pool1_fused(x, k, jnp.zeros(64), interpret=True)
