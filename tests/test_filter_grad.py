"""Parity tests for the Pallas filter-gradient kernel (ops/filter_grad.py).

The kernel must produce exactly the gradient TF autodiff would for a
stride-1 SAME tf.nn.conv2d (reference nn_skeleton.py:329-361) — pinned
here against jax.grad of the plain XLA conv, in Pallas interpreter mode
(CPU).  Also covers the custom-VJP routing in models/layers.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.models import layers
from squeezedet_tpu.ops.filter_grad import filter_grad


def _xla_filter_grad(x, dy, kh, kw):
    def fwd(k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    c, o = x.shape[-1], dy.shape[-1]
    k0 = jnp.zeros((kh, kw, c, o), x.dtype)
    _, vjp = jax.vjp(fwd, k0)
    return vjp(dy)[0]


@pytest.mark.parametrize("kh,kw,h,w", [
    (1, 1, 4, 4),     # 1x1 fast path (h*w % 16 == 0)
    (1, 1, 5, 7),     # 1x1 general path (h*w not 16-aligned)
    (3, 3, 6, 10),
    (3, 3, 5, 7),     # odd sizes
    (5, 5, 9, 11),
])
def test_filter_grad_matches_xla(rng, kh, kw, h, w):
    b, c, o = 2, 128, 128
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    dy = jnp.asarray(rng.randn(b, h, w, o), jnp.float32)
    got = filter_grad(x, dy, kh=kh, kw=kw, interpret=True)
    want = _xla_filter_grad(x, dy, kh, kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_conv2d_custom_vjp_routing(rng):
    """grad through layers.conv2d is identical with the Pallas backward
    on (interpret) and off — both dx and dw — and the flag only
    touches eligible convs (stride 1, SAME, odd k, C % 128 == 0)."""
    params = {
        "kernel": jnp.asarray(rng.randn(3, 3, 128, 64) * 0.1, jnp.float32),
        "bias": jnp.zeros((64,), jnp.float32),
    }
    x = jnp.asarray(rng.randn(2, 6, 10, 128), jnp.float32)

    def loss(p, x):
        y = layers.conv2d(p, x, stride=1, padding="SAME", relu=True)
        return jnp.sum(y * y)

    ref = jax.grad(loss, argnums=(0, 1))(params, x)
    try:
        layers.set_pallas_filter_grad("interpret")
        got = jax.grad(loss, argnums=(0, 1))(params, x)
    finally:
        layers.set_pallas_filter_grad(False)

    np.testing.assert_allclose(np.asarray(got[0]["kernel"]),
                               np.asarray(ref[0]["kernel"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-5, atol=1e-4)


def test_conv2d_pair_custom_vjp_routing(rng):
    """conv2d_pair (the production fire-chain conv) grads are identical
    with the Pallas backward on (interpret) and off."""
    params = {
        "kernel": jnp.asarray(rng.randn(3, 3, 256, 64) * 0.1, jnp.float32),
        "bias": jnp.zeros((64,), jnp.float32),
    }
    xa = jnp.asarray(rng.randn(2, 6, 10, 128), jnp.float32)
    xb = jnp.asarray(rng.randn(2, 6, 10, 128), jnp.float32)

    def loss(p, xa, xb):
        y = layers.conv2d_pair(p, xa, xb, 1)
        return jnp.sum(y * y)

    ref = jax.grad(loss, argnums=(0, 1, 2))(params, xa, xb)
    try:
        layers.set_pallas_filter_grad("interpret")
        got = jax.grad(loss, argnums=(0, 1, 2))(params, xa, xb)
    finally:
        layers.set_pallas_filter_grad(False)

    np.testing.assert_allclose(np.asarray(got[0]["kernel"]),
                               np.asarray(ref[0]["kernel"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                               rtol=1e-5, atol=1e-4)


def test_ineligible_convs_stay_on_xla(rng):
    """stride-2 / VALID / non-128 channel convs never route through the
    custom VJP even when the flag is on (the VJP would be wrong for
    them; eligibility must gate)."""
    x = jnp.asarray(rng.randn(2, 6, 10, 64), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.1, jnp.float32)
    try:
        layers.set_pallas_filter_grad("interpret")
        assert not layers._pallas_dw_eligible(x, k)  # C % 128 != 0
        k2 = jnp.asarray(np.zeros((2, 2, 128, 64)), jnp.float32)
        assert not layers._pallas_dw_eligible(x, k2)  # even kernel
    finally:
        layers.set_pallas_filter_grad(False)
    assert not layers._pallas_dw_eligible(x, k)  # flag off
