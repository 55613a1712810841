"""Golden tests against REAL TensorFlow ops.

The reference model is TF1 (`tf.nn.conv2d` / `tf.nn.max_pool`,
nn_skeleton.py:471-587); every numeric claim about checkpoint fidelity
rests on our layers reproducing TF's SAME/VALID padding and NHWC layout
semantics exactly.  The rest of the suite pins numpy transcriptions —
these tests pin the actual oracle: if SAME-padding placement, stride
phase, or layout handling ever drifts, they fail.

(Same upgrade test_oracle_eval.py made for the scorer: transcription-
verified -> oracle-verified.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from squeezedet_tpu.models.layers import conv2d, conv2d_s2d, max_pool

tf = pytest.importorskip("tensorflow")


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


# Odd spatial sizes make SAME padding asymmetric (TF pads more on the
# bottom/right); stride 2 on odd sizes also pins the stride phase.
CONV_CASES = [
    # (h, w, cin, cout, k, stride, padding)
    (13, 17, 3, 8, 3, 1, "SAME"),
    (13, 17, 3, 8, 3, 2, "SAME"),
    (14, 18, 4, 6, 3, 2, "SAME"),
    (13, 17, 3, 8, 3, 1, "VALID"),
    (15, 19, 3, 8, 7, 2, "VALID"),   # squeezeDet+ conv1 geometry
    (12, 16, 5, 7, 1, 1, "SAME"),    # 1x1 (fire squeeze/expand)
]


@pytest.mark.parametrize("h,w,cin,cout,k,stride,padding", CONV_CASES)
def test_conv2d_matches_tf_nn_conv2d(h, w, cin, cout, k, stride, padding):
    x = _rand((2, h, w, cin), seed=1)
    kernel = _rand((k, k, cin, cout), seed=2)
    bias = _rand((cout,), seed=3)

    want = tf.nn.relu(tf.nn.bias_add(tf.nn.conv2d(
        x, kernel, strides=[1, stride, stride, 1], padding=padding),
        bias)).numpy()
    got = np.asarray(conv2d({"kernel": jnp.asarray(kernel),
                             "bias": jnp.asarray(bias)},
                            jnp.asarray(x), stride, padding=padding))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv2d_s2d_matches_tf_stride2_same():
    """The space-to-depth frontend rewrite must stay bit-equivalent to
    TF's plain 3x3 stride-2 SAME conv (even input dims, its domain)."""
    x = _rand((2, 96, 64, 3), seed=4)
    kernel = _rand((3, 3, 3, 16), seed=5)
    bias = _rand((16,), seed=6)
    want = tf.nn.relu(tf.nn.bias_add(tf.nn.conv2d(
        x, kernel, strides=[1, 2, 2, 1], padding="SAME"), bias)).numpy()
    got = np.asarray(conv2d_s2d({"kernel": jnp.asarray(kernel),
                                 "bias": jnp.asarray(bias)},
                                jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


POOL_CASES = [
    # (h, w, k, stride, padding)
    (13, 17, 3, 2, "SAME"),    # squeezeDet pools (odd sizes)
    (24, 78, 3, 2, "SAME"),    # flagship grid geometry
    (13, 17, 3, 2, "VALID"),   # squeezeDet+ pools
    (14, 18, 2, 2, "SAME"),    # vgg16 pools
    (15, 19, 3, 1, "SAME"),
]


@pytest.mark.parametrize("h,w,k,stride,padding", POOL_CASES)
def test_max_pool_matches_tf_nn_max_pool(h, w, k, stride, padding):
    x = _rand((2, h, w, 5), seed=7)
    want = tf.nn.max_pool2d(x, ksize=[1, k, k, 1],
                            strides=[1, stride, stride, 1],
                            padding=padding).numpy()
    got = np.asarray(max_pool(jnp.asarray(x), k, stride, padding=padding))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=0)  # max: exact


def test_same_padding_asymmetry_is_bottom_right():
    """SAME with even kernel overhang puts the extra pad on bottom/right
    in TF; a symmetric-padding implementation would differ on this
    input (delta at the border), so this is the canary."""
    x = np.zeros((1, 4, 4, 1), np.float32)
    x[0, 0, 0, 0] = 1.0  # corner impulse
    kernel = np.ones((3, 3, 1, 1), np.float32)
    want = tf.nn.conv2d(x, kernel, strides=[1, 2, 2, 1],
                        padding="SAME").numpy()
    got = np.asarray(conv2d({"kernel": jnp.asarray(kernel),
                             "bias": jnp.zeros((1,), jnp.float32)},
                            jnp.asarray(x), 2, relu=False))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
