"""Backbone structure tests: output grids, parameter counts, freezing,
dropout behaviour."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.config import config_for_net, tiny_test_config
from squeezedet_tpu.models import available_nets, get_model

# Reference layer-by-layer structure facts (squeezeDet.py, vgg16_convDet.py,
# resnet50_convDet.py, squeezeDetPlus.py).
_EXPECT_GRID = {
    "squeezeDet": (24, 78), "squeezeDet+": (22, 76),
    "vgg16": (24, 78), "resnet50": (24, 78),
}


@pytest.mark.parametrize("net", list(_EXPECT_GRID))
def test_grid_matches_config(net):
    cfg = config_for_net(net).replace(load_pretrained_model=False)
    det = get_model(net, cfg)
    _, _, tracer = det.init(jax.random.key(0))
    assert (tracer.height, tracer.width) == _EXPECT_GRID[net]
    assert (cfg.grid_h, cfg.grid_w) == _EXPECT_GRID[net]
    assert tracer.channels == cfg.head_channels == 72


def test_forward_shapes_tiny():
    cfg = tiny_test_config()
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    imgs = jnp.zeros((cfg.batch_size, cfg.image_height, cfg.image_width, 3))
    preds = det.forward(params, imgs)
    assert preds.shape == (cfg.batch_size, cfg.grid_h, cfg.grid_w,
                           cfg.head_channels)
    assert preds.dtype == jnp.float32


def test_dropout_only_in_train_mode():
    from squeezedet_tpu.models.layers import dropout
    x = jnp.ones((4, 8, 8, 16))
    # eval: identity regardless of rng (nn_skeleton.py:78: keep_prob=1.0)
    np.testing.assert_array_equal(
        np.asarray(dropout(x, 0.5, None, train=False)), np.asarray(x))
    # train: inverted dropout — zeros and 1/keep_prob scaling
    y = np.asarray(dropout(x, 0.5, jax.random.key(0), train=True))
    assert set(np.unique(y)) == {0.0, 2.0}
    # different rngs -> different masks
    y2 = np.asarray(dropout(x, 0.5, jax.random.key(1), train=True))
    assert not np.array_equal(y, y2)


def test_forward_eval_is_deterministic():
    cfg = tiny_test_config()
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    imgs = jax.random.normal(jax.random.key(5),
                             (2, cfg.image_height, cfg.image_width, 3))
    eval1 = det.forward(params, imgs, train=False)
    eval2 = det.forward(params, imgs, train=False)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))


def test_pretrained_weights_are_used():
    cfg = tiny_test_config()
    det = get_model("squeezeDet", cfg)
    # caffe pkl layout: kernel OIHW + bias (nn_skeleton.py:493-497)
    kernel_oihw = np.random.RandomState(0).randn(64, 3, 3, 3).astype(
        np.float32)
    bias = np.arange(64, dtype=np.float32)
    pretrained = {"conv1": [kernel_oihw, bias]}
    params, _, _ = det.init(jax.random.key(0), pretrained=pretrained)
    np.testing.assert_allclose(
        np.asarray(params["conv1"]["kernel"]),
        np.transpose(kernel_oihw, (2, 3, 1, 0)))
    np.testing.assert_allclose(np.asarray(params["conv1"]["bias"]), bias)


def test_pretrained_shape_mismatch_falls_back():
    cfg = tiny_test_config()
    det = get_model("squeezeDet", cfg)
    pretrained = {"conv1": [np.zeros((8, 3, 3, 3), np.float32),
                            np.zeros(8, np.float32)]}
    params, _, _ = det.init(jax.random.key(0), pretrained=pretrained)
    assert params["conv1"]["kernel"].shape == (3, 3, 3, 64)
    assert not np.allclose(np.asarray(params["conv1"]["kernel"]), 0.0)


@pytest.mark.parametrize("net", list(available_nets()))
def test_all_backbones_forward_tiny(net):
    cfg = tiny_test_config(net=net)
    det = get_model(net, cfg)
    params, mask, tracer = det.init(jax.random.key(0))
    imgs = jnp.zeros((1, cfg.image_height, cfg.image_width, 3))
    interp = det.predict(params, imgs)
    assert interp.det_boxes.shape == (1, cfg.anchors, 4)
    assert interp.det_probs.shape == (1, cfg.anchors)


def test_resnet_frozen_stages():
    cfg = tiny_test_config(net="resnet50")
    det = get_model("resnet50", cfg)
    _, mask, _ = det.init(jax.random.key(0))
    # conv1, res2*, res3* frozen; res4* trainable (resnet50_convDet.py:41-99)
    assert mask["conv1"]["kernel"] is False
    assert mask["res2a"]["branch2"]["branch2a"]["kernel"] is False
    assert mask["res3d"]["branch2"]["branch2c"]["gamma"] is False
    assert mask["res4a"]["branch1"]["kernel"] is True
    assert mask["res4f"]["branch2"]["branch2b"]["kernel"] is True
    # BN running stats never trainable
    assert mask["res4a"]["branch1"]["mean"] is False


def test_vgg_frozen_blocks():
    cfg = tiny_test_config(net="vgg16")
    det = get_model("vgg16", cfg)
    _, mask, _ = det.init(jax.random.key(0))
    assert mask["conv1_1"]["kernel"] is False
    assert mask["conv2_2"]["kernel"] is False
    assert mask["conv3_1"]["kernel"] is True


def test_squeezedet_param_count_full_size():
    """Reference model_metrics totals derive from the layer formula
    (1+k*k*cin)*cout (nn_skeleton.py:451-453); spot-check conv1+conv12."""
    cfg = config_for_net("squeezeDet").replace(load_pretrained_model=False)
    det = get_model("squeezeDet", cfg)
    _, _, tracer = det.init(jax.random.key(0))
    sizes = dict(tracer.model_size_counter)
    assert sizes["conv1"] == (1 + 9 * 3) * 64
    assert sizes["conv12"] == (1 + 9 * 768) * 72
    assert tracer.total_params() == 2082120  # fire2..11 + conv1 + conv12


@pytest.mark.parametrize("net", ["squeezeDet", "squeezeDet+"])
def test_concat_free_fire_matches_naive(net):
    """The production concat-free fire chain must equal the naive
    concat formulation bit-for-bit up to float associativity."""
    from squeezedet_tpu.models import layers as L
    from squeezedet_tpu.models import squeezedet, squeezedet_plus
    mod = squeezedet if net == "squeezeDet" else squeezedet_plus
    pad = "SAME" if net == "squeezeDet" else "VALID"
    cfg = tiny_test_config(net=net)
    det = get_model(net, cfg)
    params, _, _ = det.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(3),
                          (2, cfg.image_height, cfg.image_width, 3))

    def naive(params, x):
        x = L.conv2d(params["conv1"], x, 2, padding=pad)
        x = L.max_pool(x, 3, 2, pad)
        for name, _, _, _ in mod._FIRES:
            x = L.fire(params[name], x)
            if name in mod._POOL_AFTER:
                x = L.max_pool(x, 3, 2, pad)
        return L.conv2d(params["conv12"], x, 1, relu=False)

    got = mod.apply(params, x, cfg, train=False)
    want = naive(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_scratch_init_reference_mode():
    """scratch_init='reference' reproduces the original truncated-normal
    fallback initializers (tiny stddevs) for strict parity."""
    cfg = tiny_test_config().replace(scratch_init="reference")
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    k = np.asarray(params["fire2"]["squeeze1x1"]["kernel"])
    assert np.abs(k).max() < 0.021  # ~2 sigma of stddev 0.01
    cfg_x = tiny_test_config()  # default xavier
    det_x = get_model("squeezeDet", cfg_x)
    params_x, _, _ = det_x.init(jax.random.key(0))
    kx = np.asarray(params_x["fire2"]["squeeze1x1"]["kernel"])
    assert np.abs(kx).max() > 0.05  # Glorot limit for 128-fan 1x1


def test_predict_jit_wrapper_is_cached():
    """Repeated predict_jit calls must reuse one jit wrapper (a fresh
    jax.jit(det.predict) per call would recompile every time)."""
    import jax
    import numpy as np
    from squeezedet_tpu.config import tiny_test_config
    from squeezedet_tpu.models import get_model
    cfg = tiny_test_config(image_width=64, image_height=64, batch_size=1)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    x = np.zeros((1, 64, 64, 3), np.float32)
    det.predict_jit(params, x)
    fn1 = det._predict_jit_fn
    det.predict_jit(params, x)
    assert det._predict_jit_fn is fn1


def test_dropout_u8_bits_path_statistics():
    """keep_prob = q/256 uses one u8 of entropy per element: exact
    Bernoulli(q/256) marginal, inverted scaling preserved, and the
    fallback path still engages for non-representable probabilities."""
    from squeezedet_tpu.models.layers import dropout
    x = jnp.ones((512, 517))
    for kp in (0.5, 0.25):
        y = np.asarray(dropout(x, kp, jax.random.key(3), train=True))
        kept = y > 0
        assert abs(kept.mean() - kp) < 0.01, (kp, kept.mean())
        np.testing.assert_allclose(y[kept], 1.0 / kp, rtol=1e-6)
    # non-representable keep_prob -> bernoulli fallback, same contract
    y = np.asarray(dropout(x, 1 / 3, jax.random.key(4), train=True))
    kept = y > 0
    assert abs(kept.mean() - 1 / 3) < 0.01
    np.testing.assert_allclose(y[kept], 3.0, rtol=1e-5)


def test_train_with_rbg_rng_impl_resumes(tmp_path):
    """--rng_impl rbg trains, checkpoints the key impl, and resumes
    with the right key type (wrap_key_data impl round-trip)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_kitti import make_synth_kitti

    from squeezedet_tpu.config import tiny_test_config
    from squeezedet_tpu.data import Kitti
    from squeezedet_tpu.trainer import train

    root = str(tmp_path / "kitti")
    make_synth_kitti(root, num_images=6, width=96, height=96)
    cfg = tiny_test_config(image_width=96, image_height=96, batch_size=2)
    det = get_model("squeezeDet", cfg)
    db = Kitti("train", root, cfg, rng=np.random.RandomState(0))
    train_dir = str(tmp_path / "tr")
    train(det, db, train_dir=train_dir, max_steps=2, checkpoint_step=1,
          summary_step=10**6, log_every=1, rng_impl="rbg")
    state = train(det, db, train_dir=train_dir, max_steps=3,
                  checkpoint_step=10, summary_step=10**6, log_every=1,
                  rng_impl="rbg")
    assert state.step == 3
