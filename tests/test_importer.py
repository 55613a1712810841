"""Weight-importer tests: TF1 checkpoint roundtrip and pkl loading."""

import os

import numpy as np
import pytest

import jax

from squeezedet_tpu.checkpoint.importer import (load_pretrained,
                                                load_tf1_checkpoint)
from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.models import get_model

tf = pytest.importorskip("tensorflow")


def _make_tf1_ckpt(path):
    """Write a TF1-style Saver checkpoint with the reference's variable
    naming (<layer>/kernels HWIO + <layer>/biases, nn_skeleton.py:425-430)."""
    rng = np.random.RandomState(0)
    kernel = rng.randn(3, 3, 3, 64).astype(np.float32)  # HWIO
    bias = rng.randn(64).astype(np.float32)
    sq_k = rng.randn(1, 1, 64, 16).astype(np.float32)
    sq_b = rng.randn(16).astype(np.float32)
    tf.compat.v1.reset_default_graph()
    with tf.compat.v1.Session() as sess:
        tf.compat.v1.get_variable("conv1/kernels", initializer=kernel)
        tf.compat.v1.get_variable("conv1/biases", initializer=bias)
        tf.compat.v1.get_variable("fire2/squeeze1x1/kernels",
                                  initializer=sq_k)
        tf.compat.v1.get_variable("fire2/squeeze1x1/biases",
                                  initializer=sq_b)
        sess.run(tf.compat.v1.global_variables_initializer())
        saver = tf.compat.v1.train.Saver()
        saver.save(sess, path)
    return kernel, bias, sq_k, sq_b


def test_tf1_checkpoint_roundtrip(tmp_path):
    ckpt = str(tmp_path / "model.ckpt-87000")
    kernel, bias, sq_k, sq_b = _make_tf1_ckpt(ckpt)
    weights = load_tf1_checkpoint(ckpt)
    # pkl layout is OIHW (nn_skeleton.py:406: reader transposes back)
    np.testing.assert_allclose(weights["conv1"][0],
                               np.transpose(kernel, (3, 2, 0, 1)))
    np.testing.assert_allclose(weights["conv1"][1], bias)
    np.testing.assert_allclose(weights["fire2/squeeze1x1"][0],
                               np.transpose(sq_k, (3, 2, 0, 1)))

    # feed into model init: params must equal original HWIO values
    cfg = tiny_test_config()
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0), pretrained=weights)
    np.testing.assert_allclose(np.asarray(params["conv1"]["kernel"]),
                               kernel, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["fire2"]["squeeze1x1"]["kernel"]), sq_k,
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["fire2"]["squeeze1x1"]["bias"]), sq_b, rtol=1e-6)


def test_load_pretrained_dispatches_by_format(tmp_path):
    ckpt = str(tmp_path / "model.ckpt-5")
    _make_tf1_ckpt(ckpt)
    w = load_pretrained(ckpt)
    assert "conv1" in w

    import joblib
    pkl = str(tmp_path / "weights.pkl")
    joblib.dump({"conv1": [np.zeros((64, 3, 3, 3)), np.zeros(64)]}, pkl)
    w2 = load_pretrained(pkl)
    assert w2["conv1"][0].shape == (64, 3, 3, 3)

    with pytest.raises(ValueError):
        load_pretrained("")


def test_full_model_tf1_roundtrip(tmp_path):
    """Every squeezeDet layer imported from a TF1 checkpoint with the
    reference variable naming."""
    cfg = tiny_test_config()
    det = get_model("squeezeDet", cfg)
    ref_params, _, _ = det.init(jax.random.key(7))

    tf.compat.v1.reset_default_graph()
    with tf.compat.v1.Session() as sess:
        def add(scope, p):
            tf.compat.v1.get_variable(scope + "/kernels",
                                      initializer=np.asarray(p["kernel"]))
            tf.compat.v1.get_variable(scope + "/biases",
                                      initializer=np.asarray(p["bias"]))
        for name, p in ref_params.items():
            if "kernel" in p:
                add(name, p)
            else:  # fire module
                for sub, sp in p.items():
                    add(name + "/" + sub, sp)
        sess.run(tf.compat.v1.global_variables_initializer())
        ckpt = str(tmp_path / "model.ckpt-100")
        tf.compat.v1.train.Saver().save(sess, ckpt)

    weights = load_pretrained(ckpt)
    params, _, _ = det.init(jax.random.key(0), pretrained=weights)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(params))
    # ref uses separate leaves dict; compare via paths
    new_by_path = {jax.tree_util.keystr(k): v
                   for k, v in jax.tree_util.tree_leaves_with_path(params)}
    for k, v in flat_ref:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(new_by_path[key]),
                                   np.asarray(v), rtol=1e-6,
                                   err_msg=key)


def test_importer_warns_on_unmapped_and_incomplete(tmp_path, capsys):
    """Round-2 hardening: dropped checkpoint content must be loud —
    variables outside the naming contract, incomplete BN groups, and
    pretrained entries no model layer consumed."""
    ckpt = str(tmp_path / "model.ckpt-1")
    tf.compat.v1.reset_default_graph()
    rng = np.random.RandomState(3)
    with tf.compat.v1.Session() as sess:
        tf.compat.v1.get_variable(
            "conv1/kernels", initializer=rng.randn(3, 3, 3, 64)
            .astype(np.float32))
        tf.compat.v1.get_variable(
            "conv1/biases", initializer=rng.randn(64).astype(np.float32))
        # weight outside the kernels/biases/BN contract
        tf.compat.v1.get_variable(
            "conv9/weird_weight", initializer=rng.randn(4)
            .astype(np.float32))
        # incomplete BN group: gamma only
        tf.compat.v1.get_variable(
            "bnonly/gamma", initializer=rng.randn(8).astype(np.float32))
        # optimizer slots must stay silent
        tf.compat.v1.get_variable(
            "conv1/kernels/Momentum", initializer=rng.randn(3, 3, 3, 64)
            .astype(np.float32))
        sess.run(tf.compat.v1.global_variables_initializer())
        tf.compat.v1.train.Saver().save(sess, ckpt)

    weights = load_tf1_checkpoint(ckpt)
    out = capsys.readouterr().out
    assert "conv9/weird_weight" in out
    assert "incomplete batch-norm group" in out and "bnonly" in out
    assert "Momentum" not in out

    # model init: unconsumed pretrained entries + missing layers are loud
    cfg = tiny_test_config()
    det = get_model("squeezeDet", cfg)
    weights["not_a_layer"] = [np.zeros((1, 1, 1, 1)), np.zeros(1)]
    det.init(jax.random.key(0), pretrained=weights)
    out = capsys.readouterr().out
    assert "matched no model layer" in out and "not_a_layer" in out
    assert "Cannot find fire2/squeeze1x1 in the pretrained model" in out


def test_tf1_import_bn_names_beyond_res_family(tmp_path):
    """BN synthesis for reference-style non-res scopes: conv scope
    'conv1' maps to 'bn_conv1'/'scale_conv1' (caffe ResNet naming)."""
    ckpt = str(tmp_path / "model.ckpt-2")
    rng = np.random.RandomState(5)
    tf.compat.v1.reset_default_graph()
    with tf.compat.v1.Session() as sess:
        tf.compat.v1.get_variable(
            "conv1/kernels", initializer=rng.randn(7, 7, 3, 64)
            .astype(np.float32))
        for leaf in ("gamma", "beta", "mean", "var"):
            tf.compat.v1.get_variable(
                "conv1/" + leaf, initializer=rng.randn(64)
                .astype(np.float32))
        sess.run(tf.compat.v1.global_variables_initializer())
        tf.compat.v1.train.Saver().save(sess, ckpt)
    weights = load_tf1_checkpoint(ckpt)
    assert "bn_conv1" in weights and "scale_conv1" in weights
    assert len(weights["bn_conv1"]) == 2     # [mean, var]
    assert len(weights["scale_conv1"]) == 2  # [gamma, beta]


def test_import_checkpoint_cli_tf1_to_native(tmp_path, capsys):
    """squeezedet-import converts a reference-named TF1 checkpoint into
    a native orbax dir that restore_params accepts (the first stage of
    scripts/parity_vs_reference.sh).  Conv kernel shapes are resolution-
    independent, so a checkpoint written from tiny-config params is
    exactly what the flagship-config import expects."""
    from squeezedet_tpu.checkpoint.manager import (CheckpointManager,
                                                   latest_step)
    from squeezedet_tpu.config import config_for_net
    from squeezedet_tpu.tools import import_checkpoint

    cfg = tiny_test_config()
    det = get_model("squeezeDet", cfg)
    ref_params, _, _ = det.init(jax.random.key(7))

    tf.compat.v1.reset_default_graph()
    with tf.compat.v1.Session() as sess:
        def add(scope, p):
            tf.compat.v1.get_variable(scope + "/kernels",
                                      initializer=np.asarray(p["kernel"]))
            tf.compat.v1.get_variable(scope + "/biases",
                                      initializer=np.asarray(p["bias"]))
        for name, p in ref_params.items():
            if "kernel" in p:
                add(name, p)
            else:
                for sub, sp in p.items():
                    add(name + "/" + sub, sp)
        sess.run(tf.compat.v1.global_variables_initializer())
        ckpt = str(tmp_path / "model.ckpt-87000")
        tf.compat.v1.train.Saver().save(sess, ckpt)

    out_dir = str(tmp_path / "native")
    import_checkpoint.main(["--checkpoint", ckpt, "--out_dir", out_dir,
                            "--step", "87000"])
    assert latest_step(out_dir) == 87000

    full = config_for_net("squeezeDet").replace(
        load_pretrained_model=False, batch_size=1)
    full_det = get_model("squeezeDet", full)
    template, _, _ = full_det.init(jax.random.key(0))
    restored = CheckpointManager(out_dir).restore_params(87000, template)
    np.testing.assert_allclose(
        np.asarray(restored["conv1"]["kernel"]),
        np.asarray(ref_params["conv1"]["kernel"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(restored["fire9"]["expand3x3"]["bias"]),
        np.asarray(ref_params["fire9"]["expand3x3"]["bias"]), rtol=1e-6)
