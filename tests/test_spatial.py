"""Spatial partitioning over a 2-D (data, spatial) mesh.

The height dimension of the activations is sharded over the ``spatial``
mesh axis; XLA's SPMD partitioner inserts halo collective-permutes at
conv/pool shard boundaries.  These tests pin the sharded programs
bit-near to their unsharded twins on the virtual 8-CPU mesh, and assert
the compiled HLO really is spatially partitioned (halo exchanges
present) rather than silently all-gathered at entry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.models import get_model
from squeezedet_tpu.models.skeleton import Targets
from squeezedet_tpu.optim import build_optimizer
from squeezedet_tpu.parallel.mesh import (batch_sharding, image_sharding,
                                          make_mesh_2d,
                                          replicated_sharding, shard_batch)
from squeezedet_tpu.parallel.spatial import spatial_predict_fn
from squeezedet_tpu.trainer import make_train_step


def _toy_targets(cfg, rng):
    A, C = cfg.anchors, cfg.classes
    B = cfg.batch_size
    mask = np.zeros((B, A), np.float32)
    labels = np.zeros((B, A, C), np.float32)
    mask[:, 3] = 1.0
    labels[:, 3, 1] = 1.0
    return Targets(jnp.asarray(mask),
                   jnp.asarray(rng.randn(B, A, 4).astype(np.float32) * .1),
                   jnp.asarray(np.full((B, A, 4), 30.0, np.float32)),
                   jnp.asarray(labels))


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def test_spatial_predict_matches_unsharded(rng):
    cfg = tiny_test_config(image_width=64, image_height=64, batch_size=2)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    im = rng.randn(2, 64, 64, 3).astype(np.float32)

    ref = jax.jit(det.predict)(params, jnp.asarray(im))

    mesh = make_mesh_2d(2, 4)
    fn = spatial_predict_fn(det, mesh, postprocess=False)
    boxes, probs, classes = fn(jax.device_put(
        params, replicated_sharding(mesh)),
        jax.device_put(im, image_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(boxes),
                               np.asarray(ref.det_boxes),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(probs),
                               np.asarray(ref.det_probs),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(classes),
                                  np.asarray(ref.det_class))


def test_spatial_only_mesh_batch1_postprocess(rng):
    """Pure spatial parallelism (the low-latency serving shape): batch 1
    over a (1, 8) mesh, full program incl. on-device top-K + NMS."""
    from squeezedet_tpu.ops.postprocess import filter_prediction_device

    cfg = tiny_test_config(image_width=96, image_height=96, batch_size=1)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(1))
    im = rng.randn(1, 96, 96, 3).astype(np.float32)

    def host_fn(p, x):
        interp = det.predict(p, x)
        return filter_prediction_device(
            interp.det_boxes, interp.det_probs, interp.det_class,
            top_n=cfg.top_n_detection, nms_thresh=cfg.nms_thresh,
            num_classes=cfg.classes, prob_thresh=cfg.prob_thresh)

    ref = jax.jit(host_fn)(params, jnp.asarray(im))

    mesh = make_mesh_2d(1, 8)
    fn = spatial_predict_fn(det, mesh, postprocess=True)
    out = fn(jax.device_put(params, replicated_sharding(mesh)),
             jax.device_put(im, image_sharding(mesh)))
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_spatial_program_has_halo_exchanges(rng):
    """The compiled spatially-sharded forward must contain halo
    collective-permutes — i.e. the partitioner kept the activations
    sharded through the convs instead of all-gathering the image."""
    cfg = tiny_test_config(image_width=64, image_height=64, batch_size=2)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    im = rng.randn(2, 64, 64, 3).astype(np.float32)
    mesh = make_mesh_2d(2, 4)
    fn = spatial_predict_fn(det, mesh, postprocess=False)
    p = jax.device_put(params, replicated_sharding(mesh))
    x = jax.device_put(im, image_sharding(mesh))
    txt = fn.lower(p, x).compile().as_text()
    assert "collective-permute" in txt


def test_spatial_train_matches_single_device(rng):
    """3 train steps on the (2, 4) data x spatial mesh must match
    single-device training (params + loss trajectory)."""
    cfg8 = tiny_test_config(image_width=96, image_height=96, batch_size=8)
    det = get_model("squeezeDet", cfg8)
    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    tx = build_optimizer(cfg8, mask)
    targets = _toy_targets(cfg8, rng)
    images = jnp.asarray(rng.randn(8, 96, 96, 3).astype(np.float32))

    def run(mesh, steps=3):
        p, o = params, tx.init(params)
        step = make_train_step(det, tx, mesh=mesh, donate=False)
        ims, tg = images, targets
        if mesh is not None:
            rep = replicated_sharding(mesh)
            p = jax.device_put(p, rep)
            o = jax.device_put(o, rep)
            ims = jax.device_put(np.asarray(images), image_sharding(mesh))
            tg = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x),
                                         batch_sharding(mesh)), targets)
        losses = []
        for k in range(steps):
            p, o, lb = step(p, o, ims, tg, jax.random.key(100 + k))
            losses.append(float(lb.total))
        return jax.device_get(p), losses

    p1, losses1 = run(None)
    p2d, losses2d = run(make_mesh_2d(2, 4))
    np.testing.assert_allclose(losses2d, losses1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2d)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_scan_dispatch_on_2d_mesh(rng):
    """K scanned steps over a (2, 2) data x spatial mesh: the stacked
    [K, B, H, W, 3] batch shards as P(None, 'data', 'spatial') and the
    result matches the unsharded scan."""
    from squeezedet_tpu.trainer import make_train_step_device_scan

    cfg = tiny_test_config(image_width=64, image_height=64, batch_size=2)
    det = get_model("squeezeDet", cfg)
    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    tx = build_optimizer(cfg, mask)

    K, B, G = 2, 2, 4
    images = rng.randn(K, B, 64, 64, 3).astype(np.float32)
    gt_boxes = np.tile(np.asarray([[20., 20., 12., 10.]], np.float32),
                       (K, B, G, 1))
    gt_labels = np.zeros((K, B, G), np.int32)
    num_gt = np.full((K, B), 1, np.int32)
    keys = jax.random.split(jax.random.key(7), K)

    ref_step = make_train_step_device_scan(det, tx, K, donate=False)
    p1, _, lbs1 = ref_step(params, tx.init(params), images, gt_boxes,
                           gt_labels, num_gt, keys)

    mesh = make_mesh_2d(2, 2)
    step2 = make_train_step_device_scan(det, tx, K, mesh=mesh,
                                        donate=False)
    p2, _, lbs2 = step2(params, tx.init(params), images, gt_boxes,
                        gt_labels, num_gt, keys)
    np.testing.assert_allclose(np.asarray(lbs2.total),
                               np.asarray(lbs1.total), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)

@pytest.mark.slow
def test_spatial_full_resolution_forward_matches_unsharded(rng):
    """Flagship-geometry pin (VERDICT r2): the 1248x384 forward sharded
    over a (1, 8) spatial mesh must match the unsharded program — SAME-
    padding halo widths and the head gather behave differently at full
    resolution than at the 64 px toy shapes the other tests use."""
    from squeezedet_tpu.config import kitti_squeezedet_config

    cfg = kitti_squeezedet_config().replace(load_pretrained_model=False,
                                            batch_size=1)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(2))
    im = rng.randn(1, cfg.image_height, cfg.image_width, 3) \
        .astype(np.float32)

    ref = jax.jit(det.predict)(params, jnp.asarray(im))

    mesh = make_mesh_2d(1, 8)
    fn = spatial_predict_fn(det, mesh, postprocess=False)
    p = jax.device_put(params, replicated_sharding(mesh))
    x = jax.device_put(im, image_sharding(mesh))
    compiled = fn.lower(p, x).compile()
    assert "collective-permute" in compiled.as_text()
    boxes, probs, classes = compiled(p, x)
    np.testing.assert_allclose(np.asarray(boxes),
                               np.asarray(ref.det_boxes),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(probs),
                               np.asarray(ref.det_probs),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(classes),
                                  np.asarray(ref.det_class))
