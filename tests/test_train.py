"""Training subsystem tests: optimizer semantics, jitted train step,
loader, checkpoint resume, end-to-end loop on synthetic KITTI."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.data import Kitti
from squeezedet_tpu.loader import PrefetchLoader
from squeezedet_tpu.models import get_model
from squeezedet_tpu.models.skeleton import Targets
from squeezedet_tpu.optim import (build_optimizer, clip_by_norm_per_leaf,
                                  learning_rate_at,
                                  staircase_exponential_decay)
from squeezedet_tpu.trainer import TrainState, make_train_step, train
from synth_kitti import make_synth_kitti


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config(image_width=96, image_height=96, batch_size=2)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_train")
    make_synth_kitti(str(root), num_images=4, width=96, height=96)
    return str(root)


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


def test_staircase_lr_matches_tf_semantics():
    sched = staircase_exponential_decay(0.01, 10000, 0.5)
    assert float(sched(0)) == pytest.approx(0.01)
    assert float(sched(9999)) == pytest.approx(0.01)
    assert float(sched(10000)) == pytest.approx(0.005)
    assert float(sched(25000)) == pytest.approx(0.0025)
    cfg = tiny_test_config()
    assert learning_rate_at(cfg, 10000) == pytest.approx(
        cfg.learning_rate * cfg.lr_decay_factor)


def test_lr_warmup_ramp():
    """Linear warmup multiplies the staircase schedule: (step+1)/W up
    to 1x, identical to the no-warmup schedule afterwards."""
    sched = staircase_exponential_decay(0.08, 10000, 0.5,
                                        warmup_steps=40)
    assert float(sched(0)) == pytest.approx(0.08 / 40)
    assert float(sched(19)) == pytest.approx(0.08 * 20 / 40)
    assert float(sched(39)) == pytest.approx(0.08)
    assert float(sched(40)) == pytest.approx(0.08)
    assert float(sched(10000)) == pytest.approx(0.04)
    cfg = tiny_test_config().replace(learning_rate=0.08,
                                     lr_warmup_steps=40)
    assert learning_rate_at(cfg, 0) == pytest.approx(0.08 / 40)
    assert learning_rate_at(cfg, 39) == pytest.approx(0.08)


def test_clip_by_norm_per_leaf():
    tx = clip_by_norm_per_leaf(1.0)
    g = {"a": jnp.array([3.0, 4.0]), "b": jnp.array([0.1, 0.1])}
    clipped, _ = tx.update(g, None)
    # ||a|| = 5 -> scaled to norm 1; ||b|| < 1 -> untouched
    np.testing.assert_allclose(np.asarray(clipped["a"]), [0.6, 0.8],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["b"]), [0.1, 0.1])


def test_momentum_update_matches_tf_momentum():
    """MomentumOptimizer: accum = m*accum + g; p -= lr*accum."""
    cfg = tiny_test_config().replace(max_grad_norm=1e9, momentum=0.9,
                                     learning_rate=0.1)
    mask = {"w": True}
    tx = build_optimizer(cfg, mask)
    params = {"w": jnp.array([1.0])}
    state = tx.init(params)
    g = {"w": jnp.array([0.5])}
    # step 1: accum = 0.5 -> p = 1 - 0.1*0.5 = 0.95
    up, state = tx.update(g, state, params)
    params = jax.tree.map(lambda p, u: p + u, params, up)
    np.testing.assert_allclose(np.asarray(params["w"]), [0.95], rtol=1e-6)
    # step 2: accum = 0.9*0.5 + 0.5 = 0.95 -> p = 0.95 - 0.095 = 0.855
    up, state = tx.update(g, state, params)
    params = jax.tree.map(lambda p, u: p + u, params, up)
    np.testing.assert_allclose(np.asarray(params["w"]), [0.855], rtol=1e-6)


def test_frozen_leaves_never_move(cfg, rng):
    det = get_model("squeezeDet", cfg)
    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    tx = build_optimizer(cfg, mask)
    step = make_train_step(det, tx, donate=False)
    opt_state = tx.init(params)
    imgs = jnp.asarray(rng.randn(cfg.batch_size, cfg.image_height,
                                 cfg.image_width, 3).astype(np.float32))
    tg = _toy_targets(cfg, rng)
    new_params, _, lb = step(params, opt_state, imgs, tg,
                             jax.random.key(1))
    # conv1 frozen -> identical; fire2 trainable -> changed
    np.testing.assert_array_equal(
        np.asarray(new_params["conv1"]["kernel"]),
        np.asarray(params["conv1"]["kernel"]))
    assert not np.array_equal(
        np.asarray(new_params["conv12"]["kernel"]),
        np.asarray(params["conv12"]["kernel"]))
    assert np.isfinite(float(lb.total))


def test_trainable_only_grad_matches_full_grad_masked(cfg, rng):
    """The train step differentiates only the trainable subtree (so XLA
    can DCE the frozen-frontend backward); it must match the naive
    full-gradient + freeze-mask formulation step for step."""
    det = get_model("squeezeDet", cfg)
    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    tx = build_optimizer(cfg, mask)
    imgs = jnp.asarray(rng.randn(cfg.batch_size, cfg.image_height,
                                 cfg.image_width, 3).astype(np.float32))
    tg = _toy_targets(cfg, rng)

    @jax.jit
    def full_step(p, opt_state, images, targets, key):
        grads = jax.grad(
            lambda q: det.loss(q, images, targets, rng=key,
                               train=True).total)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return jax.tree.map(lambda a, u: a + u, p, updates), opt_state

    fast_step = make_train_step(det, tx, donate=False)

    p_fast, os_fast = params, tx.init(params)
    p_full, os_full = params, tx.init(params)
    for i in range(3):
        key = jax.random.key(7 + i)
        p_fast, os_fast, _ = fast_step(p_fast, os_fast, imgs, tg, key)
        p_full, os_full = full_step(p_full, os_full, imgs, tg, key)

    flat_fast = jax.tree_util.tree_leaves_with_path(p_fast)
    flat_full = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(p_full))
    for key_path, leaf in flat_fast:
        np.testing.assert_allclose(
            np.asarray(leaf),
            np.asarray(flat_full[jax.tree_util.keystr(key_path)]),
            rtol=1e-6, atol=1e-7, err_msg=str(key_path))


def test_loss_decreases_over_steps(cfg, rng):
    det = get_model("squeezeDet", cfg)
    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    lr_cfg = cfg.replace(learning_rate=0.001)
    tx = build_optimizer(lr_cfg, mask)
    step = make_train_step(det, tx, donate=False)
    opt_state = tx.init(params)
    imgs = jnp.asarray(rng.randn(cfg.batch_size, cfg.image_height,
                                 cfg.image_width, 3).astype(np.float32))
    tg = _toy_targets(cfg, rng)
    losses = []
    for i in range(8):
        params, opt_state, lb = step(params, opt_state, imgs, tg,
                                     jax.random.key(100))
        losses.append(float(lb.total))
    assert losses[-1] < losses[0], losses


def test_prefetch_loader(kitti_root, cfg):
    db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    loader = PrefetchLoader(db, num_threads=2, capacity=3).start()
    try:
        for _ in range(3):
            images, tg = loader.get(timeout=30)
            assert images.shape == (cfg.batch_size, 96, 96, 3)
            assert tg.input_mask.sum() >= 1
    finally:
        loader.stop()


def test_train_loop_end_to_end_with_resume(kitti_root, cfg, tmp_path):
    det = get_model("squeezeDet", cfg)
    db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    train_dir = str(tmp_path / "train")
    state = train(det, db, train_dir=train_dir, max_steps=2,
                  checkpoint_step=1, summary_step=1000, log_every=1)
    assert state.step == 2
    assert os.path.exists(os.path.join(train_dir, "model_metrics.txt"))
    assert os.path.isdir(os.path.join(train_dir, "model.ckpt-1"))
    # resume continues from the saved step
    state2 = train(det, db, train_dir=train_dir, max_steps=3,
                   checkpoint_step=10, summary_step=1000, log_every=1)
    assert state2.step == 3


def test_checkpoint_roundtrip(cfg, tmp_path):
    from squeezedet_tpu.checkpoint.manager import CheckpointManager
    det = get_model("squeezeDet", cfg)
    params, mask, _ = det.init(jax.random.key(0))
    tx = build_optimizer(cfg, mask)
    state = TrainState(params=params, opt_state=tx.init(params), step=5)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(5, state.as_tree())
    step, tree = mgr.restore_latest(state.as_tree())
    assert step == 5
    restored = TrainState.from_tree(tree)
    np.testing.assert_array_equal(
        np.asarray(restored.params["conv1"]["kernel"]),
        np.asarray(params["conv1"]["kernel"]))


def test_device_assign_train_step(kitti_root, cfg, rng):
    """Train step with in-graph anchor matching runs and moves params."""
    det = get_model("squeezeDet", cfg)
    db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    images, gt_boxes, gt_labels, num_gt = db.read_batch_raw_targets(
        shuffle=False, max_gt=16)
    assert images.shape == (cfg.batch_size, 96, 96, 3)
    assert (num_gt >= 1).all()

    from squeezedet_tpu.trainer import make_train_step_device
    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    tx = build_optimizer(cfg, mask)
    step = make_train_step_device(det, tx, donate=False)
    new_params, _, lb = step(params, tx.init(params),
                             jnp.asarray(images), jnp.asarray(gt_boxes),
                             jnp.asarray(gt_labels), jnp.asarray(num_gt),
                             jax.random.key(1))
    assert np.isfinite(float(lb.total))
    assert not np.array_equal(np.asarray(new_params["conv12"]["kernel"]),
                              np.asarray(params["conv12"]["kernel"]))


@pytest.mark.parametrize("net", ["squeezeDet+", "vgg16", "resnet50"])
def test_one_train_step_every_backbone(net, rng):
    """One real train step per non-flagship backbone: the trainable-
    subtree gradient partition must compose with each freeze mask
    (vgg16 freezes conv1_1-2; resnet50 freezes conv1+res2+res3 incl.
    frozen-stats BN affine params), frozen leaves must hold still, and
    trainable leaves must move."""
    tcfg = tiny_test_config(net=net, image_width=96, image_height=96,
                            batch_size=1)
    det = get_model(net, tcfg)
    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    tx = build_optimizer(tcfg, mask)
    step = make_train_step(det, tx, donate=False)
    imgs = jnp.asarray(rng.randn(1, 96, 96, 3).astype(np.float32))
    tg = _toy_targets(tcfg, rng)
    new_params, _, lb = step(params, tx.init(params), imgs, tg,
                             jax.random.key(1))
    assert np.isfinite(float(lb.total))
    moved = frozen_still = 0
    flat_new = jax.tree_util.tree_leaves_with_path(new_params)
    old = dict((jax.tree_util.keystr(k), v) for k, v in
               jax.tree_util.tree_leaves_with_path(params))
    flat_mask = dict((jax.tree_util.keystr(k), v) for k, v in
                     jax.tree_util.tree_leaves_with_path(mask))
    for key_path, leaf in flat_new:
        ks = jax.tree_util.keystr(key_path)
        same = np.array_equal(np.asarray(leaf), np.asarray(old[ks]))
        if flat_mask[ks]:
            moved += not same
        else:
            frozen_still += same
            assert same, "frozen leaf moved: {}".format(ks)
    assert moved > 0 and frozen_still > 0


def test_uint8_ingest_step_matches_f32(kitti_root, cfg):
    """The uint8-ingest device step (raw uint8 in, on-device mean
    subtraction) reproduces the f32-ingest step's loss and updates
    within ingest-rounding tolerance."""
    from squeezedet_tpu.trainer import make_train_step_device
    no_aug = cfg.replace(data_augmentation=False)
    det = get_model("squeezeDet", no_aug)
    db_f = Kitti("train", kitti_root, no_aug, rng=np.random.RandomState(5))
    db_u = Kitti("train", kitti_root, no_aug, rng=np.random.RandomState(5))
    imgs_f, gt, labels, num_gt = db_f.read_batch_raw_targets(
        shuffle=False, max_gt=16)
    imgs_u, gt_u, labels_u, num_gt_u = db_u.read_batch_raw_targets(
        shuffle=False, max_gt=16, uint8_images=True)
    np.testing.assert_allclose(gt, gt_u, rtol=1e-6)

    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    tx = build_optimizer(cfg, mask)
    step_f = make_train_step_device(det, tx, donate=False)
    step_u = make_train_step_device(det, tx, donate=False,
                                    uint8_ingest=True)
    key = jax.random.key(1)
    args = (jnp.asarray(gt), jnp.asarray(labels), jnp.asarray(num_gt))
    pf, _, lb_f = step_f(params, tx.init(params), jnp.asarray(imgs_f),
                         *args, key)
    pu, _, lb_u = step_u(params, tx.init(params), jnp.asarray(imgs_u),
                         *args, key)
    assert imgs_u.dtype == np.uint8
    assert abs(float(lb_f.total) - float(lb_u.total)) < 0.05 * max(
        1.0, abs(float(lb_f.total)))
    np.testing.assert_allclose(
        np.asarray(pu["conv12"]["kernel"]),
        np.asarray(pf["conv12"]["kernel"]), rtol=0.05, atol=1e-4)


def test_device_assign_loss_matches_host_path(kitti_root, cfg):
    """Same batch through host matcher vs device matcher -> same loss."""
    from squeezedet_tpu.data.device_pipeline import assign_anchors_device
    from squeezedet_tpu.data.targets import batch_to_dense_targets
    det = get_model("squeezeDet", cfg)
    no_aug = cfg.replace(data_augmentation=False)
    db1 = Kitti("train", kitti_root, no_aug, rng=np.random.RandomState(7))
    db2 = Kitti("train", kitti_root, no_aug, rng=np.random.RandomState(7))
    batch = db1.read_batch(shuffle=False)
    images_h, tg_host = batch_to_dense_targets(
        batch, num_anchors=cfg.anchors, num_classes=cfg.classes)
    images_d, gt_boxes, gt_labels, num_gt = db2.read_batch_raw_targets(
        shuffle=False, max_gt=16)
    np.testing.assert_allclose(images_h, images_d, atol=1e-5)
    tg_dev = assign_anchors_device(
        jnp.asarray(np.asarray(cfg.anchor_box, np.float32)),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(num_gt), num_classes=cfg.classes)
    # the host path matches in float64, the device path in float32:
    # near-tie IoUs can pick different anchors, so require agreement on
    # all but a tiny fraction and exact deltas where anchors agree
    m_dev = np.asarray(tg_dev.input_mask)
    m_host = tg_host.input_mask
    assert m_dev.sum() == m_host.sum()
    disagree = (m_dev != m_host).sum()
    assert disagree <= max(2, 0.05 * m_host.sum()), disagree
    both = (m_dev > 0) & (m_host > 0)
    np.testing.assert_allclose(
        np.asarray(tg_dev.box_delta_input)[both],
        tg_host.box_delta_input[both], rtol=1e-4, atol=1e-5)


def test_restore_rejects_mismatched_checkpoint(cfg, tmp_path):
    """A checkpoint from a different model shape must fail loudly, not
    flow silently into a mismatched net (orbax restores saved shapes)."""
    from squeezedet_tpu.checkpoint.manager import CheckpointManager
    det = get_model("squeezeDet", cfg)
    params, mask, _ = det.init(jax.random.key(0))
    tx = build_optimizer(cfg, mask)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(3, TrainState(params=params, opt_state=tx.init(params),
                           step=3).as_tree())

    other_cfg = tiny_test_config(net="squeezeDet+", image_width=96,
                                 image_height=96)
    det2 = get_model("squeezeDet+", other_cfg)
    params2, mask2, _ = det2.init(jax.random.key(0))
    tx2 = build_optimizer(other_cfg, mask2)
    template = TrainState(params=params2,
                          opt_state=tx2.init(params2)).as_tree()
    with pytest.raises(ValueError, match="shape mismatch"):
        mgr.restore(3, template)


class _CapturingWriter:
    """Summary-writer stub recording every emitted tag."""

    def __init__(self):
        self.scalars, self.images, self.histograms = {}, {}, {}

    def scalar(self, tag, value, step):
        self.scalars.setdefault(tag, []).append((step, value))

    def image(self, tag, images, step, max_outputs=20):
        self.images.setdefault(tag, []).append((step, np.asarray(images)))

    def histogram(self, tag, values, step, buckets=None):
        self.histograms.setdefault(tag, []).append(
            (step, np.asarray(values)))


def test_observability_histograms_and_device_assign_viz(
        kitti_root, cfg, tmp_path):
    """Per-variable/per-gradient histograms, five-stat activation
    summaries, and detection-image viz under --device_assign
    (nn_skeleton.py:353-358, :736-755, train.py:287-296)."""
    det = get_model("squeezeDet", cfg)
    db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    writer = _CapturingWriter()
    train(det, db, train_dir=str(tmp_path / "t"), max_steps=2,
          checkpoint_step=10, summary_step=1, summary_writer=writer,
          viz_step=1, device_assign=True, histogram_step=1,
          activation_summary=True, log_every=1)

    # viz images were produced despite device_assign (round-1 gap)
    assert "sample_detection_results" in writer.images
    ims = writer.images["sample_detection_results"][0][1]
    assert ims.shape[0] >= 1 and ims.dtype == np.uint8

    # per-variable + per-gradient histograms for every TRAINABLE leaf,
    # like the reference (nn_skeleton.py:353-358 loops over
    # tf.trainable_variables() for both) — frozen conv1 has neither
    assert any(t.startswith("params/conv12") for t in writer.histograms)
    assert any(t.startswith("gradients/conv12")
               for t in writer.histograms)
    assert not any(t.startswith("params/conv1/")
                   for t in writer.histograms)
    assert not any(t.startswith("gradients/conv1/")
                   for t in writer.histograms)
    n_param = sum(t.startswith("params/") for t in writer.histograms)
    n_grad = sum(t.startswith("gradients/") for t in writer.histograms)
    assert n_param == n_grad > 10

    # five-stat activation summaries: histogram + 4 scalars per layer
    act_tags = [t for t in writer.histograms if t.startswith("activations/")]
    assert "activations/conv1" in act_tags
    assert "activations/fire2" in act_tags
    assert "activations/det_boxes/cx" in act_tags
    for stat in ("sparsity", "mean", "max", "min"):
        assert "activation_summary/conv1/{}".format(stat) in writer.scalars
    # sparsity of a relu layer is a sane fraction
    s = writer.scalars["activation_summary/conv1/sparsity"][0][1]
    assert 0.0 <= s <= 1.0


def test_restore_params_only(cfg, tmp_path):
    """Inference restore needs no optimizer-state template (reference
    Saver(model.model_params), eval.py:205)."""
    from squeezedet_tpu.checkpoint.manager import CheckpointManager
    det = get_model("squeezeDet", cfg)
    params, mask, _ = det.init(jax.random.key(0))
    tx = build_optimizer(cfg, mask)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(7, TrainState(params=params, opt_state=tx.init(params),
                           step=7).as_tree())

    template, _, _ = det.init(jax.random.key(1))  # different values
    restored = mgr.restore_params(7, template)
    np.testing.assert_array_equal(
        np.asarray(restored["conv1"]["kernel"]),
        np.asarray(params["conv1"]["kernel"]))

    # shape validation still applies
    other_cfg = tiny_test_config(net="squeezeDet+", image_width=96,
                                 image_height=96)
    det2 = get_model("squeezeDet+", other_cfg)
    params2, _, _ = det2.init(jax.random.key(0))
    with pytest.raises(Exception):
        mgr.restore_params(7, params2)


def test_device_dataset_step_on_8_device_mesh(rng):
    """The HBM-resident dataset step SHARDS the stack over the full
    8-device mesh (each device holds its own rows; 8 chips hold 8× the
    dataset), index/aug/GT rows batch-sharded, the gather shard-local —
    no all-gather of the stack in the HLO — and the program computes
    the same loss as feeding the host-gathered rows through the
    canvas-batch step."""
    from squeezedet_tpu.parallel.mesh import (batch_sharding,
                                              dataset_sharding, make_mesh,
                                              replicated_sharding)
    from squeezedet_tpu.trainer import make_train_step_device
    cfg8 = tiny_test_config(image_width=64, image_height=64,
                            batch_size=8)
    det = get_model("squeezeDet", cfg8)
    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    tx = build_optimizer(cfg8, mask)
    opt = tx.init(params)

    rows = 2  # per-shard rows of the padded shard-major stack
    stack = rng.randint(0, 255, (8 * rows, 64, 96, 3)).astype(np.uint8)
    # slot s draws only from shard s's rows [s*rows, (s+1)*rows)
    pos = np.asarray([s * rows + rng.randint(rows) for s in range(8)],
                     np.int32)
    aug = np.zeros((8, 5), np.float32)
    aug[:, 3], aug[:, 4] = 96.0, 64.0  # no drift/flip, full extents
    gt = np.tile(np.asarray([[32.0, 30.0, 20.0, 16.0]], np.float32),
                 (8, 1))[:, None, :]
    labels = np.zeros((8, 1), np.int32)
    num_gt = np.ones((8,), np.int32)

    mesh = make_mesh(8)
    rep, data = replicated_sharding(mesh), batch_sharding(mesh)
    p = jax.device_put(params, rep)
    o = jax.device_put(opt, rep)
    step = make_train_step_device(det, tx, mesh=mesh, donate=False,
                                  device_dataset=True)
    args = (p, o, jax.device_put(jnp.asarray(stack),
                                 dataset_sharding(mesh)),
            jax.device_put(jnp.asarray(pos), data),
            jax.device_put(jnp.asarray(aug), data),
            jax.device_put(jnp.asarray(gt), data),
            jax.device_put(jnp.asarray(labels), data),
            jax.device_put(jnp.asarray(num_gt), data),
            jax.random.key(1))
    compiled = step.lower(*args).compile()
    assert "all-gather" not in compiled.as_text(), (
        "sharded-dataset program all-gathers; the canvas gather was "
        "supposed to be shard-local")
    _, _, lb = compiled(*args)
    total = float(lb.total)
    assert np.isfinite(total)

    # single-device canvas-batch twin on the host-gathered rows
    step_cv = make_train_step_device(det, tx, donate=False,
                                     device_augment=True)
    _, _, lb_cv = step_cv(params, opt, jnp.asarray(stack[pos]),
                          jnp.asarray(aug), jnp.asarray(gt),
                          jnp.asarray(labels), jnp.asarray(num_gt),
                          jax.random.key(1))
    np.testing.assert_allclose(total, float(lb_cv.total), rtol=1e-5)


def test_local_data_coords_diagnostics(monkeypatch):
    """local_data_coords must fail with actionable ValueErrors, not an
    IndexError, when a controller owns no devices on the mesh's data
    axis (e.g. the mesh was built over a device subset excluding this
    host) — the error is what a misconfigured multihost
    --device_dataset run sees."""
    import pytest

    from squeezedet_tpu.parallel import mesh as pm

    m = pm.make_mesh(2)
    assert pm.local_data_coords(m) == [0, 1]
    # pretend to be a process that owns none of the mesh's devices
    monkeypatch.setattr(pm.jax, "process_index", lambda: 7)
    with pytest.raises(ValueError, match="owns no devices"):
        pm.local_data_coords(m)


def test_mesh_train_matches_single_device(rng):
    """K data-parallel steps on the 8-CPU mesh must match single-device
    training numerically (same params, same loss trajectory) — XLA's
    gradient psum over the mesh is exact up to reduction order."""
    from squeezedet_tpu.parallel.mesh import (make_mesh,
                                              replicated_sharding,
                                              shard_batch)
    cfg8 = tiny_test_config(image_width=96, image_height=96, batch_size=8)
    det = get_model("squeezeDet", cfg8)
    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    tx = build_optimizer(cfg8, mask)
    targets = _toy_targets(cfg8, rng)
    images = jnp.asarray(
        rng.randn(8, 96, 96, 3).astype(np.float32))

    def run(mesh, steps=3):
        p, o = params, tx.init(params)
        step = make_train_step(det, tx, mesh=mesh, donate=False)
        ims, tg = images, targets
        if mesh is not None:
            rep = replicated_sharding(mesh)
            p = jax.device_put(p, rep)
            o = jax.device_put(o, rep)
            ims = shard_batch(mesh, ims)
            tg = shard_batch(mesh, tg)
        losses = []
        for k in range(steps):
            p, o, lb = step(p, o, ims, tg, jax.random.key(100 + k))
            losses.append(float(lb.total))
        return jax.device_get(p), losses

    p1, losses1 = run(None)
    p8, losses8 = run(make_mesh(8))
    np.testing.assert_allclose(losses8, losses1, rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_auto_mesh_and_multihost_noop():
    from squeezedet_tpu.parallel.distributed import (initialize_multihost,
                                                     is_primary_process)
    from squeezedet_tpu.parallel.mesh import auto_mesh

    # 8 virtual CPU devices (conftest): the largest device count that
    # divides the batch wins; batch 1 cannot be sharded -> None
    assert auto_mesh(16).devices.size == 8
    assert auto_mesh(6).devices.size == 6
    assert auto_mesh(7).devices.size == 7
    assert auto_mesh(1) is None

    # single-process environment: multihost init must be a clean no-op
    assert initialize_multihost() is False
    assert is_primary_process()


def test_histograms_host_target_path(kitti_root, cfg, tmp_path):
    """Gradient histograms through the host-matcher (non-device_assign)
    train path."""
    det = get_model("squeezeDet", cfg)
    db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    writer = _CapturingWriter()
    train(det, db, train_dir=str(tmp_path / "t"), max_steps=1,
          checkpoint_step=10, summary_step=1, summary_writer=writer,
          histogram_step=1, log_every=1)
    assert any(t.startswith("gradients/conv12") for t in writer.histograms)
    assert any(t.startswith("params/fire2") for t in writer.histograms)


def test_sampler_state_roundtrip(kitti_root, cfg):
    """A sampler_state snapshot replays the input stream exactly: same
    batch composition and same augmentation draws (drift, flip) on a
    fresh Imdb seeded differently."""
    db1 = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(7))
    for _ in range(3):
        db1.read_batch_raw_targets(max_gt=8)
    snap = db1.sampler_state()
    expect = [db1.read_batch_raw_targets(max_gt=8) for _ in range(3)]

    db2 = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(99))
    db2.set_sampler_state(snap)
    got = [db2.read_batch_raw_targets(max_gt=8) for _ in range(3)]
    for a, b in zip(expect, got):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_resume_restores_sampler(kitti_root, cfg, tmp_path, capsys):
    """The train loop checkpoints the input-stream state next to each
    model checkpoint and restores it on resume."""
    det = get_model("squeezeDet", cfg)
    db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    train_dir = str(tmp_path / "train")
    train(det, db, train_dir=train_dir, max_steps=2,
          checkpoint_step=1, summary_step=1000, log_every=1)
    assert os.path.exists(os.path.join(train_dir, "sampler.ckpt-1.npz"))

    db2 = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(5))
    train(det, db2, train_dir=train_dir, max_steps=3,
          checkpoint_step=10, summary_step=1000, log_every=1)
    out = capsys.readouterr().out
    assert "Resumed from step 2" in out
    assert "Restored input-stream state (sampler.ckpt-1.npz)" in out


def test_async_checkpoint_save_finalizes(cfg, tmp_path):
    """wait=False saves finalize atomically: after wait_until_finished
    the step restores bit-identically, and no tmp dir is ever visible
    to latest_step."""
    from squeezedet_tpu.checkpoint.manager import (CheckpointManager,
                                                   latest_step)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    tree = {"params": jax.device_get(params),
            "step": np.asarray(3, np.int64)}
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(3, tree, wait=False)
    mgr.wait_until_finished()
    assert latest_step(str(tmp_path)) == 3
    restored = mgr.restore(3, tree)
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_checkpoint_retention_bounds_dir(tmp_path):
    """max_to_keep prunes older steps (and their sampler snapshots)
    after each save, like the reference Saver default of 5
    (reference train.py:240); the newest steps always survive."""
    from squeezedet_tpu.checkpoint.manager import (CheckpointManager,
                                                   all_steps, latest_step)
    d = str(tmp_path)
    mgr = CheckpointManager(d, max_to_keep=3)
    for step in range(1, 9):
        mgr.save(step, {"w": np.full((4,), step, np.float32)})
        np.savez(os.path.join(d, "sampler.ckpt-{}.npz".format(step)),
                 cur=np.asarray(step))
    assert all_steps(d) == [6, 7, 8]
    assert latest_step(d) == 8
    samplers = sorted(n for n in os.listdir(d)
                      if n.startswith("sampler.ckpt-"))
    assert samplers == ["sampler.ckpt-6.npz", "sampler.ckpt-7.npz",
                        "sampler.ckpt-8.npz"]
    # pruned steps are fully gone (no .pruning leftovers)
    assert not [n for n in os.listdir(d) if n.endswith(".pruning")]
    # the survivors restore fine
    like = {"w": np.zeros((4,), np.float32)}
    np.testing.assert_array_equal(mgr.restore(6, like)["w"],
                                  np.full((4,), 6, np.float32))


def test_checkpoint_retention_exact_step_match(tmp_path):
    """Pruning step 1000 must not claim sampler.ckpt-10000.npz (a
    decimal-prefix collision with a LIVE step), and a stale non-empty
    ``*.pruning`` dir from a crashed prune is swept instead of blocking
    that step's deletion forever."""
    from squeezedet_tpu.checkpoint.manager import (CheckpointManager,
                                                   all_steps)
    d = str(tmp_path)
    mgr = CheckpointManager(d, max_to_keep=2)
    for step in (1000, 10000):
        mgr.save(step, {"w": np.full((4,), step, np.float32)})
        np.savez(os.path.join(d, "sampler.ckpt-{}.npz".format(step)),
                 cur=np.asarray(step))
        np.savez(os.path.join(d, "sampler.ckpt-{}.p0.npz".format(step)),
                 cur=np.asarray(step))
    # crashed-prune residue: a non-empty rename target for step 1000
    stale = os.path.join(d, "model.ckpt-1000.pruning")
    os.makedirs(stale)
    with open(os.path.join(stale, "leftover"), "w") as f:
        f.write("x")

    mgr.save(20000, {"w": np.full((4,), 20000, np.float32)})
    assert all_steps(d) == [10000, 20000]
    samplers = sorted(n for n in os.listdir(d)
                      if n.startswith("sampler.ckpt-"))
    assert samplers == ["sampler.ckpt-10000.npz",
                        "sampler.ckpt-10000.p0.npz"]
    assert not [n for n in os.listdir(d) if ".pruning" in n]


def test_checkpoint_retention_daemon_race(tmp_path):
    """A concurrently polling eval daemon (latest_step + restore, like
    eval.main) never observes an empty dir, a half-deleted step, or a
    step going backwards while the trainer saves and prunes."""
    import threading

    from squeezedet_tpu.checkpoint.manager import (CheckpointManager,
                                                   latest_step)
    d = str(tmp_path)
    writer = CheckpointManager(d, max_to_keep=2)
    reader = CheckpointManager(d)
    like = {"w": np.zeros((4,), np.float32)}
    writer.save(1, {"w": np.full((4,), 1, np.float32)})

    stop = threading.Event()
    failures = []
    observed = []

    def daemon():
        last = 0
        while not stop.is_set():
            s = latest_step(d)
            if s is None:
                failures.append("empty dir observed")
                return
            if s < last:
                failures.append("step went backwards: {} -> {}".format(
                    last, s))
                return
            if s != last:
                last = s
                observed.append(s)
                try:
                    got = reader.restore(s, like)
                    np.testing.assert_array_equal(
                        got["w"], np.full((4,), s, np.float32))
                except Exception as e:  # noqa: BLE001 - recorded
                    failures.append("restore({}) failed: {}".format(s, e))
                    return

    t = threading.Thread(target=daemon)
    t.start()
    try:
        for step in range(2, 12):
            writer.save(step, {"w": np.full((4,), step, np.float32)})
    finally:
        stop.set()
        t.join()
    assert not failures, failures
    assert observed, "daemon never saw a checkpoint"


def test_scan_dispatch_matches_single_steps(kitti_root, cfg):
    """K scanned steps in one device program == K single dispatches fed
    the same per-step RNG keys (params + loss trajectory)."""
    from squeezedet_tpu.trainer import (make_train_step_device,
                                        make_train_step_device_scan)
    det = get_model("squeezeDet", cfg)
    db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    K = 3
    batches = [db.read_batch_raw_targets(shuffle=False, max_gt=16)
               for _ in range(K)]
    stacked = [jnp.asarray(np.stack([b[i] for b in batches]))
               for i in range(4)]
    keys = jax.random.split(jax.random.key(5), K)

    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    tx = build_optimizer(cfg, mask)

    single = make_train_step_device(det, tx, donate=False)
    p, o = params, tx.init(params)
    losses = []
    for i in range(K):
        p, o, lb = single(p, o, *[x[i] for x in stacked], keys[i])
        losses.append(float(lb.total))

    scan = make_train_step_device_scan(det, tx, K, donate=False)
    p2, o2, lbs = scan(params, tx.init(params), *stacked, keys)
    np.testing.assert_allclose(np.asarray(lbs.total), losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_train_loop_steps_per_dispatch(kitti_root, cfg, tmp_path):
    """The scanned-dispatch loop: cadence coverage, odd tail, checkpoint
    naming compatible with resume."""
    det = get_model("squeezeDet", cfg)
    db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    train_dir = str(tmp_path / "train")
    state = train(det, db, train_dir=train_dir, max_steps=5,
                  checkpoint_step=2, summary_step=1000, log_every=1,
                  device_assign=True, steps_per_dispatch=2)
    assert state.step == 5
    from squeezedet_tpu.checkpoint.manager import latest_step
    assert latest_step(train_dir) == 4
    assert os.path.exists(os.path.join(train_dir, "sampler.ckpt-4.npz"))
    # resume picks up from the scanned run's checkpoints
    state2 = train(det, db, train_dir=train_dir, max_steps=6,
                   checkpoint_step=10, summary_step=1000, log_every=1,
                   device_assign=True, steps_per_dispatch=2)
    assert state2.step == 6

def test_train_loop_device_augment(kitti_root, tmp_path):
    """Full train loop with the on-device augmentation pipeline: raw
    uint8 canvases + BatchPlan aug rows feed the jitted
    drift/flip/resize/normalize program (VERDICT r3 item 2); runs
    through both the K=1 and scanned loops, over the mesh, and
    checkpoints/resumes normally."""
    aug_cfg = tiny_test_config(image_width=96, image_height=96,
                               batch_size=2).replace(
        data_augmentation=True, drift_x=20, drift_y=20)
    det = get_model("squeezeDet", aug_cfg)
    db = Kitti("train", kitti_root, aug_cfg,
               rng=np.random.RandomState(0))
    train_dir = str(tmp_path / "train")
    state = train(det, db, train_dir=train_dir, max_steps=3,
                  checkpoint_step=2, summary_step=1000, log_every=1,
                  device_assign=True, device_augment=True)
    assert state.step == 3
    # scanned dispatches compose with the canvas path; resume continues
    state2 = train(det, db, train_dir=train_dir, max_steps=5,
                   checkpoint_step=10, summary_step=1000, log_every=1,
                   device_assign=True, device_augment=True,
                   steps_per_dispatch=2)
    assert state2.step == 5


def test_train_loop_device_dataset_equals_canvas_feed(kitti_root,
                                                      tmp_path):
    """--device_dataset (HBM-resident canvas stack, SHARDED over the
    mesh data axis, on-device shard-local gather) must train the SAME
    trajectory as --device_augment's per-step host canvas feed given
    the same per-shard sampler: the storage/gather machinery adds
    nothing to the stream (host rows pinned identical by
    test_device_pipeline.test_plan_rows_match_canvas_reader).  The
    train loop activates imdb.shard_data(D) itself for the ds arm; the
    cv arm applies it manually so both consume the identical stream.
    Also runs the scanned dispatch + resume composition."""
    from squeezedet_tpu.parallel.mesh import make_mesh
    aug_cfg = tiny_test_config(image_width=96, image_height=96,
                               batch_size=2).replace(
        data_augmentation=True, drift_x=20, drift_y=20)

    def run(tag, shard=False, **kw):
        det = get_model("squeezeDet", aug_cfg)
        db = Kitti("train", kitti_root, aug_cfg,
                   rng=np.random.RandomState(0))
        if shard:
            db.shard_data(2)
        return train(det, db, train_dir=str(tmp_path / tag),
                     max_steps=3, checkpoint_step=100,
                     summary_step=1000, log_every=1, mesh=make_mesh(2),
                     device_assign=True, **kw)

    s_ds = run("ds", device_dataset=True)
    s_cv = run("cv", shard=True, device_augment=True)
    assert s_ds.step == 3
    for a, b in zip(jax.tree_util.tree_leaves(s_ds.params),
                    jax.tree_util.tree_leaves(s_cv.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)

    # scanned dispatches compose with the resident dataset; resume
    # continues from the K=1 run's checkpoints
    det = get_model("squeezeDet", aug_cfg)
    db = Kitti("train", kitti_root, aug_cfg,
               rng=np.random.RandomState(0))
    state = train(det, db, train_dir=str(tmp_path / "ds_scan"),
                  max_steps=4, checkpoint_step=2, summary_step=1000,
                  log_every=1, device_assign=True, device_dataset=True,
                  steps_per_dispatch=2)
    assert state.step == 4


def test_loader_stream_deterministic_and_exact_resume(kitti_root, cfg):
    """Multi-threaded prefetch: (a) the batch stream is a deterministic
    function of the seed for any thread count (batch-atomic RNG draws +
    ticketed enqueue), and (b) restoring the CONSUMED batch's carried
    sampler state replays the subsequent stream bit-exactly."""
    aug = cfg.replace(data_augmentation=True, drift_x=30, drift_y=20)
    db1 = Kitti("train", kitti_root, aug, rng=np.random.RandomState(7))
    l1 = PrefetchLoader(db1, num_threads=3, capacity=2,
                        device_targets=True, max_gt=8).start()
    try:
        batches, states = [], []
        for _ in range(5):
            batches.append(l1.get(timeout=30))
            states.append(l1.consumed_state())
    finally:
        l1.stop()

    # fresh imdb with a different seed; restore post-batch-3 state and
    # expect batches 4..5 bit-identically
    db2 = Kitti("train", kitti_root, aug, rng=np.random.RandomState(123))
    db2.set_sampler_state(states[2])
    l2 = PrefetchLoader(db2, num_threads=3, capacity=2,
                        device_targets=True, max_gt=8).start()
    try:
        got = [l2.get(timeout=30) for _ in range(2)]
    finally:
        l2.stop()
    for a, b in zip(batches[3:], got):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_resume_is_bit_exact(kitti_root, tmp_path):
    """Kill training mid-run, resume from the checkpoint, and the final
    params must be BIT-identical to an uninterrupted run: the consumed
    batch's sampler snapshot plus the saved step-RNG key reconstruct the
    exact remaining trajectory (VERDICT r2 item 6)."""
    from squeezedet_tpu.config import tiny_test_config
    cfg = tiny_test_config(image_width=96, image_height=96, batch_size=2
                           ).replace(data_augmentation=True, drift_x=20,
                                     drift_y=12, num_thread=3)
    det = get_model("squeezeDet", cfg)

    # uninterrupted: 4 steps
    db_a = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(3))
    state_a = train(det, db_a, train_dir=str(tmp_path / "a"), max_steps=4,
                    checkpoint_step=100, summary_step=1000, log_every=1,
                    device_assign=True, max_gt=8, seed=11)

    # interrupted at 2, resumed to 4
    db_b = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(3))
    train(det, db_b, train_dir=str(tmp_path / "b"), max_steps=2,
          checkpoint_step=100, summary_step=1000, log_every=1,
          device_assign=True, max_gt=8, seed=11)
    db_b2 = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(77))
    state_b = train(det, db_b2, train_dir=str(tmp_path / "b"), max_steps=4,
                    checkpoint_step=100, summary_step=1000, log_every=1,
                    device_assign=True, max_gt=8, seed=11)

    leaves_a = jax.tree_util.tree_leaves(state_a.params)
    leaves_b = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dispatch_cadences_unit(cfg, tmp_path, capsys):
    """The shared cadence helper (VERDICT r2 item 7): one implementation
    must serve both loops — scalar loss leaves (K=1 path) and
    [K]-leading leaves (scan path) — with identical gate semantics."""
    from squeezedet_tpu.models.skeleton import LossBreakdown
    from squeezedet_tpu.summary import SummaryWriter
    from squeezedet_tpu.trainer import _dispatch_cadences
    import time as _time

    def lb_scalar(total):
        return LossBreakdown(*(jnp.float32(v) for v in
                               (total, 0.1, 0.2, 0.3, 0.5)))

    def lb_scan(totals):
        k = len(totals)
        return LossBreakdown(
            jnp.asarray(totals, jnp.float32),
            *(jnp.full((k,), v, jnp.float32) for v in (0.1, 0.2, 0.3,
                                                       0.5)))

    common = dict(start_time=_time.time(), cfg=cfg, log_every=2,
                  summary_step=3, checkpoint_step=4, max_steps=100)

    # quiet step: nothing fires, loss is NOT materialized (async keep)
    do_sum, ckpt, totals = _dispatch_cadences(
        range(1, 2), lb_scalar(1.0), summary_writer=None, **common)
    assert (do_sum, ckpt, totals) == (False, False, None)

    # K=1 cadence hits: log at %2, checkpoint at %4
    do_sum, ckpt, totals = _dispatch_cadences(
        range(4, 5), lb_scalar(2.0), summary_writer=None, **common)
    assert ckpt and totals.shape == (1,) and totals[0] == 2.0
    assert "step 4" in capsys.readouterr().out

    # scan dispatch covering [2..4]: every covered step is evaluated
    w = SummaryWriter(str(tmp_path / "ev"))
    do_sum, ckpt, totals = _dispatch_cadences(
        range(2, 5), lb_scan([1.0, 2.0, 3.0]), summary_writer=w,
        **common)
    w.close()
    assert do_sum and ckpt  # summary due at step 3, checkpoint at 4
    np.testing.assert_array_equal(totals, [1.0, 2.0, 3.0])
    assert "3-step dispatch" in capsys.readouterr().out

    # last-step checkpoint: fires at max_steps-1 regardless of cadence
    _, ckpt, _ = _dispatch_cadences(
        range(99, 100), lb_scalar(1.0), summary_writer=None, **common)
    assert ckpt

    # NaN divergence gate (reference train.py:313-315)
    with pytest.raises(AssertionError, match="diverged"):
        _dispatch_cadences(range(4, 5), lb_scalar(float("nan")),
                           summary_writer=None, **common)


def test_recipe_batch_cli_equals_api():
    """--recipe_batch N must equal scale_recipe_to_batch applied to the
    base recipe (the flag exists so the silent-mAP-collapse footgun —
    forgetting the conf_pos rescale — is one flag away from impossible)."""
    from squeezedet_tpu.config.kitti import scale_recipe_to_batch
    from squeezedet_tpu.train import build_arg_parser, config_from_args

    base_argv = ['--batch_size', '16', '--learning_rate', '0.001',
                 '--max_steps', '375']
    p = build_arg_parser()
    cfg_base = config_from_args(p.parse_args(base_argv))
    cfg_cli = config_from_args(
        p.parse_args(base_argv + ['--recipe_batch', '128']))
    cfg_api = scale_recipe_to_batch(cfg_base, 128, total_steps=375)
    assert cfg_cli.batch_size == cfg_api.batch_size == 128
    assert cfg_cli.learning_rate == cfg_api.learning_rate == pytest.approx(
        0.008)
    assert cfg_cli.decay_steps == cfg_api.decay_steps == 1250
    assert cfg_cli.loss_coef_conf_pos == cfg_api.loss_coef_conf_pos \
        == pytest.approx(600.0)
    assert cfg_cli.lr_warmup_steps == cfg_api.lr_warmup_steps == 38

    # explicit expert flags still win over the derived values
    cfg_over = config_from_args(p.parse_args(
        base_argv + ['--recipe_batch', '128', '--lr_warmup_steps', '40',
                     '--loss_coef_conf_pos', '500']))
    assert cfg_over.lr_warmup_steps == 40
    assert cfg_over.loss_coef_conf_pos == pytest.approx(500.0)


def test_loss_coef_zero_override_respected():
    """An explicit --loss_coef_conf_neg 0 is a meaningful ablation and
    must not be swallowed by a truthiness check (advisor r4)."""
    from squeezedet_tpu.train import build_arg_parser, config_from_args

    p = build_arg_parser()
    cfg = config_from_args(p.parse_args(['--loss_coef_conf_neg', '0']))
    assert cfg.loss_coef_conf_neg == 0.0
    # and leaving it unset keeps the config default
    cfg = config_from_args(p.parse_args([]))
    assert cfg.loss_coef_conf_neg == 100.0
    # --lr_warmup_steps 0 must likewise override a --recipe_batch-derived
    # warmup (ablation arm), not be swallowed by truthiness
    cfg = config_from_args(p.parse_args(
        ['--recipe_batch', '128', '--max_steps', '375',
         '--lr_warmup_steps', '0']))
    assert cfg.lr_warmup_steps == 0
    # a zero/negative decay interval is invalid, not 'config default'
    with pytest.raises(SystemExit):
        config_from_args(p.parse_args(['--decay_steps', '0']))
    cfg = config_from_args(p.parse_args([]))
    assert cfg.decay_steps == 10000


def test_observability_under_device_augment_and_dataset(kitti_root,
                                                        tmp_path):
    """--device_augment / --device_dataset keep the reference's summary
    surface (round-4 verdict item 3): the augmented batch exists on
    device, so summary steps replay augment_resize_normalize on the
    batch's canvas rows (gathered from the HBM stack under
    device_dataset) and emit detection-viz images, per-variable /
    per-gradient histograms and activation summaries instead of zeroing
    the flags (reference train.py:287-296, nn_skeleton.py:353-372)."""
    aug_cfg = tiny_test_config(image_width=96, image_height=96,
                               batch_size=2).replace(
        data_augmentation=True, drift_x=20, drift_y=20)

    for tag, kw in (("aug", dict(device_augment=True)),
                    ("ds", dict(device_dataset=True))):
        det = get_model("squeezeDet", aug_cfg)
        db = Kitti("train", kitti_root, aug_cfg,
                   rng=np.random.RandomState(0))
        writer = _CapturingWriter()
        train(det, db, train_dir=str(tmp_path / tag), max_steps=2,
              checkpoint_step=10, summary_step=1, summary_writer=writer,
              viz_step=1, device_assign=True, histogram_step=1,
              activation_summary=True, log_every=1, **kw)
        assert "sample_detection_results" in writer.images, tag
        ims = writer.images["sample_detection_results"][0][1]
        assert ims.shape[0] >= 1 and ims.dtype == np.uint8, tag
        assert any(t.startswith("gradients/conv12")
                   for t in writer.histograms), tag
        assert "activations/conv1" in writer.histograms, tag
        s = writer.scalars["activation_summary/conv1/sparsity"][0][1]
        assert 0.0 <= s <= 1.0, tag


def test_device_dataset_sharded_resume_matches_straight_run(kitti_root,
                                                            tmp_path):
    """Interrupt/resume of a mesh-sharded --device_dataset run: the
    sharded sampler snapshot (per-shard permutations + cursors) rides
    the checkpoint, shard_data() precedes the restore in train(), and
    the resumed trajectory must equal an uninterrupted run bit-for-bit."""
    from squeezedet_tpu.parallel.mesh import make_mesh
    aug_cfg = tiny_test_config(image_width=96, image_height=96,
                               batch_size=2).replace(
        data_augmentation=True, drift_x=20, drift_y=20)

    def run(tag, max_steps, resume=True):
        det = get_model("squeezeDet", aug_cfg)
        db = Kitti("train", kitti_root, aug_cfg,
                   rng=np.random.RandomState(0))
        return train(det, db, train_dir=str(tmp_path / tag),
                     max_steps=max_steps, checkpoint_step=2,
                     summary_step=1000, log_every=1, mesh=make_mesh(2),
                     device_assign=True, device_dataset=True,
                     resume=resume)

    run("split", 2)                 # first half; ckpt + sampler at 1
    s_resumed = run("split", 4)     # resumes at 2, continues stream
    s_straight = run("straight", 4, resume=False)
    assert s_resumed.step == s_straight.step == 4
    for a, b in zip(jax.tree_util.tree_leaves(s_resumed.params),
                    jax.tree_util.tree_leaves(s_straight.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
