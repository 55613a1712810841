"""On-device pipeline parity vs the host numpy reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.data.device_pipeline import (
    assign_anchors_device, augment_resize_normalize, normalize_images)
from squeezedet_tpu.data.imdb import assign_anchors
from squeezedet_tpu.data.targets import dense_targets_from_batch


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config(image_width=160, image_height=96)


def _random_gt(rng, n, W, H):
    """Center-format boxes with nonzero size, inside the image."""
    w = rng.uniform(8, 50, n)
    h = rng.uniform(8, 50, n)
    cx = rng.uniform(w / 2, W - w / 2)
    cy = rng.uniform(h / 2, H - h / 2)
    return np.stack([cx, cy, w, h], axis=1)


def test_normalize_images_matches_host(cfg, rng):
    u8 = rng.randint(0, 255, (2, 8, 8, 3)).astype(np.uint8)
    got = np.asarray(normalize_images(jnp.asarray(u8),
                                      cfg.bgr_means_array()))
    want = u8.astype(np.float32) - cfg.bgr_means_array()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_device_augment_matches_host_path(tmp_path_factory):
    """The fused on-device drift/flip/resize program must reproduce the
    host cv2 pipeline pixel-for-pixel (float rounding only) and return
    the identical GT tensors, given the SAME BatchPlan — the stream
    stays a deterministic function of the seed with only the pixel
    work moved on device."""
    from synth_kitti import make_synth_kitti

    from squeezedet_tpu.data import Kitti

    root = str(tmp_path_factory.mktemp("kitti_devaug"))
    make_synth_kitti(root, num_images=10, width=320, height=96,
                     image_set="train", seed=5)
    mcfg = tiny_test_config(image_width=256, image_height=80,
                            batch_size=6).replace(
        data_augmentation=True, drift_x=40, drift_y=20)
    db = Kitti("train", root, mcfg)

    # keep drawing until the batch exercises both flip states and a
    # negative and positive drift
    for _ in range(8):
        plan = db.draw_batch_plan(True)
        flips = {f for (_, f) in plan.augment}
        dxs = [d for ((d, _), _) in plan.augment]
        if flips == {True, False} and min(dxs) < 0 < max(dxs):
            break

    host_imgs, host_gt, host_lab, host_n = db.read_batch_raw_targets(
        plan=plan)
    canvas, aug, gt, lab, n = db.read_batch_canvas(plan=plan)

    got = np.asarray(augment_resize_normalize(
        jnp.asarray(canvas), jnp.asarray(aug), 80, 256,
        mcfg.bgr_means))
    assert np.abs(got - host_imgs).max() < 2.0
    assert np.abs(got - host_imgs).mean() < 0.1
    np.testing.assert_allclose(gt, host_gt, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(lab, host_lab)
    np.testing.assert_array_equal(n, host_n)


def test_plan_rows_match_canvas_reader(tmp_path_factory):
    """The device-resident dataset path (load_canvas_dataset +
    read_batch_plan_rows) must be a pure re-plumbing of the canvas
    reader: gathering the preloaded stack at the returned positions
    reproduces read_batch_canvas's pixel rows bit-for-bit, and the
    aug/GT rows are identical for the same BatchPlan."""
    from synth_kitti import make_synth_kitti

    from squeezedet_tpu.data import Kitti

    root = str(tmp_path_factory.mktemp("kitti_devds"))
    make_synth_kitti(root, num_images=9, width=320, height=96,
                     image_set="train", seed=11)
    mcfg = tiny_test_config(image_width=256, image_height=80,
                            batch_size=5).replace(
        data_augmentation=True, drift_x=40, drift_y=20)
    db = Kitti("train", root, mcfg)
    stack = db.load_canvas_dataset()
    assert stack.shape[0] == 9

    for _ in range(3):
        plan = db.draw_batch_plan(True)
        canvas, aug_c, gt_c, lab_c, n_c = db.read_batch_canvas(plan=plan)
        pos, aug, gt, lab, n = db.read_batch_plan_rows(plan=plan)
        np.testing.assert_array_equal(stack[pos], canvas)
        np.testing.assert_array_equal(aug, aug_c)
        np.testing.assert_allclose(gt, gt_c, rtol=1e-6)
        np.testing.assert_array_equal(lab, lab_c)
        np.testing.assert_array_equal(n, n_c)


def test_device_augment_canvas_padding_inert():
    """Garbage in the canvas beyond an image's real extent (batch
    padding for smaller-than-canvas images) must not leak into the
    output: a padded canvas and a tight canvas give identical
    results."""
    rng = np.random.RandomState(3)
    im = rng.randint(0, 255, (60, 100, 3)).astype(np.uint8)
    tight = im[None]
    padded = np.full((1, 96, 320, 3), 255, np.uint8)
    padded[0, :60, :100] = im
    # drift dx=-7, dy=4, flip on: ow' = 107, oh' = 56
    aug = np.array([[-7.0, 4.0, 1.0, 107.0, 56.0]], np.float32)
    means = (103.939, 116.779, 123.68)
    a = np.asarray(augment_resize_normalize(
        jnp.asarray(tight), jnp.asarray(aug), 48, 128, means))
    b = np.asarray(augment_resize_normalize(
        jnp.asarray(padded), jnp.asarray(aug), 48, 128, means))
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_device_assignment_matches_numpy(cfg, rng):
    anchors = np.asarray(cfg.anchor_box, np.float32)
    A = len(anchors)
    G = 8
    B = 3
    gt_all, labels_all, ngt_all = [], [], []
    for _ in range(B):
        n = rng.randint(1, G + 1)
        boxes = np.zeros((G, 4), np.float32)
        boxes[:n] = _random_gt(rng, n, cfg.image_width, cfg.image_height)
        labels = np.zeros((G,), np.int32)
        labels[:n] = rng.randint(0, 3, n)
        gt_all.append(boxes)
        labels_all.append(labels)
        ngt_all.append(n)

    tg = assign_anchors_device(
        jnp.asarray(anchors), jnp.asarray(np.stack(gt_all)),
        jnp.asarray(np.stack(labels_all)), jnp.asarray(np.array(ngt_all)),
        num_classes=3)

    # numpy reference path -> dense
    label_pb, delta_pb, aidx_pb, bbox_pb = [], [], [], []
    for b in range(B):
        n = ngt_all[b]
        aidx, deltas = assign_anchors(gt_all[b][:n].astype(np.float64),
                                      anchors.astype(np.float64))
        aidx_pb.append(aidx)
        delta_pb.append(deltas)
        label_pb.append(list(labels_all[b][:n]))
        bbox_pb.append(gt_all[b][:n])
    want = dense_targets_from_batch(label_pb, delta_pb, aidx_pb, bbox_pb,
                                    num_anchors=A, num_classes=3)

    np.testing.assert_array_equal(np.asarray(tg.input_mask),
                                  want.input_mask)
    np.testing.assert_allclose(np.asarray(tg.box_delta_input),
                               want.box_delta_input, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tg.box_input), want.box_input,
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(tg.labels), want.labels)


def test_device_assignment_distance_fallback(cfg):
    """Two identical degenerate boxes exercise claimed-mask + distance
    fallback."""
    anchors = jnp.asarray(np.asarray(cfg.anchor_box, np.float32))
    gt = np.zeros((1, 4, 4), np.float32)
    gt[0, 0] = [-300, -300, 1, 1]
    gt[0, 1] = [-300, -300, 1, 1]
    labels = np.zeros((1, 4), np.int32)
    tg = assign_anchors_device(anchors, jnp.asarray(gt),
                               jnp.asarray(labels),
                               jnp.asarray(np.array([2])), num_classes=3)
    assert float(np.asarray(tg.input_mask).sum()) == 2.0  # distinct anchors


def test_device_resize_close_to_cv2(rng):
    import cv2
    from squeezedet_tpu.data.device_pipeline import resize_images
    im = rng.randint(0, 255, (2, 375, 1242, 3)).astype(np.uint8)
    got = np.asarray(resize_images(jnp.asarray(im), 96, 320))
    for b in range(2):
        want = cv2.resize(im[b].astype(np.float32), (320, 96))
        # same half-pixel bilinear convention; float rounding only
        assert np.abs(got[b] - want).max() < 2.0
        assert np.abs(got[b] - want).mean() < 0.1


def test_predict_raw_resize_matches_host_path(cfg, rng):
    import cv2
    import jax
    from squeezedet_tpu.models import get_model
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    raw = rng.randint(0, 255, (1, 375, 1242, 3)).astype(np.uint8)
    # host path: -mean then cv2.resize (imdb.read_image_batch order)
    host_im = raw[0].astype(np.float32) - cfg.bgr_means_array()
    host_im = cv2.resize(host_im, (cfg.image_width, cfg.image_height))
    want = det.predict(params, jnp.asarray(host_im[None]))
    got = jax.jit(det.predict_raw_resize)(params, jnp.asarray(raw))
    np.testing.assert_allclose(np.asarray(got.det_probs),
                               np.asarray(want.det_probs), atol=0.05)


def test_shard_data_sampler_and_stack_layout(tmp_path_factory):
    """imdb.shard_data(D): the image list partitions into D strided
    shards; every batch is shard-major with slot group s drawing ONLY
    from shard s's padded row range (the invariant the mesh-sharded
    local gather relies on); the padded shard-major stack, the
    per-shard block loader and dataset_position all agree; and the
    sampler snapshot/restore replays the stream bit-exactly."""
    from synth_kitti import make_synth_kitti

    from squeezedet_tpu.data import Kitti

    root = str(tmp_path_factory.mktemp("kitti_shard"))
    make_synth_kitti(root, num_images=10, width=320, height=96,
                     image_set="train", seed=3)
    mcfg = tiny_test_config(image_width=256, image_height=80,
                            batch_size=4).replace(
        data_augmentation=True, drift_x=40, drift_y=20)
    db = Kitti("train", root, mcfg, rng=np.random.RandomState(5))
    db.shard_data(4)
    # 10 images -> strided shards of 3,3,2,2; padded stride 3
    assert db._shard_rows == 3
    stack = db.load_canvas_dataset()
    assert stack.shape[0] == 4 * 3

    # per-shard block loader returns exactly that block of the stack
    np.testing.assert_array_equal(
        db.load_canvas_shards([2, 3]), stack[6:12])

    for _ in range(5):
        plan = db.draw_batch_plan(True)
        pos, aug, gt, lab, n = db.read_batch_plan_rows(plan=plan)
        # slot s in shard s's padded row range
        for s in range(4):
            assert s * 3 <= pos[s] < s * 3 + len(db._data_shards[s])
        # gathering the stack reproduces the canvas reader bit-for-bit
        canvas, aug_c, gt_c, lab_c, n_c = db.read_batch_canvas(plan=plan)
        np.testing.assert_array_equal(stack[pos], canvas)
        np.testing.assert_array_equal(aug, aug_c)
        np.testing.assert_allclose(gt, gt_c, rtol=1e-6)

    # snapshot -> draw 3 -> restore (into a DIFFERENT-seeded imdb with
    # the same sharding) -> identical redraw
    state = db.sampler_state()
    want = [db.read_batch_plan_rows(plan=db.draw_batch_plan(True))
            for _ in range(3)]
    db2 = Kitti("train", root, mcfg, rng=np.random.RandomState(99))
    db2.shard_data(4)
    db2.set_sampler_state(state)
    got = [db2.read_batch_plan_rows(plan=db2.draw_batch_plan(True))
           for _ in range(3)]
    for a, b in zip(want, got):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(y, x)

    # re-shard guards: same count is an idempotent no-op (train() may
    # be re-entered on one imdb — resume flows) and must NOT reset the
    # live stream position; a different count raises
    before = db.sampler_state()
    db.shard_data(4)
    after = db.sampler_state()
    for k in before:
        np.testing.assert_array_equal(after[k], before[k])
    with pytest.raises(ValueError, match="already sharded"):
        db.shard_data(2)
    db3 = Kitti("train", root, mcfg.replace(batch_size=3),
                rng=np.random.RandomState(0))
    with pytest.raises(ValueError, match="divisible"):
        db3.shard_data(2)

    # restore guards, both directions: an UNSHARDED snapshot into a
    # sharded imdb (e.g. resuming a single-data-shard checkpoint on a
    # D>1 mesh) must raise, not silently mix fresh shard perms with the
    # checkpointed RNG; and a corrupted shard cursor must be rejected
    db4 = Kitti("train", root, mcfg, rng=np.random.RandomState(1))
    unsharded = db4.sampler_state()
    db5 = Kitti("train", root, mcfg, rng=np.random.RandomState(2))
    db5.shard_data(4)
    with pytest.raises(ValueError, match="state is unsharded"):
        db5.set_sampler_state(unsharded)
    bad = {k: np.array(v) for k, v in state.items()}
    bad["shard_cur"] = np.array([0, 0, 0, 99])
    with pytest.raises(ValueError, match="out of range"):
        db5.set_sampler_state(bad)
