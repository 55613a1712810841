"""Data-layer tests: KITTI loading, augmentation, anchor assignment,
dense targets, AP scorer."""

import os

import numpy as np
import pytest

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.data import Kitti, batch_to_dense_targets
from squeezedet_tpu.data.imdb import assign_anchors
from squeezedet_tpu.data.targets import dense_targets_from_batch
from squeezedet_tpu.ops.boxes import batch_iou, bbox_transform_inv
from synth_kitti import make_synth_kitti


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    make_synth_kitti(str(root), num_images=6, width=320, height=96)
    return str(root)


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config(image_width=320, image_height=96, batch_size=2)


def test_kitti_annotation_loading(kitti_root, cfg):
    db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    assert len(db.image_idx) == 6
    for idx in db.image_idx:
        rois = db._rois[idx]
        assert len(rois) >= 1
        for (cx, cy, w, h, cls) in rois:
            assert w > 0 and h > 0 and 0 <= cls < 3


def test_read_image_batch_shapes_and_scales(kitti_root, cfg):
    db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    images, scales = db.read_image_batch(shuffle=False)
    assert len(images) == cfg.batch_size
    assert images[0].shape == (cfg.image_height, cfg.image_width, 3)
    # synth images are already model-sized -> scale 1
    np.testing.assert_allclose(scales[0], (1.0, 1.0))


def test_read_batch_augmentation_keeps_boxes_inside(kitti_root, cfg):
    aug_cfg = cfg.replace(data_augmentation=True, drift_x=30, drift_y=20)
    db = Kitti("train", kitti_root, aug_cfg, rng=np.random.RandomState(1))
    for _ in range(5):
        imgs, labels, deltas, aidx, bboxes = db.read_batch()
        for gt in bboxes:
            assert (gt[:, 2] > 0).all() and (gt[:, 3] > 0).all()
            # centers must stay within image
            assert (gt[:, 0] >= 0).all()
            assert (gt[:, 0] <= aug_cfg.image_width).all()


def test_assign_anchors_greedy_unclaimed_semantics(cfg):
    anchors = np.asarray(cfg.anchor_box)
    # two identical gt boxes: second must get a different anchor
    gt = np.array([[100.0, 48.0, 40.0, 40.0],
                   [100.0, 48.0, 40.0, 40.0]])
    aidx, deltas = assign_anchors(gt, anchors)
    assert aidx[0] != aidx[1]
    # first one gets the argmax-IoU anchor
    best = int(np.argsort(batch_iou(anchors, gt[0]))[::-1][0])
    assert aidx[0] == best
    # delta encoding (imdb.py:228-233)
    a = anchors[aidx[0]]
    np.testing.assert_allclose(
        deltas[0],
        [(100 - a[0]) / a[2], (48 - a[1]) / a[3],
         np.log(40 / a[2]), np.log(40 / a[3])], rtol=1e-6)


def test_assign_anchors_distance_fallback(cfg):
    anchors = np.asarray(cfg.anchor_box)
    # a degenerate far-away box with zero IoU everywhere
    gt = np.array([[-500.0, -500.0, 1.0, 1.0]])
    aidx, _ = assign_anchors(gt, anchors)
    want = int(np.argsort(np.sum(np.square(gt[0] - anchors), axis=1))[0])
    assert aidx[0] == want


def test_dense_targets_first_claim_wins(cfg):
    tg, ndrop = dense_targets_from_batch(
        label_per_batch=[[0, 1]],
        delta_per_batch=[[[0.1] * 4, [0.9] * 4]],
        aidx_per_batch=[[7, 7]],  # same anchor claimed twice
        bbox_per_batch=[np.array([[1.0, 2, 3, 4], [5.0, 6, 7, 8]])],
        num_anchors=cfg.anchors, num_classes=cfg.classes,
        return_num_discarded=True)
    assert ndrop == 1
    assert tg.input_mask[0, 7] == 1.0 and tg.input_mask.sum() == 1.0
    np.testing.assert_allclose(tg.box_delta_input[0, 7], [0.1] * 4)
    assert tg.labels[0, 7, 0] == 1.0 and tg.labels[0, 7, 1] == 0.0


def test_batch_to_dense_targets_end_to_end(kitti_root, cfg):
    db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    batch = db.read_batch(shuffle=False)
    images, tg = batch_to_dense_targets(
        batch, num_anchors=cfg.anchors, num_classes=cfg.classes)
    assert images.shape == (cfg.batch_size, cfg.image_height,
                            cfg.image_width, 3)
    assert tg.input_mask.shape == (cfg.batch_size, cfg.anchors)
    assert tg.input_mask.sum() >= cfg.batch_size  # >= 1 object per image


def test_hard_example_exclusion(kitti_root):
    # write one occluded label; with exclude_hard_examples it disappears
    lbl = os.path.join(kitti_root, "training", "label_2", "000000.txt")
    with open(lbl) as f:
        orig = f.read()
    try:
        with open(lbl, "a") as f:
            f.write("Car 0.9 3 0.0 10.00 10.00 30.00 30.00 "
                    "1.5 1.6 3.7 0.0 1.7 10.0 0.0\n")
        cfg_ex = tiny_test_config(image_width=320, image_height=96).replace(
            exclude_hard_examples=True)
        cfg_in = cfg_ex.replace(exclude_hard_examples=False)
        n_ex = len(Kitti("train", kitti_root, cfg_ex)._rois["000000"])
        n_in = len(Kitti("train", kitti_root, cfg_in)._rois["000000"])
        assert n_in == n_ex + 1
    finally:
        with open(lbl, "w") as f:
            f.write(orig)


def test_augmentation_rng_call_order_parity(kitti_root, cfg):
    """All readers share _augment, so with identical seeds the dense
    path (read_batch) and the raw-targets path (read_batch_raw_targets)
    must draw the same dy, dx, flip sequence and produce identical
    scaled GT boxes and pixels."""
    aug_cfg = cfg.replace(data_augmentation=True, drift_x=30, drift_y=20)
    db_a = Kitti("train", kitti_root, aug_cfg, rng=np.random.RandomState(9))
    db_b = Kitti("train", kitti_root, aug_cfg, rng=np.random.RandomState(9))
    for _ in range(4):
        imgs, labels, _, _, bboxes = db_a.read_batch(shuffle=False)
        raw_imgs, gt, raw_labels, num_gt = db_b.read_batch_raw_targets(
            shuffle=False)
        for bi in range(len(imgs)):
            n = int(num_gt[bi])
            assert n == len(bboxes[bi])
            np.testing.assert_allclose(gt[bi, :n], bboxes[bi], rtol=1e-6)
            np.testing.assert_array_equal(
                raw_labels[bi, :n], np.asarray(labels[bi], np.int32))
            np.testing.assert_allclose(raw_imgs[bi], imgs[bi], atol=1e-5)


def test_uint8_ingest_parity(kitti_root, cfg):
    """read_batch_raw_targets(uint8_images=True) keeps pixels uint8 on
    the host; after the on-device normalize (u8 - means) it must match
    the f32 path within resize-rounding tolerance, with identical
    geometry (same RNG stream through _augment)."""
    aug_cfg = cfg.replace(data_augmentation=True, drift_x=30, drift_y=20)
    db_f = Kitti("train", kitti_root, aug_cfg, rng=np.random.RandomState(3))
    db_u = Kitti("train", kitti_root, aug_cfg, rng=np.random.RandomState(3))
    means = aug_cfg.bgr_means_array()
    for _ in range(3):
        imgs_f, gt_f, labels_f, n_f = db_f.read_batch_raw_targets(
            shuffle=False)
        imgs_u, gt_u, labels_u, n_u = db_u.read_batch_raw_targets(
            shuffle=False, uint8_images=True)
        assert imgs_u.dtype == np.uint8
        np.testing.assert_array_equal(n_f, n_u)
        np.testing.assert_allclose(gt_f, gt_u, rtol=1e-6)
        np.testing.assert_array_equal(labels_f, labels_u)
        normalized = imgs_u.astype(np.float32) - means
        # resize on uint8 rounds each pixel; drift padding differs by
        # the fractional part of the means (<= 0.5) — both below bf16
        # resolution at this magnitude
        assert np.max(np.abs(normalized - imgs_f)) <= 1.0 + 0.5


def test_shard_hosts_disjoint_cover(kitti_root, cfg):
    """Multi-host data sharding: strided per-process shards are disjoint
    and cover the image list."""
    from squeezedet_tpu.data import Kitti
    full = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    all_idx = list(full.image_idx)
    shards = []
    for p in range(2):
        db = Kitti("train", kitti_root, cfg,
                   rng=np.random.RandomState(p))
        db.shard_hosts(p, 2)
        shards.append(list(db.image_idx))
    assert not set(shards[0]) & set(shards[1])
    assert sorted(shards[0] + shards[1]) == sorted(all_idx)
    # more processes than images must fail loudly, not feed nothing
    tiny = Kitti("train", kitti_root, cfg,
                 rng=np.random.RandomState(0))
    with pytest.raises(AssertionError):
        tiny.shard_hosts(len(all_idx), len(all_idx) + 1)


def test_shard_hosts_canvas_agreement(tmp_path, cfg):
    """canvas_size() must agree across host shards even when a shard
    lacks the tallest/widest image: every multihost controller builds
    one slice of the same global canvas array, so it is pinned to the
    FULL image list before sharding."""
    from squeezedet_tpu.data import Kitti
    root = str(tmp_path / "kitti")
    # three small images, then one larger one at strided position 3:
    # shard [0::2] = {0, 2} never sees the 128x352 frame
    make_synth_kitti(root, num_images=3, width=320, height=96, seed=0)
    make_synth_kitti(root, num_images=1, width=352, height=128, seed=1,
                     start_index=3)
    sets = os.path.join(root, "ImageSets", "train.txt")
    with open(sets, "w") as f:
        f.write("\n".join("{:06d}".format(i) for i in range(4)) + "\n")

    sizes = []
    for p in range(2):
        db = Kitti("train", root, cfg, rng=np.random.RandomState(p))
        db.shard_hosts(p, 2)
        sizes.append(db.canvas_size())
    assert sizes[0] == sizes[1] == (128, 352)


def test_image_cache_parity_and_bound(kitti_root, cfg):
    """The decoded-image LRU returns byte-identical batches, actually
    skips the re-decode (overwriting the file doesn't change cached
    reads), and evicts down to its byte budget."""
    seed = 7
    cold = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(seed))
    hot_cfg = cfg.replace(image_cache_mb=64)
    hot = Kitti("train", kitti_root, hot_cfg,
                rng=np.random.RandomState(seed))
    for _ in range(3):  # second pass over 6 images at batch 2 hits cache
        a = cold.read_batch(shuffle=True)
        b = hot.read_batch(shuffle=True)
        np.testing.assert_array_equal(a[0], b[0])
        for xa, xb in zip(a[1], b[1]):
            assert list(xa) == list(xb)
    a = cold.read_batch(shuffle=True)
    b = hot.read_batch(shuffle=True)
    np.testing.assert_array_equal(a[0], b[0])

    # cached decode is served from RAM: truncating the PNG on disk must
    # not affect reads of an already-cached index
    idx = hot.image_idx[0]
    im1 = hot._imread(idx)
    assert not im1.flags.writeable
    path = hot._image_path_at(idx)
    orig = open(path, "rb").read()
    try:
        open(path, "wb").write(b"not a png")
        im2 = hot._imread(idx)
        np.testing.assert_array_equal(np.asarray(im1), np.asarray(im2))
    finally:
        open(path, "wb").write(orig)

    # LRU bound: budget of ~2 images keeps the cache under budget
    one = np.asarray(im1).nbytes
    small = Kitti("train", kitti_root,
                  cfg.replace(image_cache_mb=max(1, (2 * one) >> 20)),
                  rng=np.random.RandomState(seed))
    for idx in small.image_idx:
        small._imread(idx)
    assert small._image_cache_bytes <= small.mc.image_cache_mb << 20
    assert len(small._image_cache) >= 1


def test_batch_larger_than_dataset_fails_loudly(kitti_root, cfg):
    """The shuffled epoch window is a straight permutation slice, so a
    batch bigger than the image list would silently come back short and
    retrace every jitted program — it must raise instead."""
    db = Kitti("train", kitti_root, cfg.replace(batch_size=7),
               rng=np.random.RandomState(0))
    with pytest.raises(ValueError, match="exceeds"):
        db.read_batch(shuffle=True)
    # the sequential (eval) path wraps around and stays legal
    images, _ = db.read_image_batch(shuffle=False)
    assert len(images) == 7
