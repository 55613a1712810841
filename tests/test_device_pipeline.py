"""On-device pipeline parity vs the host numpy reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.data.device_pipeline import (assign_anchors_device,
                                                 normalize_images,
                                                 random_flip)
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


def test_random_flip_updates_boxes(cfg):
    imgs = jnp.asarray(np.arange(2 * 4 * 6 * 1, dtype=np.float32)
                       .reshape(2, 4, 6, 1))
    boxes = jnp.asarray(np.array([[[1.0, 2.0, 2.0, 2.0]],
                                  [[1.0, 2.0, 2.0, 2.0]]]))
    # find an rng where exactly one image flips
    for seed in range(20):
        out, b = random_flip(imgs, boxes, jax.random.key(seed))
        flipped = [not np.allclose(np.asarray(out[i]), np.asarray(imgs[i]))
                   for i in range(2)]
        if flipped[0] != flipped[1]:
            break
    else:
        pytest.fail("no asymmetric flip found")
    i_flip = flipped.index(True)
    i_keep = flipped.index(False)
    np.testing.assert_allclose(np.asarray(out[i_flip]),
                               np.asarray(imgs[i_flip])[:, ::-1, :])
    # cx' = (W-1) - cx = 5 - 1 = 4 for the flipped image only
    assert float(b[i_flip, 0, 0]) == 4.0
    assert float(b[i_keep, 0, 0]) == 1.0


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
