"""Loss-graph parity (nn_skeleton.py:285-327)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.models import get_model
from squeezedet_tpu.models.skeleton import (Targets, detection_loss,
                                            interpret)


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


def _make_inputs(cfg, rng, num_objects=3):
    B, A, C = cfg.batch_size, cfg.anchors, cfg.classes
    preds = rng.randn(B, cfg.grid_h, cfg.grid_w,
                      cfg.head_channels).astype(np.float32) * 0.1
    mask = np.zeros((B, A), np.float32)
    labels = np.zeros((B, A, C), np.float32)
    deltas = np.zeros((B, A, 4), np.float32)
    gt = np.zeros((B, A, 4), np.float32)
    for b in range(B):
        picks = rng.choice(A, num_objects, replace=False)
        for a in picks:
            mask[b, a] = 1.0
            labels[b, a, rng.randint(C)] = 1.0
            deltas[b, a] = rng.randn(4) * 0.1
            gt[b, a] = [40 + rng.rand() * 10, 40 + rng.rand() * 10,
                        20 + rng.rand() * 10, 20 + rng.rand() * 10]
    return preds, Targets(jnp.asarray(mask), jnp.asarray(deltas),
                          jnp.asarray(gt), jnp.asarray(labels))


def _np_loss(cfg, preds, tg):
    """Numpy oracle transcribing nn_skeleton.py:285-327."""
    B, A, C = preds.shape[0], cfg.anchors, cfg.classes
    eps = cfg.epsilon
    ncp = cfg.anchor_per_grid * C
    logits = preds[..., :ncp].reshape(-1, C)
    e = np.exp(logits - logits.max(1, keepdims=True))
    p = (e / e.sum(1, keepdims=True)).reshape(B, A, C)
    conf = 1 / (1 + np.exp(-preds[..., ncp:ncp + cfg.anchor_per_grid]
                           .reshape(B, A)))
    delta = preds[..., ncp + cfg.anchor_per_grid:].reshape(B, A, 4)

    mask = np.asarray(tg.input_mask)
    labels = np.asarray(tg.labels)
    nobj = mask.sum()

    class_loss = ((labels * -np.log(p + eps) +
                   (1 - labels) * -np.log(1 - p + eps))
                  * mask[..., None] * cfg.loss_coef_class).sum() / nobj

    # decode boxes same as interpretation graph
    from squeezedet_tpu.ops.boxes import safe_exp_np
    anchors = cfg.anchor_box.astype(np.float32)
    ax, ay, aw, ah = anchors.T
    cx = ax + delta[..., 0] * aw
    cy = ay + delta[..., 1] * ah
    w = aw * safe_exp_np(delta[..., 2], cfg.exp_thresh)
    h = ah * safe_exp_np(delta[..., 3], cfg.exp_thresh)
    x1, y1, x2, y2 = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
    x1 = np.clip(x1, 0, cfg.image_width - 1.0)
    y1 = np.clip(y1, 0, cfg.image_height - 1.0)
    x2 = np.clip(x2, 0, cfg.image_width - 1.0)
    y2 = np.clip(y2, 0, cfg.image_height - 1.0)
    bw, bh = x2 - x1 + 1.0, y2 - y1 + 1.0
    det = np.stack([x1 + bw / 2, y1 + bh / 2, bw, bh], -1)

    gt = np.asarray(tg.box_input)

    def corners(bx):
        return (bx[..., 0] - bx[..., 2] / 2, bx[..., 1] - bx[..., 3] / 2,
                bx[..., 0] + bx[..., 2] / 2, bx[..., 1] + bx[..., 3] / 2)

    d1, g1 = corners(det), corners(gt)
    ix = np.maximum(0, np.minimum(d1[2], g1[2]) - np.maximum(d1[0], g1[0]))
    iy = np.maximum(0, np.minimum(d1[3], g1[3]) - np.maximum(d1[1], g1[1]))
    inter = ix * iy
    union = ((d1[2] - d1[0]) * (d1[3] - d1[1])
             + (g1[2] - g1[0]) * (g1[3] - g1[1]) - inter)
    ious = inter / (union + eps) * mask

    cw = (mask * cfg.loss_coef_conf_pos / nobj
          + (1 - mask) * cfg.loss_coef_conf_neg / (A - nobj))
    conf_loss = (np.square(ious - conf) * cw).sum(1).mean()

    bbox_loss = (cfg.loss_coef_bbox * np.square(
        mask[..., None] * (delta - np.asarray(tg.box_delta_input)))).sum() \
        / nobj
    return class_loss, conf_loss, bbox_loss


def test_loss_matches_numpy_oracle(cfg, rng):
    preds, tg = _make_inputs(cfg, rng)
    interp = interpret(jnp.asarray(preds),
                       jnp.asarray(cfg.anchor_box, jnp.float32),
                       num_classes=cfg.classes,
                       anchor_per_grid=cfg.anchor_per_grid,
                       image_width=cfg.image_width,
                       image_height=cfg.image_height,
                       exp_thresh=cfg.exp_thresh)
    got = detection_loss(
        interp, tg, num_anchors=cfg.anchors,
        loss_coef_class=cfg.loss_coef_class,
        loss_coef_conf_pos=cfg.loss_coef_conf_pos,
        loss_coef_conf_neg=cfg.loss_coef_conf_neg,
        loss_coef_bbox=cfg.loss_coef_bbox, epsilon=cfg.epsilon)
    want = _np_loss(cfg, preds, tg)
    np.testing.assert_allclose(float(got.class_loss), want[0], rtol=1e-4)
    np.testing.assert_allclose(float(got.conf_loss), want[1], rtol=1e-4)
    np.testing.assert_allclose(float(got.bbox_loss), want[2], rtol=1e-4)
    np.testing.assert_allclose(
        float(got.total), sum(want), rtol=1e-4)


def test_conf_pos_weight_scales_inversely_with_batch(cfg, rng):
    """Reference semantics worth knowing before scaling the batch: the
    conf loss normalizes its POSITIVE term by the batch-total object
    count and then means over the batch (nn_skeleton.py:302-314), so
    duplicating the batch HALVES the positive-confidence contribution
    while class/bbox (per-object sums / total objects) and the
    negative conf term are batch-invariant.  Large-batch recipes must
    therefore scale LOSS_COEF_CONF_POS linearly with batch size
    (--loss_coef_conf_pos; PARITY.md large-batch recipe) or the conf
    head trains batch/20x slower than the rest of the loss."""
    preds, tg = _make_inputs(cfg, rng)

    def loss(preds_np, tg_in, conf_neg=0.0):
        interp = interpret(jnp.asarray(preds_np),
                           jnp.asarray(cfg.anchor_box, jnp.float32),
                           num_classes=cfg.classes,
                           anchor_per_grid=cfg.anchor_per_grid,
                           image_width=cfg.image_width,
                           image_height=cfg.image_height,
                           exp_thresh=cfg.exp_thresh)
        return detection_loss(
            interp, tg_in, num_anchors=cfg.anchors,
            loss_coef_class=cfg.loss_coef_class,
            loss_coef_conf_pos=cfg.loss_coef_conf_pos,
            loss_coef_conf_neg=conf_neg,
            loss_coef_bbox=cfg.loss_coef_bbox, epsilon=cfg.epsilon)

    dup = lambda x: jnp.concatenate([x, x], axis=0)
    lb1 = loss(preds, tg)  # conf_neg=0 isolates the positive term
    lb2 = loss(np.concatenate([preds, preds]), Targets(*map(dup, tg)))
    np.testing.assert_allclose(float(lb2.class_loss),
                               float(lb1.class_loss), rtol=1e-5)
    np.testing.assert_allclose(float(lb2.bbox_loss),
                               float(lb1.bbox_loss), rtol=1e-5)
    np.testing.assert_allclose(float(lb2.conf_loss),
                               float(lb1.conf_loss) / 2.0, rtol=1e-4)
    # doubling the coefficient restores the duplicated batch's conf term
    cfg2x = cfg.replace(loss_coef_conf_pos=cfg.loss_coef_conf_pos * 2)
    interp2 = interpret(jnp.asarray(np.concatenate([preds, preds])),
                        jnp.asarray(cfg.anchor_box, jnp.float32),
                        num_classes=cfg.classes,
                        anchor_per_grid=cfg.anchor_per_grid,
                        image_width=cfg.image_width,
                        image_height=cfg.image_height,
                        exp_thresh=cfg.exp_thresh)
    lb2x = detection_loss(
        interp2, Targets(*map(dup, tg)), num_anchors=cfg.anchors,
        loss_coef_class=cfg.loss_coef_class,
        loss_coef_conf_pos=cfg2x.loss_coef_conf_pos,
        loss_coef_conf_neg=0.0,
        loss_coef_bbox=cfg.loss_coef_bbox, epsilon=cfg.epsilon)
    np.testing.assert_allclose(float(lb2x.conf_loss),
                               float(lb1.conf_loss), rtol=1e-4)


def test_conf_target_is_stop_gradient(cfg, rng):
    """The IoU conf target must not backprop into the box path — in the
    reference it flows through a non-trainable Variable assign
    (nn_skeleton.py:100-103,263)."""
    preds, tg = _make_inputs(cfg, rng)

    def conf_loss_of_delta_channels(preds_arr):
        interp = interpret(preds_arr,
                           jnp.asarray(cfg.anchor_box, jnp.float32),
                           num_classes=cfg.classes,
                           anchor_per_grid=cfg.anchor_per_grid,
                           image_width=cfg.image_width,
                           image_height=cfg.image_height)
        lb = detection_loss(
            interp, tg, num_anchors=cfg.anchors,
            loss_coef_class=cfg.loss_coef_class,
            loss_coef_conf_pos=cfg.loss_coef_conf_pos,
            loss_coef_conf_neg=cfg.loss_coef_conf_neg,
            loss_coef_bbox=0.0, epsilon=cfg.epsilon)
        return lb.conf_loss

    g = jax.grad(conf_loss_of_delta_channels)(jnp.asarray(preds))
    ncp = cfg.anchor_per_grid * cfg.classes
    delta_grads = np.asarray(g[..., ncp + cfg.anchor_per_grid:])
    np.testing.assert_allclose(delta_grads, 0.0, atol=1e-8)


def test_detector_loss_includes_weight_decay(cfg, rng):
    det = get_model("squeezeDet", cfg)
    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    preds, tg = _make_inputs(cfg, rng)
    imgs = jnp.zeros((cfg.batch_size, cfg.image_height, cfg.image_width, 3))
    lb = det.loss(params, imgs, tg, rng=jax.random.key(1))
    lb_parts = float(lb.class_loss + lb.conf_loss + lb.bbox_loss)
    assert float(lb.total) > lb_parts  # weight decay strictly positive


def test_frozen_layers_have_no_trainable_mask(cfg):
    det = get_model("squeezeDet", cfg)
    _, mask, _ = det.init(jax.random.key(0))
    assert mask["conv1"] == {"kernel": False, "bias": False}
    assert mask["fire2"]["squeeze1x1"]["kernel"] is True
    assert mask["conv12"]["kernel"] is True


def test_class_loss_stable_at_softmax_saturation(cfg):
    """Saturated class logits (p -> 1.0 at a wrong class) must give
    finite loss AND finite gradients.  The reference's literal
    -log(1-p+eps) formula explodes here (1e16-scale cancelling
    intermediates); the log-space formulation is bounded."""
    B, A, C = 1, cfg.anchors, cfg.classes
    preds = np.zeros((B, cfg.grid_h, cfg.grid_w, cfg.head_channels),
                     np.float32)
    # saturate anchor 0's class 2 logit; label says class 0
    preds[0, 0, 0, 2] = 80.0
    mask = np.zeros((B, A), np.float32)
    mask[0, 0] = 1.0
    labels = np.zeros((B, A, C), np.float32)
    labels[0, 0, 0] = 1.0
    tg = Targets(jnp.asarray(mask), jnp.zeros((B, A, 4)),
                 jnp.asarray(np.full((B, A, 4), 30.0, np.float32)),
                 jnp.asarray(labels))

    def loss_of(preds_arr):
        interp = interpret(preds_arr,
                           jnp.asarray(cfg.anchor_box, jnp.float32),
                           num_classes=C,
                           anchor_per_grid=cfg.anchor_per_grid,
                           image_width=cfg.image_width,
                           image_height=cfg.image_height)
        return detection_loss(
            interp, tg, num_anchors=A,
            loss_coef_class=cfg.loss_coef_class,
            loss_coef_conf_pos=cfg.loss_coef_conf_pos,
            loss_coef_conf_neg=cfg.loss_coef_conf_neg,
            loss_coef_bbox=cfg.loss_coef_bbox,
            epsilon=cfg.epsilon).total

    loss = loss_of(jnp.asarray(preds))
    assert np.isfinite(float(loss))
    # the saturated wrong class costs ~ -log(eps) = 36.8 like the
    # reference's eps floor
    g = jax.grad(loss_of)(jnp.asarray(preds))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() < 1e4


def test_all_background_batch_yields_finite_loss(cfg, rng):
    """Every image num_gt=0 (reachable through the padded device
    pipeline, unlike the reference's host loader): losses must stay
    finite — zero class/bbox terms, pure-negative conf term — instead
    of NaN-poisoning the params."""
    from squeezedet_tpu.data.device_pipeline import assign_anchors_device
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    B, G = cfg.batch_size, 4
    anchors = jnp.asarray(cfg.anchor_box, jnp.float32)
    targets = assign_anchors_device(
        anchors, jnp.zeros((B, G, 4)), jnp.zeros((B, G), jnp.int32),
        jnp.zeros((B,), jnp.int32), cfg.classes)
    images = jnp.asarray(rng.randn(B, cfg.image_height, cfg.image_width,
                                   3).astype(np.float32))
    lb = jax.jit(lambda p, im, tg: det.loss(p, im, tg, train=False))(
        params, images, targets)
    for leaf in [lb.total, lb.class_loss, lb.conf_loss, lb.bbox_loss]:
        assert np.isfinite(float(leaf)), lb
    assert float(lb.class_loss) == 0.0
    assert float(lb.bbox_loss) == 0.0
