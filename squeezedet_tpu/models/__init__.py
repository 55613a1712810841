"""Model registry + Detector facade.

The reference exposes four classes (``SqueezeDet``, ``SqueezeDetPlus``,
``VGG16ConvDet``, ``ResNet50ConvDet``, src/nets/__init__.py:1-4) that all
inherit ``ModelSkeleton``.  Here each backbone is a module with pure
``init``/``apply`` functions, and :class:`Detector` bundles a backbone
with the shared interpretation graph, loss and postprocessing so entry
points deal with one object.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.config import ModelConfig
from squeezedet_tpu.models import (resnet50, squeezedet, squeezedet_plus,
                                   vgg16)
from squeezedet_tpu.models import layers as L
from squeezedet_tpu.models.skeleton import (Interpretation, LossBreakdown,
                                            Targets, detection_loss,
                                            interpret)
from squeezedet_tpu.ops.nms import filter_prediction_np

_BACKBONES = {
    "squeezeDet": squeezedet,
    "squeezeDet+": squeezedet_plus,
    "vgg16": vgg16,
    "resnet50": resnet50,
}


def available_nets():
    return tuple(_BACKBONES)


@dataclass
class Detector:
    """A backbone + the shared ConvDet skeleton, as pure functions.

    Typical use::

        det = get_model('squeezeDet', cfg)
        params, mask, tracer = det.init(jax.random.key(0))
        interp = jax.jit(det.predict)(params, images)
        boxes, probs, classes = det.filter_prediction(
            np.asarray(interp.det_boxes[0]), ...)
    """

    cfg: ModelConfig
    backbone: Any
    net: str = ""  # reference net name ('squeezeDet', ...), set by get_model
    _anchors: jnp.ndarray = field(init=False, repr=False)

    def __post_init__(self):
        self._anchors = jnp.asarray(self.cfg.anchor_box, jnp.float32)

    # -- parameters ---------------------------------------------------------
    def init(self, rng, pretrained: Optional[dict] = None):
        """Returns (params, trainable_mask, tracer).

        With pretrained weights, every dropped entry is reported: layer
        constructors print the layers left at random init, and entries
        that matched no layer are listed afterwards (a silent drop here
        means a --net/naming mismatch, weak spot of the reference's
        importer, nn_skeleton.py:404-439).
        """
        if pretrained is None and self.cfg.load_pretrained_model and \
                self.cfg.pretrained_model_path:
            from squeezedet_tpu.checkpoint.importer import load_pretrained
            pretrained = load_pretrained(self.cfg.pretrained_model_path)
        if pretrained is not None:
            from squeezedet_tpu.checkpoint.importer import (TrackedWeights,
                                                            warn_unconsumed)
            pretrained = TrackedWeights(pretrained)
            result = self.backbone.init(rng, self.cfg,
                                        pretrained=pretrained)
            warn_unconsumed(pretrained)
            return result
        return self.backbone.init(rng, self.cfg, pretrained=pretrained)

    # -- forward ------------------------------------------------------------
    def forward(self, params, images, *, train: bool = False, rng=None):
        """Backbone + ConvDet head -> raw preds [B, H, W, APG*(C+5)]."""
        dtype = jnp.dtype(self.cfg.compute_dtype)
        images = images.astype(dtype)
        preds = self.backbone.apply(params, images, self.cfg, train=train,
                                    rng=rng)
        return preds.astype(jnp.float32)

    def interpret(self, preds) -> Interpretation:
        cfg = self.cfg
        return interpret(
            preds, self._anchors, num_classes=cfg.classes,
            anchor_per_grid=cfg.anchor_per_grid,
            image_width=cfg.image_width, image_height=cfg.image_height,
            exp_thresh=cfg.exp_thresh)

    def predict(self, params, images) -> Interpretation:
        """Inference graph: forward + interpretation (jit this)."""
        return self.interpret(self.forward(params, images, train=False))

    def predict_jit(self, params, images) -> Interpretation:
        """Cached-jit predict.  ``jax.jit(det.predict)`` builds a NEW
        wrapper per call (a bound method is a fresh object each access),
        so repeated callers would silently recompile every time —
        several seconds per summary step on TPU.  This caches one
        wrapper on the detector."""
        fn = getattr(self, "_predict_jit_fn", None)
        if fn is None:
            fn = jax.jit(self.predict)
            object.__setattr__(self, "_predict_jit_fn", fn)
        return fn(params, images)

    def activation_stats(self, params, images, sample: int = 65536):
        """Five-stat activation summary data per layer
        (nn_skeleton.py:736-755): {layer: {'sample', 'sparsity', 'mean',
        'max', 'min'}}.  Everything is reduced on device; 'sample' is a
        uniform-stride subsample (~``sample`` elements, at most 2x —
        the stride rounds down) for the host histogram writer, so the
        transfer stays small at any batch size.
        Also includes the decoded box coordinates ('det_boxes/<coord>'),
        which the reference instruments at nn_skeleton.py:203-233.
        """
        cache = getattr(self, "_act_stats_fns", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_act_stats_fns", cache)
        # keyed by the sample budget: the stride is baked into the
        # jitted program, so one cached fn per distinct `sample`
        fn = cache.get(sample)
        if fn is None:
            def build(params, images):
                dtype = jnp.dtype(self.cfg.compute_dtype)
                tape = {}
                preds = self.backbone.apply(
                    params, images.astype(dtype), self.cfg, train=False,
                    tape=tape)
                interp = self.interpret(preds.astype(jnp.float32))
                for i, coord in enumerate(("cx", "cy", "w", "h")):
                    tape["det_boxes/" + coord] = interp.det_boxes[..., i]
                out = {}
                for name, act in tape.items():
                    flat = act.reshape(-1).astype(jnp.float32)
                    stride = max(1, flat.shape[0] // sample)
                    out[name] = {
                        "sample": flat[::stride],
                        "sparsity": jnp.mean((flat == 0.0)
                                             .astype(jnp.float32)),
                        "mean": jnp.mean(flat),
                        "max": jnp.max(flat),
                        "min": jnp.min(flat),
                    }
                return out
            fn = jax.jit(build)
            cache[sample] = fn
        return jax.device_get(fn(params, images))

    # -- loss ---------------------------------------------------------------
    def loss(self, params, images, targets: Targets, rng=None,
             train: bool = True) -> LossBreakdown:
        cfg = self.cfg
        preds = self.forward(params, images, train=train, rng=rng)
        interp = self.interpret(preds)
        wd = L.weight_decay_loss(params, self._trainable_mask_cache(params),
                                 cfg.weight_decay)
        return detection_loss(
            interp, targets, num_anchors=cfg.anchors,
            loss_coef_class=cfg.loss_coef_class,
            loss_coef_conf_pos=cfg.loss_coef_conf_pos,
            loss_coef_conf_neg=cfg.loss_coef_conf_neg,
            loss_coef_bbox=cfg.loss_coef_bbox,
            epsilon=cfg.epsilon, weight_decay_term=wd)

    _mask_cache: Optional[dict] = field(default=None, repr=False)

    def _trainable_mask_cache(self, params):
        if self._mask_cache is None:
            # rebuild the mask structurally (cheap; init already returns it,
            # this path covers restored params)
            _, mask, _ = self.backbone.init(
                jax.random.key(0),
                self.cfg.replace(load_pretrained_model=False))
            object.__setattr__(self, "_mask_cache", mask)
        return self._mask_cache

    def set_trainable_mask(self, mask):
        object.__setattr__(self, "_mask_cache", mask)

    # -- postprocess ---------------------------------------------------------
    def filter_prediction(self, boxes, probs, cls_idx):
        """Host-side top-N + per-class NMS (nn_skeleton.py:696-734)."""
        cfg = self.cfg
        return filter_prediction_np(
            np.asarray(boxes), np.asarray(probs), np.asarray(cls_idx),
            classes=cfg.classes, top_n_detection=cfg.top_n_detection,
            prob_thresh=cfg.prob_thresh, nms_thresh=cfg.nms_thresh)

    def predict_raw(self, params, images_u8):
        """Serving path: uint8 BGR images -> Interpretation.

        Fuses the mean-subtraction (imdb.py:143-144) into the device
        program so only the 1-byte image ever crosses PCIe/HBM.
        """
        from squeezedet_tpu.data.device_pipeline import normalize_images
        dtype = jnp.dtype(self.cfg.compute_dtype)
        images = normalize_images(images_u8, self.cfg.bgr_means, dtype)
        return self.interpret(
            self.backbone.apply(params, images, self.cfg,
                                train=False).astype(jnp.float32))

    def predict_raw_resize(self, params, images_u8):
        """Serving path for native-resolution frames: uint8 BGR at any
        fixed [B, H0, W0, 3] -> on-device resize to the model resolution
        -> normalize -> Interpretation.  The caller rescales boxes back
        by (W0-?)/... exactly like eval.py:81-84 does with
        read_image_batch scales."""
        from squeezedet_tpu.data.device_pipeline import (normalize_images,
                                                         resize_images)
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        resized = resize_images(images_u8, cfg.image_height,
                                cfg.image_width)
        images = normalize_images(resized, cfg.bgr_means, dtype)
        return self.interpret(
            self.backbone.apply(params, images, cfg,
                                train=False).astype(jnp.float32))

    def postprocess_device(self, interp: Interpretation):
        """On-device top-K + per-class NMS with this model's thresholds.

        The single home for the filter_prediction_device plumbing —
        every consumer (predict_postprocessed, the serving/export
        paths, spatial inference, bench) routes through here so the
        threshold wiring cannot drift between copies.
        """
        from squeezedet_tpu.ops.postprocess import filter_prediction_device
        cfg = self.cfg
        return filter_prediction_device(
            interp.det_boxes, interp.det_probs, interp.det_class,
            top_n=cfg.top_n_detection, nms_thresh=cfg.nms_thresh,
            num_classes=cfg.classes, prob_thresh=cfg.prob_thresh)

    def predict_postprocessed(self, params, images):
        """Fully on-device inference: forward + decode + top-k + NMS.

        Returns fixed-shape (boxes [B,K,4], probs [B,K], classes [B,K],
        keep [B,K]) — the TPU-native replacement for the reference's
        numpy filter_prediction.
        """
        return self.postprocess_device(self.predict(params, images))

    def predict_raw_postprocessed(self, params, images_u8):
        """uint8 serving twin of :meth:`predict_postprocessed`."""
        return self.postprocess_device(self.predict_raw(params, images_u8))

    # -- int8 serving (quant.py) ---------------------------------------------
    def quantize(self, params, calib_batches_u8, start="",
                 percentile=None):
        """Post-training int8 quantization: calibrate activation ranges
        on uint8 batches, return the int8 parameter tree (quant.py).
        ``start`` names the first quantized layer (default: the
        measured-best boundary for this net); ``percentile`` switches
        calibration from abs-max to a saturating percentile clip."""
        from squeezedet_tpu.quant import quantize
        return quantize(self, params, calib_batches_u8, start=start,
                        percentile=percentile)

    def predict_quant(self, qparams, images_u8) -> Interpretation:
        """int8 serving path: uint8 BGR images -> Interpretation.

        ``qparams`` from :meth:`quantize`.  The backbone runs on the
        MXU's int8 path with int32 accumulation and int8 activations in
        HBM; in the default hybrid mode the input conv stays float (the
        quantized tree itself records the mode — quant.py).
        """
        from squeezedet_tpu.data.device_pipeline import normalize_images
        from squeezedet_tpu.quant import INPUT_SCALE_KEY, quantize_images
        if INPUT_SCALE_KEY in qparams:
            # the scale stored at quantize time — conv1's multipliers
            # baked exactly this value, so never re-derive it from a
            # (possibly different) config
            x = quantize_images(images_u8, self.cfg.bgr_means,
                                qparams[INPUT_SCALE_KEY])
        else:
            x = normalize_images(images_u8, self.cfg.bgr_means,
                                 jnp.dtype(self.cfg.compute_dtype))
        preds = self.backbone.apply(qparams, x, self.cfg, train=False)
        return self.interpret(preds.astype(jnp.float32))

    def predict_quant_postprocessed(self, qparams, images_u8):
        """int8 twin of :meth:`predict_raw_postprocessed` (full
        uint8 -> detections program, on-device NMS included)."""
        return self.postprocess_device(self.predict_quant(qparams,
                                                          images_u8))

    def predict_quant_normalized(self, qparams, images) -> Interpretation:
        """int8 twin of :meth:`predict` for already-normalized float
        images (the eval/host pipeline's format)."""
        from squeezedet_tpu.quant import (INPUT_SCALE_KEY,
                                          quantize_images_normalized)
        if INPUT_SCALE_KEY in qparams:
            x = quantize_images_normalized(images,
                                           qparams[INPUT_SCALE_KEY])
        else:
            x = images.astype(jnp.dtype(self.cfg.compute_dtype))
        preds = self.backbone.apply(qparams, x, self.cfg, train=False)
        return self.interpret(preds.astype(jnp.float32))


def get_model(net: str, cfg: Optional[ModelConfig] = None) -> Detector:
    """Look up a Detector by reference net name (train.py:111-133)."""
    if net not in _BACKBONES:
        raise ValueError(
            "Selected neural net architecture not supported: {}".format(net))
    if cfg is None:
        from squeezedet_tpu.config import config_for_net
        cfg = config_for_net(net)
    return Detector(cfg=cfg, backbone=_BACKBONES[net], net=net)
