"""VGG16 + ConvDet backbone (reference src/nets/vgg16_convDet.py).

conv1_1..conv5_3 (conv1/conv2 blocks frozen, vgg16_convDet.py:42-53),
four 2x2 stride-2 maxpools, dropout, ConvDet head 'conv6'
(vgg16_convDet.py:87-90).  Overall stride 16.
"""

from __future__ import annotations

import jax

from squeezedet_tpu.models import layers as L

# (name, filters, frozen) per conv; pools follow blocks 1-4.
_CONVS = [
    ("conv1_1", 64, True), ("conv1_2", 64, True),
    ("conv2_1", 128, True), ("conv2_2", 128, True),
    ("conv3_1", 256, False), ("conv3_2", 256, False), ("conv3_3", 256, False),
    ("conv4_1", 512, False), ("conv4_2", 512, False), ("conv4_3", 512, False),
    ("conv5_1", 512, False), ("conv5_2", 512, False), ("conv5_3", 512, False),
]
_POOL_AFTER = {"conv1_2": "pool1", "conv2_2": "pool2",
               "conv3_3": "pool3", "conv4_3": "pool4"}


def init(rng, cfg, pretrained=None):
    tracer = L.NetTracer.for_config(cfg)
    keys = jax.random.split(rng, len(_CONVS) + 1)
    params, mask = {}, {}
    xavier = pretrained is None and cfg.scratch_init == "xavier"
    for i, (name, filters, frozen) in enumerate(_CONVS):
        params[name], mask[name] = L.init_conv(
            keys[i], tracer, name, filters, 3, 1, freeze=frozen,
            xavier=xavier, pretrained=pretrained)
        if name in _POOL_AFTER:
            tracer.pool(_POOL_AFTER[name], 2, 2, "SAME")

    num_output = cfg.anchor_per_grid * (cfg.classes + 1 + 4)
    params["conv6"], mask["conv6"] = L.init_conv(
        keys[-1], tracer, "conv6", num_output, 3, 1, padding="SAME",
        xavier=False, relu=False, stddev=0.0001, pretrained=pretrained)
    return params, mask, tracer


def apply(params, images, cfg, *, train: bool = False, rng=None,
          tape=None):
    x = images
    for name, _, _ in _CONVS:
        x = L.conv2d(params[name], x, 1)
        L.record(tape, name, x)
        if name in _POOL_AFTER:
            x = L.max_pool(x, 2, 2, "SAME")
    x = L.dropout(x, cfg.keep_prob, rng, train)
    out = L.conv2d(params["conv6"], x, 1, relu=False)
    L.record(tape, "conv6", out)
    return out
