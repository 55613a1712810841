"""ResNet50 (conv1..conv4_x) + ConvDet backbone
(reference src/nets/resnet50_convDet.py).

conv1 7x7/s2 conv+BN frozen with bias; res2a-c and res3a-d frozen;
res4a-f trainable; no conv5_x; dropout; ConvDet head 'conv5'
(resnet50_convDet.py:41-132).  BatchNorm uses frozen statistics, applied
as an affine transform (nn_skeleton.py:374-449).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from squeezedet_tpu.models import layers as L

# (stage, blocks, in_filters, out_filters, frozen)
_STAGES = [
    ("2", ["a", "b", "c"], 64, 256, True),
    ("3", ["a", "b", "c", "d"], 128, 512, True),
    ("4", ["a", "b", "c", "d", "e", "f"], 256, 1024, False),
]


def _bn_names(tag: str):
    return "bn" + tag, "scale" + tag


def _init_branch(key, tracer, stage: str, block: str, in_f: int, out_f: int,
                 down_sample: bool, freeze: bool, pretrained,
                 xavier: bool = False):
    """Bottleneck branch2: 1x1 -> 3x3 -> 1x1 (resnet50_convDet.py:134-169)."""
    k1, k2, k3 = jax.random.split(key, 3)
    tag = stage + block
    stride = 2 if down_sample else 1
    p, m = {}, {}
    for sub, kk, (f, size, st, relu) in zip(
            ("branch2a", "branch2b", "branch2c"), (k1, k2, k3),
            ((in_f, 1, stride, True), (in_f, 3, 1, True),
             (out_f, 1, 1, False))):
        conv_name = "res{}_{}".format(tag, sub)
        bn_name, scale_name = _bn_names("{}_{}".format(tag, sub))
        p[sub], m[sub] = L.init_conv_bn(
            kk, tracer, conv_name, f, size, st, freeze=freeze, relu=relu,
            xavier=xavier, bn_name=bn_name, scale_name=scale_name,
            pretrained=pretrained)
    return p, m


def _apply_branch(p, x, down_sample: bool, eps: float, tape=None,
                  name: str = ""):
    stride = 2 if down_sample else 1
    y = L.conv_bn(p["branch2a"], x, stride, eps=eps)
    L.record(tape, name + "_branch2a", y)
    y = L.conv_bn(p["branch2b"], y, 1, eps=eps)
    L.record(tape, name + "_branch2b", y)
    return L.conv_bn(p["branch2c"], y, 1, relu=False, eps=eps)


def init(rng, cfg, pretrained=None):
    tracer = L.NetTracer.for_config(cfg)
    n_blocks = sum(len(blocks) for _, blocks, _, _, _ in _STAGES)
    keys = jax.random.split(rng, n_blocks + 5)
    ki = iter(range(len(keys)))
    params, mask = {}, {}
    xavier = pretrained is None and cfg.scratch_init == "xavier"

    params["conv1"], mask["conv1"] = L.init_conv_bn(
        keys[next(ki)], tracer, "conv1", 64, 7, 2, freeze=True,
        conv_with_bias=True, xavier=xavier, bn_name="bn_conv1",
        scale_name="scale_conv1", pretrained=pretrained)
    tracer.pool("pool1", 3, 2, "VALID")

    for stage, blocks, in_f, out_f, frozen in _STAGES:
        for block in blocks:
            name = "res{}{}".format(stage, block)
            entry, entry_m = {}, {}
            if block == "a":
                down = stage != "2"
                snap = tracer.snapshot()
                tag = stage + "a"
                bn_name, scale_name = _bn_names(tag + "_branch1")
                entry["branch1"], entry_m["branch1"] = L.init_conv_bn(
                    keys[next(ki)], tracer, "res{}_branch1".format(tag),
                    out_f, 1, 2 if down else 1, freeze=frozen, relu=False,
                    xavier=xavier, bn_name=bn_name, scale_name=scale_name,
                    pretrained=pretrained)
                tracer.restore(snap)
            else:
                down = False
            entry["branch2"], entry_m["branch2"] = _init_branch(
                keys[next(ki)], tracer, stage, block, in_f, out_f, down,
                frozen, pretrained, xavier=xavier)
            params[name], mask[name] = entry, entry_m

    num_output = cfg.anchor_per_grid * (cfg.classes + 1 + 4)
    params["conv5"], mask["conv5"] = L.init_conv(
        keys[next(ki)], tracer, "conv5", num_output, 3, 1, padding="SAME",
        xavier=False, relu=False, stddev=0.0001, pretrained=pretrained)
    return params, mask, tracer


def apply(params, images, cfg, *, train: bool = False, rng=None,
          tape=None):
    eps = cfg.batch_norm_epsilon
    x = L.conv_bn(params["conv1"], images, 2, eps=eps)
    L.record(tape, "conv1", x)
    x = L.max_pool(x, 3, 2, "VALID")

    for stage, blocks, _, _, _ in _STAGES:
        for block in blocks:
            name = "res{}{}".format(stage, block)
            p = params[name]
            if block == "a":
                down = stage != "2"
                shortcut = L.conv_bn(p["branch1"], x, 2 if down else 1,
                                     relu=False, eps=eps)
            else:
                down = False
                shortcut = x
                if "shortcut_scale" in p:
                    # int8 mode: the identity shortcut is int8; the
                    # residual join runs in f32 (quant.py)
                    shortcut = shortcut.astype(jnp.float32) * \
                        p["shortcut_scale"]
            x = jnp.maximum(shortcut + _apply_branch(
                p["branch2"], x, down, eps, tape=tape, name="res" +
                stage + block), 0)
            if "out_scale" in p:
                # int8 mode: re-quantize the merged block output
                x = L.quantize_activation(x, p["out_scale"])
            L.record(tape, name, x)

    x = L.dropout(x, cfg.keep_prob, rng, train)
    out = L.conv2d(params["conv5"], x, 1, relu=False)
    L.record(tape, "conv5", out)
    return out
