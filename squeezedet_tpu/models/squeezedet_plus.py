"""SqueezeDet+ backbone (reference src/nets/squeezeDetPlus.py).

Wider variant: conv1 96f 7x7 s2 VALID frozen; fire2..4, pool4; fire5..8,
pool8; fire9..11; same ConvDet head (squeezeDetPlus.py:40-79).  Pools are
3x3 stride-2 VALID.
"""

from __future__ import annotations

import jax

from squeezedet_tpu.models import layers as L

_FIRES = [
    ("fire2", 96, 64, 64), ("fire3", 96, 64, 64),
    ("fire4", 192, 128, 128), ("fire5", 192, 128, 128),
    ("fire6", 288, 192, 192), ("fire7", 288, 192, 192),
    ("fire8", 384, 256, 256), ("fire9", 384, 256, 256),
    ("fire10", 384, 256, 256), ("fire11", 384, 256, 256),
]
_POOL_AFTER = {"fire4": "pool4", "fire8": "pool8"}


def init(rng, cfg, pretrained=None):
    tracer = L.NetTracer.for_config(cfg)
    keys = jax.random.split(rng, len(_FIRES) + 2)
    params, mask = {}, {}
    # xavier from scratch so activations survive the deep fire chain
    # (reference stddevs assume pretrained weights; see ModelConfig)
    xavier = pretrained is None and cfg.scratch_init == "xavier"

    params["conv1"], mask["conv1"] = L.init_conv(
        keys[0], tracer, "conv1", 96, 7, 2, padding="VALID", freeze=True,
        xavier=xavier, pretrained=pretrained)
    tracer.pool("pool1", 3, 2, "VALID")

    for i, (name, s, e1, e3) in enumerate(_FIRES):
        params[name], mask[name] = L.init_fire(
            keys[i + 1], tracer, name, s, e1, e3, xavier=xavier,
            pretrained=pretrained)
        if name in _POOL_AFTER:
            tracer.pool(_POOL_AFTER[name], 3, 2, "VALID")

    num_output = cfg.anchor_per_grid * (cfg.classes + 1 + 4)
    params["conv12"], mask["conv12"] = L.init_conv(
        keys[-1], tracer, "conv12", num_output, 3, 1, padding="SAME",
        xavier=False, relu=False, stddev=0.0001, pretrained=pretrained)
    return params, mask, tracer


def apply(params, images, cfg, *, train: bool = False, rng=None,
          tape=None):
    """Concat-free fire chain (see squeezedet.apply); pools are VALID
    here but pooling still commutes with the virtual concat."""
    x = L.conv2d(params["conv1"], images, 2, padding="VALID")
    L.record(tape, "conv1", x)
    x = L.max_pool(x, 3, 2, "VALID")
    pair = x
    for name, _, _, _ in _FIRES:
        pool = (3, 2) if name in _POOL_AFTER else None
        pair = L.fire_pair(params[name], pair, pool=pool,
                           padding="VALID", tape=tape, name=name)
        L.record(tape, name, pair)
    if train and cfg.keep_prob < 1.0:
        r1, r2 = jax.random.split(rng)
        pair = (L.dropout(pair[0], cfg.keep_prob, r1, train),
                L.dropout(pair[1], cfg.keep_prob, r2, train))
    out = L.conv2d_pair(params["conv12"], pair[0], pair[1], 1,
                        relu=False)
    L.record(tape, "conv12", out)
    return out
