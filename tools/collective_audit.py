"""Audit the XLA collectives of the sharded train/eval programs.

The multi-chip design delegates communication to XLA's SPMD partitioner
(SURVEY §2.3: no hand-written comm layer; psum/halo exchanges ride ICI).
This tool makes that communication *inspectable*: it lowers the real
train step on an N-device mesh (virtual CPU devices by default, so it
runs anywhere), walks the optimized HLO, and tabulates every collective
op with its shape, byte count, and the mesh axis it rides — then
projects the per-step ICI time on TPU v5e from the measured volumes.

Usage:
    python tools/collective_audit.py --n 8                 # 1-D data
    python tools/collective_audit.py --n 8 --spatial 4     # 2x4 data x spatial
    python tools/collective_audit.py --n 8 --full_res      # flagship 1248x384

The projection model (scaling-book recipe): a ring all-reduce of V
bytes over an axis of size A costs 2·V·(A-1)/A link-bytes; a halo
collective-permute of V bytes costs V link-bytes (one neighbor hop).
v5e ICI: ~45 GB/s usable per direction per link (1 axis of a 2-D torus).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

ICI_GBPS = 45.0  # v5e per-link usable bandwidth, one direction

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "s32": 4, "u64": 8, "u32": 4, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one 'dtype[d0,d1,...]' shape string (element count x
    dtype size); tuple shapes pass each member through this."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def audit_hlo(hlo: str):
    """Collect (op_kind -> [(result_bytes, line)]) from optimized HLO."""
    found = defaultdict(list)
    for line in hlo.splitlines():
        s = line.strip()
        # result shape is on the lhs: '%name = TYPE op-name(...)'
        m = re.match(r"%?[\w.\-]+\s*=\s*(\([^)]*\)|[\w\[\],{}:() ]+?)\s+"
                     r"(" + "|".join(_COLLECTIVES) + r")[\s(.]", s)
        if not m:
            continue
        found[m.group(2)].append((_shape_bytes(m.group(1)), s[:120]))
    return found


def lower_train_step(n_devices: int, n_spatial: int, full_res: bool,
                     device_dataset: bool = False):
    import numpy as np

    import jax

    from squeezedet_tpu.config import kitti_squeezedet_config
    from squeezedet_tpu.config.kitti import tiny_test_config
    from squeezedet_tpu.models import get_model
    from squeezedet_tpu.optim import build_optimizer
    from squeezedet_tpu.parallel.mesh import (batch_sharding,
                                              dataset_sharding,
                                              image_sharding, make_mesh,
                                              make_mesh_2d,
                                              replicated_sharding)
    from squeezedet_tpu.trainer import make_train_step_device

    cfg = (kitti_squeezedet_config() if full_res else tiny_test_config())
    cfg = cfg.replace(load_pretrained_model=False, batch_size=n_devices)
    det = get_model("squeezeDet", cfg)
    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    tx = build_optimizer(cfg, mask)
    opt_state = tx.init(params)

    if n_spatial > 1:
        mesh = make_mesh_2d(n_devices // n_spatial, n_spatial)
    else:
        mesh = make_mesh(n_devices)
    step = make_train_step_device(det, tx, mesh=mesh, donate=False,
                                  device_dataset=device_dataset)

    rng = np.random.RandomState(0)
    g = 8
    gt = np.zeros((n_devices, g, 4), np.float32)
    gt[:, 0] = [cfg.image_width // 2, cfg.image_height // 2, 40, 30]
    labels = np.zeros((n_devices, g), np.int32)
    num_gt = np.full((n_devices,), 1, np.int32)

    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    if device_dataset:
        # shard-major HBM canvas stack (2 rows per data shard) + the
        # per-step index/aug rows — the whole pixel path must stay
        # collective-free (the gather is shard-local by construction)
        rows = 2
        stack = rng.randint(0, 255, (n_devices * rows, cfg.image_height,
                                     cfg.image_width, 3)).astype(np.uint8)
        pos = np.asarray([s * rows for s in range(n_devices)], np.int32)
        aug = np.zeros((n_devices, 5), np.float32)
        aug[:, 3], aug[:, 4] = cfg.image_width, cfg.image_height
        feed = (jax.device_put(stack, dataset_sharding(mesh)),
                jax.device_put(pos, data), jax.device_put(aug, data))
    else:
        images = rng.randn(n_devices, cfg.image_height, cfg.image_width,
                           3).astype(np.float32)
        feed = (jax.device_put(images, image_sharding(mesh)),)
    args = (jax.device_put(params, rep), jax.device_put(opt_state, rep),
            *feed,
            jax.device_put(gt, data),
            jax.device_put(labels, data),
            jax.device_put(num_gt, data),
            jax.random.key(1))
    compiled = step.lower(*args).compile()
    return compiled.as_text(), mesh, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="total devices")
    ap.add_argument("--spatial", type=int, default=1,
                    help="spatial axis size (1 = pure data parallel)")
    ap.add_argument("--full_res", action="store_true",
                    help="flagship 1248x384 config (slow CPU compile)")
    ap.add_argument("--device_dataset", action="store_true",
                    help="audit the mesh-sharded HBM-dataset step "
                         "(expected: the same gradient all-reduces and "
                         "ZERO collectives on the canvas gather path)")
    ap.add_argument("--dump", default="",
                    help="also write the optimized HLO to this path")
    args = ap.parse_args()

    # virtual CPU mesh so the audit runs on any host (CLAUDE.md: set
    # platform before any jax import side effects)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.n)

    hlo, mesh, cfg = lower_train_step(args.n, args.spatial, args.full_res,
                                      device_dataset=args.device_dataset)
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)
    found = audit_hlo(hlo)

    print("mesh: {}   image: {}x{}   batch/device: 1".format(
        dict(zip(mesh.axis_names, mesh.devices.shape)),
        cfg.image_height, cfg.image_width))
    print("{:<22s} {:>5s} {:>14s} {:>14s} {:>10s}".format(
        "collective", "count", "total bytes", "link bytes", "ici ms"))
    grand_link = 0.0
    for kind in _COLLECTIVES:
        items = found.get(kind, [])
        if not items:
            continue
        total = sum(b for b, _ in items)
        # ring all-reduce moves 2V(A-1)/A over the axis; permutes and
        # gathers move V (gather: each device receives V-its-shard,
        # ~V for large A)
        a = max(mesh.devices.shape)
        link = (2 * total * (a - 1) / a
                if kind in ("all-reduce", "reduce-scatter") else total)
        grand_link += link
        print("{:<22s} {:>5d} {:>14,d} {:>14,.0f} {:>10.3f}".format(
            kind, len(items), total, link, link / (ICI_GBPS * 1e6)))
    print("projected ICI time/step at {:.0f} GB/s per link: {:.3f} ms"
          .format(ICI_GBPS, grand_link / (ICI_GBPS * 1e6)))
    if not found:
        print("no collectives found (single device or fully replicated)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
