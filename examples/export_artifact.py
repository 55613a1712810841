"""Build and run a deployable inference artifact.

`serving.export_model` lowers the full uint8 -> detections program
(weights baked in) to a serialized StableHLO artifact that a serving
host can run without the model code, the config, or the checkpoint —
the TPU-native replacement for the reference's "ship a checkpoint plus
the graph-builder source" deployment (demo.py:169-184).

Run: python examples/export_artifact.py [--out /tmp/sqdt_artifact]
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from squeezedet_tpu.config import config_for_net
from squeezedet_tpu.models import get_model
from squeezedet_tpu.serving import export_model, load_exported


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="squeezeDet")
    ap.add_argument("--out", default="/tmp/sqdt_artifact")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--checkpoint", default="",
                    help="optional checkpoint dir / pkl / TF1 ckpt")
    args = ap.parse_args()

    cfg = config_for_net(args.net).replace(
        load_pretrained_model=False, batch_size=args.batch_size,
        compute_dtype="bfloat16")
    det = get_model(args.net, cfg)
    if args.checkpoint:
        from squeezedet_tpu.demo import load_params
        params = load_params(det, args.checkpoint)
    else:
        params, _, _ = det.init(jax.random.key(0))

    export_model(det, params, args.out, batch_size=args.batch_size)
    print("wrote", args.out)

    # A consumer needs only the artifact directory:
    fn, meta = load_exported(args.out)
    im = np.zeros((args.batch_size, meta["image_height"],
                   meta["image_width"], 3), np.uint8)
    boxes, probs, classes, keep = jax.block_until_ready(fn(im))
    print("ran exported program: kept {} detections; classes {}".format(
        int(np.asarray(keep).sum()), meta["class_names"]))


if __name__ == "__main__":
    main()
