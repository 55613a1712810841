"""Minimal high-throughput serving loop.

Demonstrates the TPU-native inference path end-to-end: raw uint8 BGR
frames in, final (boxes, scores, classes) out, with host->device copies
overlapped against device execution via JAX's async dispatch.  This is
the production shape of the reference's demo.py loop (demo.py:82-151)
without its per-frame host postprocessing.

Run: python examples/serving.py [--batch_size 128] [--net squeezeDet]
"""

from __future__ import annotations

import argparse
import time

import jax

import numpy as np

from squeezedet_tpu.config import config_for_net
from squeezedet_tpu.models import get_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="squeezeDet")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--batches", type=int, default=20)
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

    # XLA-negotiated entry layout: removes the in-program relayout of
    # the uint8 frames (+11% device throughput; see serving.py docs)
    from squeezedet_tpu.serving import negotiated_inference_fn
    serve, input_format = negotiated_inference_fn(det, args.batch_size,
                                                  params)

    rng = np.random.RandomState(0)
    shape = (args.batch_size, cfg.image_height, cfg.image_width, 3)
    print("compiling...")
    out = serve(params, jax.device_put(
        rng.randint(0, 255, shape, dtype=np.uint8), input_format))
    jax.block_until_ready(out)

    # Pre-generated "camera" buffers: the serving loop then measures
    # host->device copy + device execution only.  (On this development
    # setup the TPU sits behind a network tunnel, so the copy dominates;
    # on real hardware PCIe/DMA runs at GB/s and the device is the
    # bottleneck — bench.py measures the on-device ceiling.)
    buffers = [rng.randint(0, 255, shape, dtype=np.uint8)
               for _ in range(3)]

    # Async dispatch: enqueue batch k+1's host->device copy + compute
    # while batch k executes; only the final result blocks.
    t0 = time.perf_counter()
    results = []
    for i in range(args.batches):
        results.append(serve(params, jax.device_put(buffers[i % 3],
                                                    input_format)))
    jax.block_until_ready(results[-1])
    dt = time.perf_counter() - t0
    n = args.batch_size * args.batches
    print("served {} frames in {:.3f}s = {:.0f} img/s "
          "(incl. host->device copies)".format(n, dt, n / dt))
    boxes, probs, classes, keep = results[-1]
    print("last batch: {} detections kept on image 0".format(
        int(np.asarray(keep[0]).sum())))


if __name__ == "__main__":
    main()
