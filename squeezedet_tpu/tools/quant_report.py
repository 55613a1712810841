"""Per-layer int8 quantization error report.

Production PTQ debugging: when the quantized model's mAP drops, this
pinpoints WHERE the precision went — it runs the float and int8
forwards side by side on calibration frames and prints, per taped
layer, the calibrated scale, the int8 utilization (how much of the
[-128, 127] range the activations actually use), and the
signal-to-noise ratio of the dequantized int8 activation against the
float one.  A healthy layer sits around 25-40 dB; a layer whose SNR
collapses (outlier-stretched scale, bad boundary) is the one to move
the ``start`` boundary past or to calibrate with a percentile clip.

Usage:
    python tools/quant_report.py --net squeezeDet \
        [--checkpoint <dir>] [--calib_images <file|dir|glob>] \
        [--image_width W --image_height H] [--percentile 99.99]

Without --checkpoint it reports on random init (pipeline smoke);
without --calib_images it uses synthetic uniform frames.
"""

from __future__ import annotations

import argparse


def snr_db(ref, approx) -> float:
    import numpy as np
    ref = np.asarray(ref, np.float64).ravel()
    err = ref - np.asarray(approx, np.float64).ravel()
    num = float(np.sum(ref * ref))
    den = float(np.sum(err * err))
    if den == 0.0:
        return float("inf")
    return 10.0 * float(np.log10(num / max(den, 1e-300)))


def report(det, params, u8_batch, percentile=None, start=""):
    """Returns rows of (layer, scale, int8 utilization %, SNR dB)."""
    import jax
    import numpy as np

    from squeezedet_tpu.data.device_pipeline import normalize_images
    from squeezedet_tpu.quant import (calibrate, quantize_detector,
                                      quantize_images)
    from squeezedet_tpu.quant import INPUT_SCALE_KEY

    cfg = det.cfg
    scales = calibrate(det, params, [u8_batch], percentile=percentile)
    qparams = quantize_detector(det, params, scales, start=start)

    import jax.numpy as jnp

    @jax.jit
    def float_tape(p, u8):
        tape = {}
        x = normalize_images(u8, cfg.bgr_means,
                             jnp.dtype(cfg.compute_dtype))
        det.backbone.apply(p, x, cfg, train=False, tape=tape)
        return tape

    @jax.jit
    def quant_tape(qp, u8):
        tape = {}
        if INPUT_SCALE_KEY in qp:
            x = quantize_images(u8, cfg.bgr_means, qp[INPUT_SCALE_KEY])
        else:
            x = normalize_images(u8, cfg.bgr_means,
                                 jnp.dtype(cfg.compute_dtype))
        det.backbone.apply(qp, x, cfg, train=False, tape=tape)
        return tape

    u8 = jnp.asarray(u8_batch)
    ft = jax.device_get(float_tape(params, u8))
    qt = jax.device_get(quant_tape(qparams, u8))

    rows = []
    for name in ft:
        f = np.asarray(ft[name], np.float32)
        q = np.asarray(qt[name])
        if q.dtype == np.int8:
            s = scales[name] / 127.0
            deq = q.astype(np.float32) * s
            util = 100.0 * float(np.abs(q).max()) / 127.0
        else:
            deq = np.asarray(q, np.float32)  # float layer / f32 head
            util = float("nan")
        rows.append((name, scales[name] / 127.0, util, snr_db(f, deq)))
    return rows, qparams


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Per-layer int8 PTQ error report.")
    ap.add_argument("--net", default="squeezeDet")
    ap.add_argument("--checkpoint", default="",
                    help="Checkpoint dir / caffe pkl / TF1 ckpt "
                         "(omit for random init).")
    ap.add_argument("--calib_images", default="",
                    help="Image file/dir/glob (omit for synthetic).")
    ap.add_argument("--image_width", type=int, default=0)
    ap.add_argument("--image_height", type=int, default=0)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--percentile", type=float, default=None)
    ap.add_argument("--start", default="",
                    help="First quantized layer (default per net).")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from squeezedet_tpu.config.voc import config_for_dataset
    from squeezedet_tpu.models import get_model

    cfg = config_for_dataset("KITTI", args.net, args.image_width,
                             args.image_height)
    cfg = cfg.replace(batch_size=args.batch_size,
                      load_pretrained_model=False)
    det = get_model(args.net, cfg)
    if args.checkpoint:
        from squeezedet_tpu.demo import load_params
        params = load_params(det, args.checkpoint)
    else:
        print("WARNING: no --checkpoint; reporting on random init")
        params, _, _ = det.init(jax.random.key(0))

    if args.calib_images:
        from squeezedet_tpu.quant import calib_batch_from_images
        u8 = calib_batch_from_images(args.calib_images, cfg.image_width,
                                     cfg.image_height,
                                     limit=args.batch_size)
    else:
        u8 = np.random.RandomState(0).randint(
            0, 255, (args.batch_size, cfg.image_height,
                     cfg.image_width, 3), np.uint8)

    rows, _ = report(det, params, u8, percentile=args.percentile,
                     start=args.start)
    print("{:<24s} {:>12s} {:>8s} {:>9s}".format(
        "layer", "scale", "util%", "SNR dB"))
    for name, scale, util, db in rows:
        print("{:<24s} {:>12.6f} {:>8s} {:>9.1f}".format(
            name, scale,
            "-" if util != util else "{:.0f}".format(util), db))
    worst = min((r for r in rows if r[3] == r[3]), key=lambda r: r[3])
    print("worst layer: {} ({:.1f} dB)".format(worst[0], worst[3]))


if __name__ == "__main__":
    main()
