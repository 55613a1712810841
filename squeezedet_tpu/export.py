"""``squeezedet-export``: build a deployable inference artifact.

Lowers the full inference program (weights baked in) to a serialized
StableHLO artifact via :func:`squeezedet_tpu.serving.export_model` —
the TPU-native deployment unit replacing the reference's "checkpoint +
graph-builder source" shipping model (demo.py:169-184).  A serving
host runs the artifact with :func:`serving.load_exported` alone.
"""

from __future__ import annotations

import argparse

import jax


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export a deployable squeezedet-tpu inference "
                    "artifact (StableHLO + metadata).")
    p.add_argument('--net', default='squeezeDet',
                   help='Neural net architecture.')
    p.add_argument('--checkpoint', default='',
                   help='Checkpoint dir / caffe pkl / TF1 ckpt to bake '
                        'in (omit for random init, e.g. smoke tests).')
    p.add_argument('--out_dir', required=True,
                   help='Artifact directory to write.')
    p.add_argument('--batch_size', type=int, default=1)
    p.add_argument('--compute_dtype', default='bfloat16')
    p.add_argument('--f32_input', action='store_true',
                   help='Take mean-subtracted float32 images instead of '
                        'raw uint8 BGR.')
    p.add_argument('--no_postprocess', action='store_true',
                   help='Emit raw (det_boxes, det_probs, det_class) '
                        'instead of the on-device top-K + NMS outputs.')
    p.add_argument('--platforms', default='tpu,cpu',
                   help='Comma-separated lowering platforms.')
    p.add_argument('--image_width', type=int, default=0,
                   help='Override input width (0 = model default).')
    p.add_argument('--image_height', type=int, default=0,
                   help='Override input height (0 = model default).')
    p.add_argument('--quantize', default='', choices=['', 'int8'],
                   help='Bake in the int8 PTQ program (quant.py; 4x '
                        'smaller weights); requires --calib_images.')
    p.add_argument('--calib_images', default='',
                   help='Image file or directory for --quantize '
                        'calibration (representative frames).')
    p.add_argument('--calib_percentile', type=float, default=None,
                   help='Calibrate activation ranges at this '
                        'percentile of |activation| instead of '
                        'abs-max (saturating clip, e.g. 99.99).')
    return p


def main(argv=None):
    args = build_arg_parser().parse_args(argv)

    from squeezedet_tpu.config import config_for_net
    from squeezedet_tpu.models import get_model
    from squeezedet_tpu.serving import export_model

    if args.image_width or args.image_height:
        from squeezedet_tpu.config.kitti import custom_kitti_config
        base = config_for_net(args.net)
        cfg = custom_kitti_config(
            args.net, args.image_width or base.image_width,
            args.image_height or base.image_height)
    else:
        cfg = config_for_net(args.net)
    cfg = cfg.replace(load_pretrained_model=False,
                      batch_size=args.batch_size,
                      compute_dtype=args.compute_dtype)

    det = get_model(args.net, cfg)
    if args.checkpoint:
        from squeezedet_tpu.demo import load_params
        params = load_params(det, args.checkpoint)
    else:
        print("WARNING: no --checkpoint given; exporting random init")
        params, _, _ = det.init(jax.random.key(0))

    if args.quantize:
        assert args.quantize == 'int8', args.quantize
        assert args.calib_images, "--quantize needs --calib_images"
        from squeezedet_tpu.quant import calib_batch_from_images
        calib = calib_batch_from_images(
            args.calib_images, cfg.image_width, cfg.image_height)
        print("Quantizing (int8 PTQ, {} calibration frames)...".format(
            len(calib)))
        params = det.quantize(params, [calib],
                              percentile=args.calib_percentile)

    export_model(det, params, args.out_dir, batch_size=args.batch_size,
                 uint8_input=not args.f32_input,
                 postprocess=not args.no_postprocess,
                 platforms=tuple(
                     p.strip() for p in args.platforms.split(',') if p),
                 quantized=bool(args.quantize))
    print("Exported {} ({} input, {}{}) -> {}".format(
        args.net, 'uint8' if not args.f32_input else 'float32',
        'postprocessed' if not args.no_postprocess else 'raw',
        ', int8' if args.quantize else '',
        args.out_dir))


if __name__ == '__main__':
    main()
