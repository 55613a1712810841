"""Demo entry point: image and video detection (reference src/demo.py).

Image mode: glob inputs, resize to model resolution, detect, draw
class-colored boxes, write ``out_<name>`` (demo.py:161-225).  Video
mode: per-frame crop ``[500:-205, 239:-439]`` + per-stage timing
(demo.py:44-158).  Only squeezeDet / squeezeDet+ are supported, like the
reference (demo.py:58-59, 164-165).
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np

CLS2CLR = {
    'car': (255, 191, 0),
    'cyclist': (0, 191, 255),
    'pedestrian': (255, 0, 191),
}


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="SqueezeDet demo (TPU)")
    p.add_argument('--mode', default='image', choices=['image', 'video'])
    p.add_argument('--checkpoint',
                   default='./data/model_checkpoints/squeezeDet',
                   help='Checkpoint directory (orbax), exact step dir, or '
                        'TF1 .ckpt / caffe .pkl weight file.')
    p.add_argument('--input_path', default='./data/sample.png',
                   help='Image glob or video file.')
    p.add_argument('--out_dir', default='./data/out/')
    p.add_argument('--demo_net', default='squeezeDet')
    p.add_argument('--compute_dtype', default='')
    p.add_argument('--quantize', default='', choices=['', 'int8'],
                   help='Run the int8 PTQ program (quant.py), '
                        'calibrated on --calib_images (default: the '
                        'demo inputs themselves in image mode).')
    p.add_argument('--calib_images', default='',
                   help='Image file/dir/glob for --quantize '
                        'calibration; required in video mode.')
    p.add_argument('--calib_percentile', type=float, default=None,
                   help='Calibrate activation ranges at this '
                        'percentile of |activation| instead of '
                        'abs-max (saturating clip, e.g. 99.99).')
    p.add_argument('--image_width', type=int, default=0,
                   help='Override input width (0 = model default).')
    p.add_argument('--image_height', type=int, default=0,
                   help='Override input height (0 = model default).')
    p.add_argument('--device_postprocess', action='store_true',
                   help='Fuse top-K + per-class NMS into the device '
                        'program (ops/postprocess.py) instead of the '
                        'reference host-numpy filter_prediction — '
                        'identical detections (pinned by '
                        'tests/test_postprocess.py), device->host '
                        'transfer drops from [ANCHORS,...] to [K,...]. '
                        'The eval daemon defaults to this for batched '
                        'eval; the demo stays host-path by default for '
                        'reference timing semantics (demo.py:193-199).')
    p.add_argument('--compilation_cache', default='',
                   help='Persistent XLA compilation cache dir.')
    return p


def load_params(det, checkpoint: str):
    """Restore model params from any supported checkpoint flavor."""
    import jax

    from squeezedet_tpu.checkpoint.importer import load_pretrained
    from squeezedet_tpu.checkpoint.manager import (CheckpointManager,
                                                   latest_step)

    if checkpoint in ("", "none"):
        # random-init smoke mode: exercises the full pipeline (decode,
        # NMS, drawing, timing) without weights — useful for perf
        # measurements and installs without the released checkpoint
        params, _, _ = det.init(jax.random.key(0))
        print('WARNING: --checkpoint none — random weights, detections '
              'are meaningless (timing/pipeline smoke mode)')
        return params
    if os.path.isdir(checkpoint):
        template_params, _, _ = det.init(jax.random.key(0))
        step = latest_step(checkpoint)
        if step is not None:
            # params-only restore: inference never needs optimizer state
            # (reference Saver(model.model_params), eval.py:205)
            mgr = CheckpointManager(checkpoint)
            params = mgr.restore_params(step, template_params)
            print('Restored step {} from {}'.format(step, checkpoint))
            return params
        raise FileNotFoundError(
            'No model.ckpt-<step> directories in {}'.format(checkpoint))
    # legacy single-file formats -> re-init with pretrained weights
    pretrained = load_pretrained(checkpoint)
    params, _, _ = det.init(jax.random.key(0), pretrained=pretrained)
    print('Imported legacy weights from {}'.format(checkpoint))
    return params


def _filter_outputs(det, out, mc, device_pp: bool):
    """Final detections above plot_prob_thresh for one image.

    ``device_pp=False``: the reference protocol — ``out`` is the raw
    Interpretation, filtered by the host-numpy filter_prediction
    (nn_skeleton.py:696-734) then thresholded (demo.py:201-205).
    ``device_pp=True``: ``out`` is the fused program's fixed-shape
    (boxes, probs, classes, keep) [1, K, ...]; the same grouped-by-class
    ordering and > plot_prob_thresh cut come from
    device_results_to_lists."""
    if device_pp:
        from squeezedet_tpu.ops.postprocess import device_results_to_lists
        k_boxes, k_probs, k_class, k_keep = (np.asarray(x) for x in out)
        return device_results_to_lists(
            k_boxes[0], k_probs[0], k_class[0], k_keep[0],
            num_classes=mc.classes, plot_prob_thresh=mc.plot_prob_thresh)
    boxes, probs, classes = det.filter_prediction(
        np.asarray(out.det_boxes[0]), np.asarray(out.det_probs[0]),
        np.asarray(out.det_class[0]))
    keep = [i for i in range(len(probs))
            if probs[i] > mc.plot_prob_thresh]
    return ([boxes[i] for i in keep], [probs[i] for i in keep],
            [classes[i] for i in keep])


def _detect_and_draw(det, predict, params, frame, im_input, mc,
                     device_pp: bool = False):
    """Shared detect + filter + draw path. Draws on ``frame`` in place."""
    import jax.numpy as jnp

    from squeezedet_tpu.utils.util import draw_box

    out = predict(params, jnp.asarray(im_input[None]))
    boxes, probs, classes = _filter_outputs(det, out, mc, device_pp)
    draw_box(frame, boxes,
             [mc.class_names[c] + ': (%.2f)' % p
              for c, p in zip(classes, probs)],
             cdict=CLS2CLR)
    return boxes, probs, classes


def _maybe_quantize(args, det, params, default_calib: str = ''):
    """--quantize int8: PTQ via quant.py, calibrated on --calib_images
    (or ``default_calib``).  Returns (params, predict fn) — the
    quantized twin takes the same normalized float images.  With
    --device_postprocess the returned fn also fuses top-K + NMS into
    the program (det.postprocess_device) and yields fixed-shape
    [1, K, ...] results instead of the raw Interpretation."""
    import jax

    if not args.quantize:
        base = det.predict
    else:
        assert args.quantize == 'int8', args.quantize
        calib_src = args.calib_images or default_calib
        assert calib_src, '--quantize needs --calib_images'
        from squeezedet_tpu.quant import calib_batch_from_images
        cfg = det.cfg
        calib = calib_batch_from_images(calib_src, cfg.image_width,
                                        cfg.image_height)
        print('Quantizing (int8 PTQ, {} calibration frames)...'.format(
            len(calib)))
        params = det.quantize(params, [calib],
                              percentile=args.calib_percentile)
        base = det.predict_quant_normalized
    if args.device_postprocess:
        return params, jax.jit(
            lambda p, x: det.postprocess_device(base(p, x)))
    return params, jax.jit(base)


def image_demo(args):
    import cv2

    from squeezedet_tpu.config.kitti import config_for_net_at
    from squeezedet_tpu.models import get_model

    assert args.demo_net in ('squeezeDet', 'squeezeDet+'), \
        'Selected neural net architecture not supported: {}'.format(
            args.demo_net)
    cfg = config_for_net_at(args.demo_net, args.image_width,
                            args.image_height).replace(
        batch_size=1, load_pretrained_model=False)
    if args.compute_dtype:
        cfg = cfg.replace(compute_dtype=args.compute_dtype)
    det = get_model(args.demo_net, cfg)
    params = load_params(det, args.checkpoint)
    params, predict = _maybe_quantize(args, det, params,
                                      default_calib=args.input_path)

    for f in glob.iglob(args.input_path):
        im = cv2.imread(f).astype(np.float32)
        im = cv2.resize(im, (cfg.image_width, cfg.image_height))
        input_image = im - cfg.bgr_means_array()
        # draw on uint8: OpenCV >= 5 asserts CV_8U in putText (the
        # reference drew on the float image, cv2 v3 tolerated it)
        im_draw = np.clip(im, 0, 255).astype(np.uint8)
        _detect_and_draw(det, predict, params, im_draw, input_image, cfg,
                         device_pp=args.device_postprocess)
        file_name = os.path.split(f)[1]
        out_file_name = os.path.join(args.out_dir, 'out_' + file_name)
        cv2.imwrite(out_file_name, im_draw)
        print('Image detection output saved to {}'.format(out_file_name))


def video_demo(args):
    import cv2
    import jax
    import jax.numpy as jnp

    from squeezedet_tpu.config.kitti import config_for_net_at
    from squeezedet_tpu.models import get_model

    assert args.demo_net in ('squeezeDet', 'squeezeDet+'), \
        'Selected neural net architecture not supported: {}'.format(
            args.demo_net)
    cfg = config_for_net_at(args.demo_net, args.image_width,
                            args.image_height).replace(
        batch_size=1, load_pretrained_model=False)
    if args.compute_dtype:
        cfg = cfg.replace(compute_dtype=args.compute_dtype)
    det = get_model(args.demo_net, cfg)
    params = load_params(det, args.checkpoint)
    params, predict = _maybe_quantize(args, det, params)

    cap = cv2.VideoCapture(args.input_path)
    count = 0
    while cap.isOpened():
        t_start = time.time()
        count += 1
        out_im_name = os.path.join(args.out_dir,
                                   str(count).zfill(6) + '.jpg')
        ret, frame = cap.read()
        if not ret:
            break
        frame = frame[500:-205, 239:-439, :]  # demo.py:91 crop
        im_input = frame.astype(np.float32) - cfg.bgr_means_array()
        t_reshape = time.time()
        out = predict(params, jnp.asarray(im_input[None]))
        out = jax.tree.map(np.asarray, out)
        t_detect = time.time()
        # with --device_postprocess the filter already ran inside the
        # program above — this phase collapses to list bookkeeping
        boxes, probs, classes = _filter_outputs(
            det, out, cfg, args.device_postprocess)
        t_filter = time.time()
        from squeezedet_tpu.utils.util import draw_box
        draw_box(frame, boxes,
                 ['%s: (%.2f)' % (cfg.class_names[c], p)
                  for c, p in zip(classes, probs)], cdict=CLS2CLR)
        cv2.imwrite(out_im_name, frame)
        print('Total time: {:.4f}, detection time: {:.4f}, filter time: '
              '{:.4f}'.format(time.time() - t_start, t_detect - t_reshape,
                              t_filter - t_detect))
    cap.release()


def main(argv=None):
    args = build_arg_parser().parse_args(argv)
    if args.compilation_cache:
        from squeezedet_tpu.utils.util import enable_compilation_cache
        enable_compilation_cache(args.compilation_cache)
    os.makedirs(args.out_dir, exist_ok=True)
    if args.mode == 'image':
        image_demo(args)
    else:
        video_demo(args)


if __name__ == '__main__':
    main()
