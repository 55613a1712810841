"""Evaluation entry point: checkpoint-polling daemon (reference
src/eval.py).

``eval_once`` detects every image in the split, rescales boxes to the
original resolution (eval.py:81-84), filters, writes KITTI det files,
runs the mAP scorer and publishes AP/mAP/timing summaries
(eval.py:48-134).  The daemon loop polls the checkpoint dir, skipping
steps it has already scored (eval.py:210-239).

Unlike the reference (hard-coded batch 1, eval.py:150-166), batched
inference is supported via ``--eval_batch_size`` — the default of 1
preserves reference behaviour and timing semantics.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate SqueezeDet (TPU)")
    p.add_argument('--dataset', default='KITTI',
                   help='KITTI or VOC (the reference plumbs VOC but '
                        'asserts KITTI-only, eval.py:138).')
    p.add_argument('--data_path', default='', help='Root directory of data')
    p.add_argument('--image_set', default='test')
    p.add_argument('--year', default='2007')
    p.add_argument('--eval_dir', default='/tmp/squeezedet_tpu/logs/eval')
    p.add_argument('--checkpoint_path',
                   default='/tmp/squeezedet_tpu/logs/train',
                   help='Training checkpoint directory (or exact step dir '
                        'with --run_once).')
    p.add_argument('--eval_interval_secs', type=int, default=60)
    p.add_argument('--run_once', action='store_true')
    p.add_argument('--net', default='squeezeDet')
    p.add_argument('--eval_batch_size', type=int, default=1)
    p.add_argument('--compute_dtype', default='')
    p.add_argument('--skip_analysis', action='store_true',
                   help='Skip the detection error-type analysis pass.')
    p.add_argument('--image_width', type=int, default=0,
                   help='Override input width (0 = model default).')
    p.add_argument('--image_height', type=int, default=0,
                   help='Override input height (0 = model default).')
    p.add_argument('--native_loader', action='store_true',
                   help='Use the C++ threaded batch loader for image IO.')
    p.add_argument('--image_cache_mb', type=int, default=0,
                   help='Decoded-image LRU budget in MiB (0 = off); '
                        'repeated eval polls skip the image decode.')
    p.add_argument('--compilation_cache', default='',
                   help='Persistent XLA compilation cache dir.')
    p.add_argument('--plot_pr', action='store_true',
                   help='Render recall/precision curve images from the '
                        'scorer plot data (matplotlib stand-in for the '
                        'reference gnuplot path, evaluate_object.cpp:583).')
    p.add_argument('--quantize', default='', choices=['', 'int8'],
                   help='Post-training int8 quantization: calibrate on '
                        'the first --calib_batches eval batches, then '
                        'run the backbone on the MXU int8 path '
                        '(quant.py; all four nets).')
    p.add_argument('--calib_batches', type=int, default=4,
                   help='Calibration batches for --quantize.')
    p.add_argument('--calib_percentile', type=float, default=None,
                   help='Calibrate activation ranges at this '
                        'percentile of |activation| instead of '
                        'abs-max (saturating clip, e.g. 99.99).')
    p.add_argument('--device_postprocess', action='store_true',
                   help='Fuse top-K + per-class NMS into the device '
                        'program instead of host numpy '
                        'filter_prediction (identical detections — '
                        'tests/test_eval_dp.py pins mAP equality on '
                        'the synthetic fixture); shrinks the misc '
                        'phase and the device->host transfer. DEFAULT '
                        'for batched eval (--eval_batch_size > 1); '
                        'batch-1 keeps the reference host path unless '
                        'this flag forces it.')
    p.add_argument('--host_postprocess', action='store_true',
                   help='Force the reference host-numpy '
                        'filter_prediction (nn_skeleton.py:696-734) '
                        'even for batched eval — the escape hatch from '
                        'the device-postprocess default.')
    p.add_argument('--device_dataset', action='store_true',
                   help='Keep the eval split resident in HBM as one '
                        'uint8 canvas stack (uploaded once, reused '
                        'across checkpoint polls) and run the gather + '
                        'per-image resize + normalization inside the '
                        'device program: each poll ships only row '
                        'positions and extents, removing the per-poll '
                        'im_read + image transfer — the eval twin of '
                        'training\'s --device_dataset.')
    return p


def resolve_device_postprocess(args) -> bool:
    """TPU-first default: batched eval fuses postprocess into the device
    program (identical detections — pinned by test_eval_dp); batch-1
    keeps the reference host path for timing-semantics fidelity
    (eval.py:150-166).  --device_postprocess / --host_postprocess force
    either way (host wins when both are given)."""
    if args.host_postprocess:
        return False
    return args.device_postprocess or args.eval_batch_size > 1


def quantize_on_split(det, imdb, params, calib_batches: int,
                      percentile=None):
    """PTQ calibrated on the first ``calib_batches`` batches of the
    split (unshuffled, cursor restored afterwards).  Returns the int8
    parameter tree for ``detect_all(..., quant=True)``."""
    from squeezedet_tpu.quant import (calibrate_normalized,
                                      quantize_detector)
    imdb.reset_cursor()

    def batches():
        for _ in range(calib_batches):
            images, _ = imdb.read_image_batch(shuffle=False)
            yield np.stack(images)

    qparams = quantize_detector(
        det, params, calibrate_normalized(det, params, batches(),
                                          percentile=percentile))
    imdb.reset_cursor()
    return qparams


def _spatial_predict_with_fallback(spatial_jit, single_jit, host_params,
                                   quant: bool, n_devices: int):
    """Predict callable that degrades from spatial partitioning to
    single-device on the known int8 SPMD compile failure.

    Backstop for s8 stage geometries the stride-16 divisibility
    precheck (``spatial_factors``) cannot model, e.g. VALID-pool nets:
    XLA's partitioner mis-types its zero-pad broadcast on unevenly
    split s8 convs (hlo_verifier RET_CHECK ``SameElementType``).  Only
    that signature falls back — a bf16 anomaly must surface, not be
    mislabeled.  On fallback the sharded param replicas are freed
    before the single-device program allocates.  Factored out of
    ``detect_all`` so the except path is unit-testable with stub
    callables (tests/test_eval_dp.py) — no TPU geometry in CI actually
    trips it.
    """
    import jax

    state = {'spatial': True, 'announced': False}

    def predict(p, *batch):
        if state['spatial']:
            try:
                out = spatial_jit(p, *batch)
            except jax.errors.JaxRuntimeError as e:
                if not (quant and 'SameElementType' in str(e)):
                    raise
                print('int8 spatial partitioning unavailable '
                      'for this geometry; evaluating '
                      'single-device')
                state['spatial'] = False
                for leaf in jax.tree_util.tree_leaves(p):
                    leaf.delete()
            else:
                if not state['announced']:
                    # after the first success, so a fallback log
                    # never shows both banners
                    print('Evaluating spatially over {} '
                          'devices'.format(n_devices))
                    state['announced'] = True
                return out
        return single_jit(host_params, *batch)

    return predict


def detect_all(det, imdb, params, batch_size: int, quant: bool = False,
               device_postprocess: bool = False,
               device_dataset: bool = False):
    """Run detection over the whole split.

    When several devices are visible and the batch divides over them,
    the forward pass runs data-parallel over a 1-D mesh (params
    replicated, images sharded) — the reference's eval is single-GPU
    batch-1 (eval.py:150-166); here a pod host can scan a split with
    every chip.

    ``device_postprocess`` fuses top-K + per-class NMS into the device
    program (ops/postprocess.py, tie-order parity pinned by
    tests/test_postprocess.py) instead of the reference's host numpy
    filter_prediction (nn_skeleton.py:696-734): the ``misc`` phase
    shrinks to K=TOP_N rows of bookkeeping per image and the
    device->host transfer drops from [B, ANCHORS, ...] to [B, K, ...].
    Identical detections to the host path — IoU, ranking and
    thresholds are scale-invariant, so filtering at model resolution
    and rescaling the K survivors commutes with the reference's
    rescale-then-filter order (eval.py:81-84).

    ``device_dataset`` is the eval twin of training's --device_dataset
    (round-4 verdict item 4): the split's canvases upload to HBM ONCE
    (cached on the imdb across checkpoint polls), and each poll ships
    only row positions + extents while the gather + per-image resize +
    normalization run inside the device program
    (device_pipeline.augment_resize_normalize with zero drift/flip) —
    removing the reference's per-poll im_read + full-image transfer
    (eval.py:66-97) from the train∥eval workflow.

    Returns (all_boxes[cls][img] = [[x1,y1,x2,y2,score],...],
    num_detection, timers dict).
    """
    import jax
    import jax.numpy as jnp

    from squeezedet_tpu.ops.boxes import bbox_transform
    from squeezedet_tpu.ops.postprocess import device_results_to_lists
    from squeezedet_tpu.utils.util import Timer

    # with quant=True, ``params`` is the int8 tree from
    # quantize_on_split and the forward runs the MXU int8 path
    base_predict = det.predict_quant_normalized if quant else det.predict
    if device_postprocess:
        def base_fn(p, x):
            return det.postprocess_device(base_predict(p, x))
    else:
        base_fn = base_predict

    if device_dataset:
        from squeezedet_tpu.data.device_pipeline import (
            augment_resize_normalize)

        def make_ds_fn(constraint=None):
            """(p, dataset, pos, aug) variant of base_fn: shard-resident
            gather + on-device per-image resize/normalize (zero
            drift/flip aug rows) feeding the same forward."""
            def ds_fn(p, dataset, pos, aug):
                canvas = jnp.take(dataset, pos, axis=0)
                images = augment_resize_normalize(
                    canvas, aug, det.cfg.image_height,
                    det.cfg.image_width, det.cfg.bgr_means)
                if constraint is not None:
                    images = jax.lax.with_sharding_constraint(
                        images, constraint)
                return base_fn(p, images)
            return ds_fn
    num_images = len(imdb.image_idx)
    all_boxes = [[[] for _ in range(num_images)]
                 for _ in range(imdb.num_classes)]
    timers = {'im_detect': Timer(), 'im_read': Timer(), 'misc': Timer()}

    mesh = None
    if batch_size > 1 and len(jax.devices()) > 1:
        from squeezedet_tpu.parallel.mesh import auto_mesh
        mesh = auto_mesh(batch_size)
    rep_for_ds = None
    ds_sharded = 0
    if mesh is not None:
        from squeezedet_tpu.parallel.mesh import (batch_sharding,
                                                  replicated_sharding,
                                                  shard_batch)
        print('Evaluating data-parallel over {} devices'.format(
            mesh.devices.size))
        rep = replicated_sharding(mesh)
        rep_for_ds = rep
        params = jax.device_put(params, rep)
        # shard_map, not jit+shardings: data-parallel inference has no
        # cross-image term, but XLA's TopK custom-call (the top-K of
        # the fused device postprocess) is not SPMD-partitionable, so
        # the partitioner all-gathers the [B, anchors] score tensor to
        # every device per batch.  shard_map keeps every op local —
        # zero collectives (same fix as serving.mesh_inference_fn;
        # pinned on the HLO in test_eval_dp).
        from jax.sharding import PartitionSpec as P
        if device_dataset:
            # the val-split canvases SHARD over the data axis (D chips
            # hold D× the split, not D replicas — training's twin):
            # shard_data partitions the split into D strided shards,
            # eval_shard_batches composes every batch shard-major so
            # slot group s only references shard s's block, and the
            # body rebases the padded global rows to the local block —
            # the gather never leaves the chip.
            ds_sharded = mesh.devices.size
            imdb.shard_data(ds_sharded)
            shard_rows = imdb._shard_rows

            def ds_fn_local(p, dataset, pos, aug):
                first = jax.lax.axis_index("data") * shard_rows
                canvas = jnp.take(dataset, pos - first, axis=0)
                images = augment_resize_normalize(
                    canvas, aug, det.cfg.image_height,
                    det.cfg.image_width, det.cfg.bgr_means)
                return base_fn(p, images)

            from squeezedet_tpu.parallel.mesh import dataset_sharding
            rep_for_ds = dataset_sharding(mesh)
            predict_jit = jax.jit(jax.shard_map(
                ds_fn_local, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data")),
                out_specs=P("data")))

            def predict(p, dataset, pos, aug):
                return predict_jit(p, dataset,
                                   *shard_batch(mesh, (pos, aug)))
        else:
            predict_jit = jax.jit(jax.shard_map(
                base_fn, mesh=mesh, in_specs=(P(), P("data")),
                out_specs=P("data")))

            def predict(p, images):
                return predict_jit(p, shard_batch(mesh, images))
    elif len(jax.devices()) > 1:
        # batch-1 — the reference protocol (eval.py:150-166): instead of
        # idling all but one chip, shard the image spatially over every
        # device (XLA inserts the conv halo exchanges,
        # tests/test_spatial.py pins the numerics).
        from squeezedet_tpu.parallel.mesh import (image_sharding,
                                                  make_mesh_spatial,
                                                  replicated_sharding,
                                                  spatial_factors)
        n_dev = len(jax.devices())
        if quant:
            # int8 caveat: XLA's SPMD partitioner mis-types the
            # zero-pad broadcast it inserts when a stage dimension does
            # NOT divide evenly over a spatial axis of an s8 conv
            # (hlo_verifier RET_CHECK SameElementType).  Avoid the pad
            # entirely: factor the devices into the largest height x
            # width grid whose axes divide every conv stage — e.g. 96
            # rows x 320 cols runs 2x4 over 8 devices where a 1-D
            # 8-way height split would trip the bug.
            n_h, n_w = spatial_factors(n_dev, det.cfg.image_height,
                                       det.cfg.image_width)
        else:
            n_h, n_w = n_dev, 1  # uneven splits are fine outside int8
        if n_h * n_w == 1:
            print('int8 spatial partitioning unavailable for this '
                  'geometry (no height x width split of {} devices '
                  'divides every conv stage evenly); evaluating '
                  'single-device'.format(n_dev))
            predict = jax.jit(make_ds_fn() if device_dataset else base_fn)
        else:
            smesh = make_mesh_spatial(n_h, n_w)
            rep = replicated_sharding(smesh)
            rep_for_ds = rep
            if device_dataset:
                # the gathered+resized image picks up the spatial
                # sharding via an in-program constraint; dataset/pos/aug
                # stay replicated over the spatial mesh
                spatial_jit = jax.jit(
                    make_ds_fn(constraint=image_sharding(smesh)),
                    in_shardings=(rep, rep, rep, rep),
                    out_shardings=rep)
                single_jit = jax.jit(make_ds_fn())
            else:
                spatial_jit = jax.jit(base_fn, in_shardings=(
                    rep, image_sharding(smesh)), out_shardings=rep)
                single_jit = jax.jit(base_fn)
            host_params = params
            params = jax.device_put(params, rep)
            predict = _spatial_predict_with_fallback(
                spatial_jit, single_jit, host_params, quant,
                smesh.devices.size)
    else:
        predict = jax.jit(make_ds_fn() if device_dataset else base_fn)

    dataset_dev = None
    if device_dataset:
        # upload once, reuse across checkpoint polls (the daemon calls
        # detect_all per poll; the canvases never change).  The cache
        # is keyed by the target sharding: a library caller reusing
        # one imdb across different batch sizes / meshes must not get
        # a stack committed to a stale device placement.
        ds_key = repr(rep_for_ds)
        cached = getattr(imdb, '_eval_stack_dev', None)
        if cached is not None and cached[0] == ds_key:
            dataset_dev = cached[1]
        if dataset_dev is None:
            # HBM guard (train's twin, trainer.py).  On a data mesh the
            # stack is SHARDED (each chip holds its padded shard block);
            # single-device and spatial meshes hold the full split, so
            # the guard models the per-device share either way.
            h0, w0 = imdb.canvas_size()
            per_device_rows = (imdb._shard_rows if ds_sharded
                               else len(imdb.image_idx))
            gib = per_device_rows * h0 * w0 * 3 / 2**30
            if gib > 12.0:
                raise ValueError(
                    '--device_dataset eval: the {}-image split is '
                    '{:.1f} GiB per device as a uint8 canvas stack '
                    "(too large next to params in one chip's HBM) — "
                    'evaluate without --device_dataset, use more '
                    'data-parallel devices, or split the image '
                    'set'.format(len(imdb.image_idx), gib))
            stack = imdb.load_canvas_dataset()
            print('Device-resident eval split: {} images, {:.2f} GiB'
                  '{}, uploaded once'.format(
                      len(imdb.image_idx), gib,
                      ' per device (sharded {} ways)'.format(ds_sharded)
                      if ds_sharded else ''))
            dataset_dev = (jax.device_put(stack, rep_for_ds)
                           if rep_for_ds is not None
                           else jax.device_put(stack))
            imdb._eval_stack_dev = (ds_key, dataset_dev)
            del stack

    num_detection = 0.0
    imdb.reset_cursor()
    if ds_sharded:
        # shard-major batch plan: every batch's slot group s references
        # only shard s's rows (slot j's image is plan img_is[j]; -1 =
        # pad slot, dropped below)
        plan_batches = list(imdb.eval_shard_batches(batch_size))
    else:
        plan_batches = None
    n_batches = (len(plan_batches) if plan_batches is not None
                 else -(-num_images // batch_size))
    done_images = 0
    for bt in range(n_batches):
        start = bt * batch_size
        timers['im_read'].tic()
        if plan_batches is not None:
            pos, aug, scales, img_is = plan_batches[bt]
        elif device_dataset:
            pos, aug, scales = imdb.read_image_rows()
            img_is = np.arange(start, start + len(pos))
        else:
            images, scales = imdb.read_image_batch(shuffle=False)
            img_is = np.arange(start, start + len(images))
        # the sequential reader wraps past the end of the split; the
        # wrapped tail repeats images already scored (reference
        # eval.py's own tail semantics) and is dropped like pad slots
        img_is = np.where(img_is < num_images, img_is, -1)
        n_in_batch = len(img_is)
        timers['im_read'].toc()

        timers['im_detect'].tic()
        if device_dataset:
            out = predict(params, dataset_dev, jnp.asarray(pos),
                          jnp.asarray(aug))
        else:
            out = predict(params, jnp.asarray(np.stack(images)))
        # np.array (copy): the boxes are rescaled in place below and
        # np.asarray views of jax arrays are read-only
        if device_postprocess:
            k_boxes = np.array(out[0])
            k_probs = np.asarray(out[1])
            k_class = np.asarray(out[2])
            k_keep = np.asarray(out[3])
        else:
            det_boxes = np.array(out.det_boxes)
            det_probs = np.asarray(out.det_probs)
            det_class = np.asarray(out.det_class)
        timers['im_detect'].toc()

        timers['misc'].tic()
        for j in range(n_in_batch):
            i = int(img_is[j])
            if i < 0:
                continue  # pad slot / wrap-around tail
            if device_postprocess:
                k_boxes[j, :, 0::2] /= scales[j][0]
                k_boxes[j, :, 1::2] /= scales[j][1]
                boxes, probs, classes = device_results_to_lists(
                    k_boxes[j], k_probs[j], k_class[j], k_keep[j],
                    imdb.num_classes)
            else:
                det_boxes[j, :, 0::2] /= scales[j][0]
                det_boxes[j, :, 1::2] /= scales[j][1]
                boxes, probs, classes = det.filter_prediction(
                    det_boxes[j], det_probs[j], det_class[j])
            num_detection += len(boxes)
            for c, b, s in zip(classes, boxes, probs):
                all_boxes[c][i].append(bbox_transform(b) + [s])
        timers['misc'].toc()

        done_images += int((img_is >= 0).sum())
        print('im_detect: {:d}/{:d} im_read: {:.3f}s '
              'detect: {:.3f}s misc: {:.3f}s'.format(
                  done_images, num_images,
                  timers['im_read'].average_time,
                  timers['im_detect'].average_time,
                  timers['misc'].average_time))
    return all_boxes, num_detection, timers


def eval_checkpoint(det, imdb, params, global_step, *, eval_dir,
                    batch_size=1, summary_writer=None,
                    skip_analysis=False, plot_pr=False,
                    quantize='', calib_batches=4,
                    calib_percentile=None, device_postprocess=False,
                    device_dataset=False):
    """Score one checkpoint (reference eval_once, eval.py:48-134)."""
    if quantize:
        assert quantize == 'int8', quantize
        print('Quantizing (int8 PTQ, {} calibration batches)...'.format(
            calib_batches))
        params = quantize_on_split(det, imdb, params, calib_batches,
                                   percentile=calib_percentile)
    all_boxes, num_detection, timers = detect_all(
        det, imdb, params, batch_size, quant=bool(quantize),
        device_postprocess=device_postprocess,
        device_dataset=device_dataset)
    print('Evaluating detections...')
    aps, ap_names = imdb.evaluate_detections(eval_dir, global_step,
                                             all_boxes)
    if plot_pr:
        from squeezedet_tpu.utils.plots import render_pr_curves
        rendered = render_pr_curves(os.path.join(
            eval_dir, 'detection_files_{}'.format(global_step)))
        print('Rendered {} PR-curve images'.format(len(rendered)))
    num_images = len(imdb.image_idx)

    print('Evaluation summary:')
    print('  Average number of detections per image: {}:'.format(
        num_detection / num_images))
    print('  Timing:')
    print('    im_read: {:.3f}s detect: {:.3f}s misc: {:.3f}s'.format(
        timers['im_read'].average_time, timers['im_detect'].average_time,
        timers['misc'].average_time))
    print('  Average precisions:')
    for cls, ap in zip(ap_names, aps):
        print('    {}: {:.3f}'.format(cls, ap))
    mAP = float(np.mean(aps))
    print('    Mean average precision: {:.3f}'.format(mAP))

    if summary_writer is not None:
        step = int(global_step)
        for cls, ap in zip(ap_names, aps):
            summary_writer.scalar('APs/' + cls, ap, step)
        summary_writer.scalar('APs/mAP', mAP, step)
        summary_writer.scalar('timing/im_detect',
                              timers['im_detect'].average_time, step)
        summary_writer.scalar('timing/im_read',
                              timers['im_read'].average_time, step)
        summary_writer.scalar('timing/post_proc',
                              timers['misc'].average_time, step)
        summary_writer.scalar('num_det_per_image',
                              num_detection / num_images, step)
        summary_writer.flush()

    if not skip_analysis and hasattr(imdb, 'do_detection_analysis_in_eval'):
        # the error-type taxonomy is KITTI-specific (kitti.py:161-296)
        print('Analyzing detections...')
        imdb.do_detection_analysis_in_eval(eval_dir, global_step)
    return aps, ap_names, mAP


def main(argv=None):
    args = build_arg_parser().parse_args(argv)
    assert args.dataset in ('KITTI', 'VOC', 'PASCAL_VOC'), \
        'Only KITTI and VOC datasets are supported'
    if args.compilation_cache:
        from squeezedet_tpu.utils.util import enable_compilation_cache
        enable_compilation_cache(args.compilation_cache)

    import jax

    from squeezedet_tpu.checkpoint.manager import (CheckpointManager,
                                                   latest_step)
    from squeezedet_tpu.config.voc import config_for_dataset
    from squeezedet_tpu.data import imdb_for_dataset
    from squeezedet_tpu.models import get_model
    from squeezedet_tpu.summary import SummaryWriter

    cfg = config_for_dataset(args.dataset, args.net, args.image_width,
                             args.image_height)
    cfg = cfg.replace(
        batch_size=args.eval_batch_size, load_pretrained_model=False,
        is_training=False)
    if args.compute_dtype:
        cfg = cfg.replace(compute_dtype=args.compute_dtype)
    if args.native_loader:
        from squeezedet_tpu.native import dataloader as ndl
        ndl.build()
        cfg = cfg.replace(use_native_loader=True)
    if args.image_cache_mb:
        cfg = cfg.replace(image_cache_mb=args.image_cache_mb)
    det = get_model(args.net, cfg)
    imdb = imdb_for_dataset(args.dataset, args.image_set, args.data_path,
                            cfg, year=args.year)
    os.makedirs(args.eval_dir, exist_ok=True)
    writer = SummaryWriter(args.eval_dir)

    # params-only restore template — an inference job never touches
    # optimizer state, mirroring Saver(model.model_params), eval.py:205
    params0, _, _ = det.init(jax.random.key(0))

    ckpt = CheckpointManager(args.checkpoint_path)
    seen = set()
    while True:
        step = latest_step(args.checkpoint_path)
        if step is None:
            print('No checkpoint file found')
            if args.run_once:
                return
            print('Wait {:d}s for new checkpoints to be saved ... '.format(
                args.eval_interval_secs))
            time.sleep(args.eval_interval_secs)
            continue
        if step in seen:
            if args.run_once:
                return
            print('Wait {:d}s for new checkpoints to be saved ... '.format(
                args.eval_interval_secs))
            time.sleep(args.eval_interval_secs)
            continue
        seen.add(step)
        print('Evaluating step {}...'.format(step))
        params = ckpt.restore_params(step, params0)
        eval_checkpoint(det, imdb, params, step,
                        eval_dir=args.eval_dir,
                        batch_size=args.eval_batch_size,
                        summary_writer=writer,
                        skip_analysis=args.skip_analysis,
                        plot_pr=args.plot_pr,
                        quantize=args.quantize,
                        calib_batches=args.calib_batches,
                        calib_percentile=args.calib_percentile,
                        device_postprocess=resolve_device_postprocess(
                            args),
                        device_dataset=args.device_dataset)
        if args.run_once:
            return


if __name__ == '__main__':
    main()
