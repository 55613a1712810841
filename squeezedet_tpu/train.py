"""Training entry point (reference src/train.py).

CLI flags mirror the reference's tf.app.flags (train.py:25-48); the
KITTI-only assert, model-metrics dump, auto-resume and summary cadence
all carry over.  ``--num_devices`` adds data parallelism over a device
mesh (no reference equivalent; it was single-GPU).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train SqueezeDet (TPU)")
    p.add_argument('--dataset', default='KITTI',
                   help='KITTI or VOC (the reference plumbs VOC but '
                        'asserts KITTI-only, train.py:104).')
    p.add_argument('--data_path', default='', help='Root directory of data')
    p.add_argument('--image_set', default='train',
                   help='Can be train, trainval, val, or test')
    p.add_argument('--year', default='2007',
                   help='VOC challenge year. 2007 or 2012. '
                        'Only used for Pascal VOC dataset')
    p.add_argument('--train_dir',
                   default='/tmp/squeezedet_tpu/logs/train',
                   help='Directory for event logs and checkpoints.')
    p.add_argument('--max_steps', type=int, default=1000000,
                   help='Maximum number of batches to run.')
    p.add_argument('--net', default='squeezeDet',
                   help='Neural net architecture.')
    p.add_argument('--pretrained_model_path', default='',
                   help='Path to the pretrained model.')
    p.add_argument('--summary_step', type=int, default=10,
                   help='Number of steps to save summary.')
    p.add_argument('--checkpoint_step', type=int, default=1000,
                   help='Number of steps to save checkpoint.')
    p.add_argument('--max_to_keep', type=int, default=5,
                   help='Checkpoints retained in train_dir; older steps '
                        '(and their sampler snapshots) are pruned after '
                        'each save, like the reference tf.train.Saver '
                        'default of 5 (train.py:240). 0 keeps all.')
    p.add_argument('--num_devices', type=int, default=0,
                   help='Devices for data parallelism (0 = all).')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--compute_dtype', default='',
                   help="Override compute dtype, e.g. 'bfloat16'.")
    p.add_argument('--no_resume', action='store_true',
                   help='Do not auto-resume from train_dir checkpoints.')
    p.add_argument('--fresh_start', action='store_true',
                   help='Delete and recreate train_dir before training, '
                        'like the reference main() (train.py:338-340). '
                        'The default here preserves the dir and '
                        'auto-resumes instead.')
    p.add_argument('--image_width', type=int, default=0,
                   help='Override input width (0 = model default).')
    p.add_argument('--image_height', type=int, default=0,
                   help='Override input height (0 = model default).')
    p.add_argument('--batch_size', type=int, default=0,
                   help='Override batch size (0 = model default).')
    p.add_argument('--learning_rate', type=float, default=0.0,
                   help='Override initial learning rate (0 = config).')
    p.add_argument('--lr_warmup_steps', type=int, default=None,
                   help='Linear LR warmup over the first N steps '
                        '(0 = off; unset = config default, or the '
                        'derived value under --recipe_batch). Use with '
                        'a linearly-scaled '
                        'learning rate when raising the batch size '
                        'beyond the reference recipe (e.g. batch 128 '
                        '= 8x batch 16 -> 8x the batch-16 LR with '
                        '~10%% of the run warmed up).')
    p.add_argument('--decay_steps', type=int, default=None,
                   help='Override LR staircase decay interval in steps '
                        '(unset = config default 10000, or the derived '
                        'value under --recipe_batch). Scale by '
                        'batch_ref/batch when raising the batch size '
                        'so decay happens at the same epoch.')
    p.add_argument('--recipe_batch', type=int, default=0,
                   help='Rescale the whole training recipe to this '
                        'batch size via config.scale_recipe_to_batch: '
                        'linear LR scaling, decay_steps shrunk to the '
                        'same sample count, LOSS_COEF_CONF_POS scaled '
                        'linearly (the reference conf loss makes the '
                        'positive-confidence weight ~1/batch, '
                        'nn_skeleton.py:302-314), and ~10%% linear LR '
                        'warmup of --max_steps. The base recipe is the '
                        'config AFTER --batch_size/--learning_rate '
                        'overrides; the explicit --decay_steps/'
                        '--lr_warmup_steps/--loss_coef_* flags still '
                        'win over the derived values. This is the one '
                        'flag that makes large-batch training safe — '
                        'without the conf_pos rescale, val mAP '
                        'collapses under healthy-looking train logs '
                        '(PARITY.md "Large-batch training recipe").')
    p.add_argument('--loss_coef_conf_pos', type=float, default=None,
                   help='Override LOSS_COEF_CONF_POS (reference 75 at '
                        'batch 20). The reference conf loss normalizes '
                        'its positive term by the BATCH-TOTAL object '
                        'count then means over the batch '
                        '(nn_skeleton.py:302-314), so the effective '
                        'positive-confidence weight scales as 1/batch: '
                        'large-batch recipes must scale this '
                        'coefficient linearly with batch size or the '
                        'confidence head trains batch/20x slower than '
                        'the rest of the loss (see PARITY.md '
                        '"Large-batch training recipe").')
    p.add_argument('--loss_coef_conf_neg', type=float, default=None,
                   help='Override LOSS_COEF_CONF_NEG (batch-invariant; '
                        'exposed for sweeps — 0 is a valid ablation).')
    p.add_argument('--loss_coef_class', type=float, default=None,
                   help='Override LOSS_COEF_CLASS (batch-invariant).')
    p.add_argument('--loss_coef_bbox', type=float, default=None,
                   help='Override LOSS_COEF_BBOX (batch-invariant).')
    p.add_argument('--no_augmentation', action='store_true',
                   help='Disable drift/flip data augmentation '
                        '(mc.DATA_AUGMENTATION).')
    p.add_argument('--native_loader', action='store_true',
                   help='Use the C++ threaded batch loader for image IO '
                        '(builds squeezedet_tpu/native/dataloader on '
                        'first use).')
    p.add_argument('--image_cache_mb', type=int, default=0,
                   help='Keep up to this many MiB of decoded images in '
                        'a host-RAM LRU so epochs past the first skip '
                        'the PNG/JPEG decode (the dominant host cost on '
                        'few-core hosts). 0 = off. Ignored by '
                        '--native_loader, which decodes in C++.')
    p.add_argument('--device_assign', action='store_true',
                   help='Run anchor-target assignment on device inside '
                        'the train step instead of on host threads.')
    p.add_argument('--uint8_ingest', action='store_true',
                   help='Feed raw uint8 images and fuse the mean '
                        'subtraction into the device program (4x less '
                        'host-to-device traffic; equivalent to the f32 '
                        'path within bf16 resolution). Requires '
                        '--device_assign.')
    p.add_argument('--device_augment', action='store_true',
                   help='Run the WHOLE augmentation pixel pipeline '
                        '(drift crop, flip, resize, mean subtraction) '
                        'inside the jitted train step as per-image '
                        'bilinear weight matmuls; the host only decodes '
                        'raw uint8 frames and does the GT box math. '
                        'The (dx, dy, flip) draws stay host-side in the '
                        'BatchPlan, so the input stream is the same '
                        'deterministic function of the seed as the '
                        'host-pixel path (parity pinned by '
                        'tests/test_device_pipeline.py). Requires '
                        '--device_assign.')
    p.add_argument('--device_dataset', action='store_true',
                   help='Keep the WHOLE training split resident in HBM '
                        'as one uint8 canvas stack (uploaded once) and '
                        'gather each batch by index inside the jitted '
                        'step, with --device_augment pixel semantics. '
                        'Per-step host-to-device traffic drops from B '
                        'full images to index/aug/GT rows (KBs) — '
                        'training wall speed equals device speed even '
                        'on transfer-starved hosts. Fits any split up '
                        'to ~12 GiB (KITTI train 1242x375: 5.2 GiB). '
                        'Implies --device_augment; requires '
                        '--device_assign; single-controller only.')
    p.add_argument('--steps_per_dispatch', type=int, default=1,
                   help='Fuse K train steps into one scanned device '
                        'program (amortizes dispatch/transfer overhead '
                        'on tunnel- or PCIe-attached hosts). Requires '
                        '--device_assign; viz/histogram summaries and '
                        '--profile_steps traces need K=1 (a warning is '
                        'printed if they are combined).')
    p.add_argument('--compilation_cache', default='',
                   help='Persistent XLA compilation cache dir: '
                        'restarted jobs reload executables instead of '
                        'recompiling (40-90 s for the full program).')
    p.add_argument('--profile_steps', default='',
                   help="Capture a jax profiler trace, e.g. '20:25' "
                        "traces steps 20..24 into <train_dir>/profile.")
    p.add_argument('--histogram_step', type=int, default=0,
                   help='Emit per-variable and per-gradient histograms '
                        'every N steps (0 = off; the reference emits '
                        'them with every summary, nn_skeleton.py:353-358).')
    p.add_argument('--rng_impl', default='',
                   help="PRNG implementation for step/dropout keys, "
                        "e.g. 'rbg' (hardware RNG; measured +11% train "
                        "throughput at batch 128 — the dropout stream "
                        "differs from the default threefry like any "
                        "seed change would). Recorded in checkpoints "
                        "so resume keeps the key type.")
    p.add_argument('--pallas_grads', action='store_true',
                   help='EXPERIMENTAL: route eligible 1x1 filter '
                        'gradients through the Pallas huge-K GEMM '
                        'backward kernel (ops/filter_grad.py). Measured '
                        'a small net LOSS on the full squeezeDet step '
                        '(custom-VJP fusion breaks outweigh the 3.7x '
                        'isolated kernel win — see PARITY.md); kept for '
                        'profiling other geometries. Single-device '
                        'only; ignored on multi-device meshes.')
    p.add_argument('--activation_summary', action='store_true',
                   help='Also emit five-stat activation summaries '
                        '(histogram/sparsity/mean/max/min per layer, '
                        'nn_skeleton.py:736-755) on histogram steps.')
    return p


def config_from_args(args):
    """Resolve the training ModelConfig from parsed CLI flags.

    Split out of :func:`main` so the CLI's recipe semantics are testable:
    the ``--recipe_batch`` flag must equal the
    ``config.scale_recipe_to_batch`` API applied to the base recipe
    (after --batch_size/--learning_rate), with the explicit
    --decay_steps/--lr_warmup_steps/--loss_coef_* flags winning over the
    derived values (tests/test_train.py pins CLI == API)."""
    from squeezedet_tpu.config.voc import config_for_dataset

    cfg = config_for_dataset(args.dataset, args.net, args.image_width,
                             args.image_height)
    if args.batch_size:
        cfg = cfg.replace(batch_size=args.batch_size)
    cfg = cfg.replace(
        is_training=True,
        pretrained_model_path=args.pretrained_model_path,
        load_pretrained_model=bool(args.pretrained_model_path))
    if args.no_augmentation:
        cfg = cfg.replace(data_augmentation=False)
    if args.learning_rate:
        cfg = cfg.replace(learning_rate=args.learning_rate)
    if args.recipe_batch:
        from squeezedet_tpu.config.kitti import scale_recipe_to_batch
        cfg = scale_recipe_to_batch(cfg, args.recipe_batch,
                                    total_steps=args.max_steps)
    # None-default so an explicit 0 (warmup off / keep config decay)
    # still overrides --recipe_batch-derived values, matching the
    # loss_coef_* flags' semantics
    if args.lr_warmup_steps is not None:
        cfg = cfg.replace(lr_warmup_steps=args.lr_warmup_steps)
    if args.decay_steps is not None:
        if args.decay_steps <= 0:
            raise SystemExit('--decay_steps must be a positive step '
                             'interval (omit the flag for the config '
                             'default or the --recipe_batch-derived '
                             'value)')
        cfg = cfg.replace(decay_steps=args.decay_steps)
    for coef in ('loss_coef_conf_pos', 'loss_coef_conf_neg',
                 'loss_coef_class', 'loss_coef_bbox'):
        val = getattr(args, coef)
        if val is not None:
            cfg = cfg.replace(**{coef: val})
    if args.image_cache_mb:
        cfg = cfg.replace(image_cache_mb=args.image_cache_mb)
    if args.compute_dtype:
        cfg = cfg.replace(compute_dtype=args.compute_dtype)
    return cfg


def main(argv=None):
    args = build_arg_parser().parse_args(argv)
    assert args.dataset in ('KITTI', 'VOC', 'PASCAL_VOC'), \
        'Only KITTI and VOC datasets are supported'
    if args.compilation_cache:
        from squeezedet_tpu.utils.util import enable_compilation_cache
        enable_compilation_cache(args.compilation_cache)

    from squeezedet_tpu.data import imdb_for_dataset
    from squeezedet_tpu.models import get_model
    from squeezedet_tpu.parallel.mesh import make_mesh
    from squeezedet_tpu.summary import SummaryWriter
    from squeezedet_tpu.trainer import train

    cfg = config_from_args(args)
    if args.native_loader:
        from squeezedet_tpu.native import dataloader as ndl
        ndl.build()
        cfg = cfg.replace(use_native_loader=True)

    import jax

    from squeezedet_tpu.parallel.distributed import (initialize_multihost,
                                                     is_primary_process)
    initialize_multihost()

    det = get_model(args.net, cfg)
    # per-process seed: each controller must draw its own shuffle and
    # augmentations; same-seeded hosts would feed identical shards.
    # EXCEPT under --device_dataset, whose sampler partitions the
    # GLOBAL image list over the mesh's data axis (imdb.shard_data):
    # every controller must draw the identical global plan and feed
    # only its own devices' slots, so all hosts share one seed and the
    # process-level image-list shed does not apply.  batch_size is then
    # the GLOBAL batch (vs per-host for the host-sharded modes).
    same_sampler = args.device_dataset
    imdb = imdb_for_dataset(
        args.dataset, args.image_set, args.data_path, cfg,
        year=args.year,
        rng=np.random.RandomState(
            args.seed if same_sampler
            else args.seed + jax.process_index()))
    if jax.process_count() > 1 and not same_sampler:
        # disjoint strided shard of the image list per controller
        # (cfg.batch_size is the per-host batch; the global batch is
        # process_count * batch_size)
        imdb.shard_hosts(jax.process_index(), jax.process_count())

    if args.fresh_start and os.path.isdir(args.train_dir) and \
            is_primary_process():
        import shutil
        shutil.rmtree(args.train_dir)
    if jax.process_count() > 1:
        # barrier: peers must not makedirs/write into a shared train_dir
        # while the primary's fresh_start rmtree is still in flight
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("fresh_start_rmtree")
    os.makedirs(args.train_dir, exist_ok=True)
    # one event-file writer per job, not per controller
    writer = SummaryWriter(args.train_dir) if is_primary_process() \
        else None
    mesh = None
    if args.num_devices:
        mesh = make_mesh(args.num_devices)
    elif len(jax.devices()) > 1:
        from squeezedet_tpu.parallel.mesh import auto_mesh
        mesh = auto_mesh(cfg.batch_size)

    step_tracer = None
    if args.profile_steps:
        from squeezedet_tpu.utils.profiling import StepTracer
        start, stop = (int(x) for x in args.profile_steps.split(':'))
        step_tracer = StepTracer(os.path.join(args.train_dir, 'profile'),
                                 start, stop)

    train(det, imdb, train_dir=args.train_dir, max_steps=args.max_steps,
          summary_step=args.summary_step,
          checkpoint_step=args.checkpoint_step, seed=args.seed, mesh=mesh,
          resume=not args.no_resume, summary_writer=writer,
          viz_step=args.summary_step, step_tracer=step_tracer,
          device_assign=args.device_assign,
          histogram_step=args.histogram_step,
          activation_summary=args.activation_summary,
          uint8_ingest=args.uint8_ingest,
          steps_per_dispatch=args.steps_per_dispatch,
          rng_impl=args.rng_impl, pallas_grads=args.pallas_grads,
          max_to_keep=args.max_to_keep,
          device_augment=args.device_augment,
          device_dataset=args.device_dataset)
    if writer is not None:
        writer.close()


if __name__ == '__main__':
    main()
