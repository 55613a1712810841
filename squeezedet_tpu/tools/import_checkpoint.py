"""``squeezedet-import``: convert a legacy checkpoint (reference TF1
``model.ckpt-*`` or caffe joblib pkl) into a native orbax checkpoint
directory the eval daemon / demo / serve can restore directly.

The reference consumes TF1 checkpoints in-process (Saver.restore,
eval.py:205); here legacy weights flow through the importer's name/
layout mapping (checkpoint/importer.py) once, and every downstream job
uses the native format.  Used by scripts/parity_vs_reference.sh to
score the released model.ckpt-87000 against real KITTI.
"""

from __future__ import annotations

import argparse


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Import a TF1/caffe checkpoint into the native "
                    "orbax format.")
    p.add_argument('--checkpoint', required=True,
                   help='TF1 model.ckpt-* path or caffe joblib pkl.')
    p.add_argument('--out_dir', required=True,
                   help='Directory to write model.ckpt-<step> into.')
    p.add_argument('--net', default='squeezeDet')
    p.add_argument('--step', type=int, default=0,
                   help='Step label for the written checkpoint '
                        '(e.g. 87000 for the released reference ckpt).')
    return p


def main(argv=None):
    args = build_arg_parser().parse_args(argv)

    import jax

    from squeezedet_tpu.checkpoint.manager import CheckpointManager
    from squeezedet_tpu.config import config_for_net
    from squeezedet_tpu.demo import load_params
    from squeezedet_tpu.models import get_model

    cfg = config_for_net(args.net).replace(
        load_pretrained_model=False, batch_size=1, is_training=False)
    det = get_model(args.net, cfg)
    params = load_params(det, args.checkpoint)
    mgr = CheckpointManager(args.out_dir)
    path = mgr.save(args.step, {"params": jax.device_get(params)})
    print('Wrote {}'.format(path))


if __name__ == '__main__':
    main()
