"""End-to-end learning integration test: train from scratch on synthetic
KITTI until the full pipeline (loss -> checkpoints -> detect -> NMS ->
det files -> KITTI scorer) produces real mAP.

Miniature version of the TPU capstone run (320x96, 3000 steps,
mAP 0.908); here small enough for the CPU suite while still asserting
genuine learning end-to-end.
"""

import numpy as np
import pytest

from squeezedet_tpu.config.kitti import custom_kitti_config
from squeezedet_tpu.data import Kitti
from squeezedet_tpu.eval import eval_checkpoint
from squeezedet_tpu.models import get_model
from squeezedet_tpu.trainer import train
from synth_kitti import make_synth_kitti


@pytest.mark.slow
def test_training_produces_nonzero_map(tmp_path):
    root = str(tmp_path / "kitti")
    make_synth_kitti(root, num_images=12, width=160, height=96,
                     image_set="train", seed=3)
    make_synth_kitti(str(tmp_path / "k2"), num_images=12, width=160,
                     height=96, image_set="val", seed=3)
    import shutil
    shutil.copy(str(tmp_path / "k2" / "ImageSets" / "val.txt"),
                root + "/ImageSets/val.txt")

    cfg = custom_kitti_config("squeezeDet", 160, 96, batch_size=4).replace(
        load_pretrained_model=False, data_augmentation=False,
        learning_rate=0.001)
    det = get_model("squeezeDet", cfg)
    db = Kitti("train", root, cfg, rng=np.random.RandomState(0))
    state = train(det, db, train_dir=str(tmp_path / "tr"), max_steps=220,
                  checkpoint_step=219, summary_step=10**6, log_every=100,
                  device_assign=True)
    assert state.step == 220

    eval_cfg = cfg.replace(batch_size=12, is_training=False)
    eval_det = get_model("squeezeDet", eval_cfg)
    eval_db = Kitti("val", root, eval_cfg)
    aps, names, mAP = eval_checkpoint(
        eval_det, eval_db, state.params, 219,
        eval_dir=str(tmp_path / "ev"), batch_size=12, skip_analysis=True)
    # 220 steps on 12 images: not converged, but the pipeline must show
    # real learning signal (random init scores ~0.000)
    assert mAP > 0.01, (mAP, dict(zip(names, aps)))

    # int8 PTQ leg: quantized eval of the same checkpoint through the
    # same scorer must track the float mAP (quant.py; the full-scale
    # accuracy validation is the TPU capstone in PARITY.md)
    _, _, mAP_q = eval_checkpoint(
        eval_det, eval_db, state.params, 219,
        eval_dir=str(tmp_path / "evq"), batch_size=12,
        skip_analysis=True, quantize="int8", calib_batches=1)
    assert mAP_q > mAP - 0.1, (mAP_q, mAP)
