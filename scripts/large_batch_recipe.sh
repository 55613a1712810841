#!/bin/bash
# Large-batch training recipe validation at the perf sweet spot.
#
# The throughput headline (1210 img/s, PARITY.md train roofline) is
# measured at batch 128, but the accuracy validations ran the reference
# batch-16-style recipe.  This experiment fuses the two: train the
# flagship 1248x384 squeezeDet from scratch at batch 128 with the
# linearly-scaled LR rule (lr = base_lr * batch/16, linear warmup over
# the first ~10% of steps, decay_steps scaled by 16/batch so the
# staircase boundary lands at the same sample count — reference
# schedule semantics at src/config/kitti_squeezeDet_config.py:15-22)
# on an EQUAL SAMPLE BUDGET (48k images), and require val mAP within
# noise of the batch-16 control trained on the same dataset.
#
# CRITICAL large-batch ingredient (measured, PARITY.md): the reference
# conf loss normalizes its positive term by the BATCH-TOTAL object
# count then means over the batch (nn_skeleton.py:302-314), so the
# positive-confidence weight scales as 1/batch — LOSS_COEF_CONF_POS
# must scale linearly with batch (75 * 128/16 = 600 here) or the conf
# head trains 8x slower than the rest of the loss and val mAP craters
# (0.80 vs 0.89+ on this fixture).
#
#   ARM=control  -> batch 16,  lr 0.001, 3000 steps
#   ARM=large    -> batch 128 via --recipe_batch 128 on the batch-16
#                   base recipe (lr 0.008, decay 1250, conf_pos 600,
#                   ~10% warmup = 38 steps), 375 steps
#   ARM=large64  -> batch 64 via --recipe_batch 64, 750 steps
#
# SEED=n selects the arm's seed (default 0); train dirs are suffixed
# _s<n> for n > 0 so multi-seed validation runs coexist.
#
# Both arms: bf16, --device_assign --uint8_ingest, drift/flip
# augmentation, disjoint 256-image train / 75-image val synthetic
# KITTI at the flagship geometry.  DS=1 trains through
# --device_dataset (the HBM-resident canvas stack; identical stream
# decisions, on-device pixel pipeline — and the only way a
# transfer-starved tunnel host can run the experiment at device
# speed).  Usage:
#   bash scripts/large_batch_recipe.sh gen
#   ARM=large [DS=1] bash scripts/large_batch_recipe.sh train
#   ARM=large [DS=1] bash scripts/large_batch_recipe.sh eval
set -e
ROOT=${ROOT:-/tmp/lb}
DATA=$ROOT/kitti
ARM=${ARM:-large}
W=1248; H=384

case "$1" in
gen)
  python - <<PY
import sys; sys.path.insert(0, '/root/repo/tests')
from synth_kitti import make_synth_kitti
make_synth_kitti('$DATA', num_images=256, width=$W, height=$H,
                 image_set='train', seed=1, start_index=0)
make_synth_kitti('$DATA', num_images=75, width=$W, height=$H,
                 image_set='val', seed=7, start_index=1000)
PY
  ;;
train)
  if [ "$ARM" = control ]; then
    STEPS=3000; CKPT=1000
    RECIPE=""
  elif [ "$ARM" = large64 ]; then
    # batch-64 point on the same 48k-sample budget: lr 0.004,
    # decay 2500, conf_pos 300, warmup 75
    STEPS=750; CKPT=250
    RECIPE="--recipe_batch 64"
  else
    STEPS=375; CKPT=125
    # the validated rescale rule as ONE flag (config.scale_recipe_to_batch):
    # lr 0.001*8=0.008, decay 10000/8=1250, conf_pos 75*8=600, warmup 38
    RECIPE="--recipe_batch 128"
  fi
  EXTRA="$RECIPE"
  SUFFIX=""
  if [ -n "$DS" ]; then EXTRA="$EXTRA --device_dataset"; SUFFIX="_ds"; fi
  SEED=${SEED:-0}
  if [ "$SEED" != 0 ]; then SUFFIX="${SUFFIX}_s$SEED"; fi
  squeezedet-train --data_path $DATA --image_set train \
    --train_dir $ROOT/train_$ARM$SUFFIX --image_width $W --image_height $H \
    --batch_size 16 --learning_rate 0.001 \
    --max_steps $STEPS --checkpoint_step $CKPT \
    --device_assign --uint8_ingest --compute_dtype bfloat16 \
    --image_cache_mb 768 --seed $SEED $EXTRA
  ;;
eval)
  SUFFIX=""
  if [ -n "$DS" ]; then SUFFIX="_ds"; fi
  SEED=${SEED:-0}
  if [ "$SEED" != 0 ]; then SUFFIX="${SUFFIX}_s$SEED"; fi
  squeezedet-eval --data_path $DATA --image_set val \
    --eval_dir $ROOT/eval_$ARM$SUFFIX \
    --checkpoint_path $ROOT/train_$ARM$SUFFIX \
    --run_once --eval_batch_size 25 --image_width $W --image_height $H \
    --compute_dtype bfloat16
  ;;
*) echo "usage: $0 {gen|train|eval}  [ARM=control|large|large64] [SEED=n] [DS=1]"; exit 1 ;;
esac
