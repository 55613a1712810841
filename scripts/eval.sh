#!/bin/bash
# Eval-daemon launcher (reference scripts/eval.sh): train/val eval jobs
# polling the checkpoint dir.

export GPU_ID=0
export NET="squeezeDet"
export EVAL_DIR="/tmp/squeezedet_tpu/logs/eval"
export CKPT_DIR="/tmp/squeezedet_tpu/logs/train/train"
export DATA_PATH="./data/KITTI"
export IMAGE_SET="val"

usage="Usage: $0 [-net net] [-gpu id] [-eval_dir path] [-ckpt_dir path]
       [-data_path path] [-image_set set]"

while [[ $# -gt 1 ]]; do
  case "$1" in
    -net) NET="$2"; shift;;
    -gpu) GPU_ID="$2"; shift;;
    -eval_dir) EVAL_DIR="$2"; shift;;
    -ckpt_dir) CKPT_DIR="$2"; shift;;
    -data_path) DATA_PATH="$2"; shift;;
    -image_set) IMAGE_SET="$2"; shift;;
    *) echo "$usage"; exit 1;;
  esac
  shift
done

exec python -m squeezedet_tpu.eval \
  --dataset=KITTI \
  --net="$NET" \
  --data_path="$DATA_PATH" \
  --image_set="$IMAGE_SET" \
  --eval_dir="$EVAL_DIR/$IMAGE_SET" \
  --checkpoint_path="$CKPT_DIR"
