#!/bin/bash
# Training launcher (reference scripts/train.sh): composes the python
# invocation from -net/-train_dir/-data_path/-image_set flags.

export GPU_ID=0
export NET="squeezeDet"
export TRAIN_DIR="/tmp/squeezedet_tpu/logs/train"
export DATA_PATH="./data/KITTI"
export IMAGE_SET="train"
export PRETRAINED=""
export MAX_STEPS=1000000

usage="Usage: $0 [-net (squeezeDet|squeezeDet+|vgg16|resnet50)] [-gpu id]
       [-train_dir path] [-data_path path] [-image_set set]
       [-pretrained path] [-max_steps n]"

while [[ $# -gt 1 ]]; do
  case "$1" in
    -net) NET="$2"; shift;;
    -gpu) GPU_ID="$2"; shift;;
    -train_dir) TRAIN_DIR="$2"; shift;;
    -data_path) DATA_PATH="$2"; shift;;
    -image_set) IMAGE_SET="$2"; shift;;
    -pretrained) PRETRAINED="$2"; shift;;
    -max_steps) MAX_STEPS="$2"; shift;;
    *) echo "$usage"; exit 1;;
  esac
  shift
done

exec python -m squeezedet_tpu.train \
  --dataset=KITTI \
  --net="$NET" \
  --data_path="$DATA_PATH" \
  --image_set="$IMAGE_SET" \
  --train_dir="$TRAIN_DIR/train" \
  --pretrained_model_path="$PRETRAINED" \
  --max_steps="$MAX_STEPS" \
  --summary_step=100 \
  --checkpoint_step=500
