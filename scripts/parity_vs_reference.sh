#!/usr/bin/env bash
# One-command real-KITTI parity harness (SURVEY §7 stages 2 and 4).
#
# Executes the two fidelity-contract milestones that are environmentally
# blocked in the build container (no KITTI data, no released checkpoint)
# the moment both exist:
#
#   1. demo parity — run the imported reference checkpoint on
#      data/sample.png and write the detection overlay for visual diff
#      against the reference README's published output
#      (/root/reference/src/demo.py:32-33, README.md:55-61);
#   2. mAP parity — eval-once on the KITTI val split through the
#      oracle-verified scorer, then diff mAP against a recorded
#      reference value (tolerance 0.005 = the SURVEY "within 0.5 mAP"
#      bar, mAP expressed in [0, 1]).
#
# Usage:
#   scripts/parity_vs_reference.sh <KITTI_ROOT> <CHECKPOINT> [REF_MAP]
#
#   KITTI_ROOT  KITTI object-detection root: training/{image_2,label_2}
#               + ImageSets/val.txt (the reference's data layout,
#               README.md:86-108)
#   CHECKPOINT  the released TF1 checkpoint (model.ckpt-87000) or any
#               supported format (caffe pkl / native orbax dir)
#   REF_MAP     optional recorded reference mAP (e.g. from running the
#               reference eval on the same split); when given, the
#               script exits non-zero if |ours - ref| > 0.005
#
# Environment overrides:
#   NET         backbone (default squeezeDet)
#   SAMPLE      demo image (default /root/reference/data/sample.png)
#   WORK        scratch dir (default /tmp/squeezedet_parity)

set -euo pipefail

KITTI_ROOT=${1:?usage: parity_vs_reference.sh <kitti_root> <checkpoint> [ref_map]}
CHECKPOINT=${2:?usage: parity_vs_reference.sh <kitti_root> <checkpoint> [ref_map]}
REF_MAP=${3:-}
NET=${NET:-squeezeDet}
SAMPLE=${SAMPLE:-/root/reference/data/sample.png}
WORK=${WORK:-/tmp/squeezedet_parity}

mkdir -p "$WORK"

echo "== [1/3] importing checkpoint -> native format =="
if [ -d "$CHECKPOINT" ] && ls "$CHECKPOINT"/model.ckpt-* >/dev/null 2>&1
then
    CKPT_DIR="$CHECKPOINT"
    echo "already native: $CKPT_DIR"
else
    CKPT_DIR="$WORK/ckpt"
    squeezedet-import --checkpoint "$CHECKPOINT" --out_dir "$CKPT_DIR" \
        --net "$NET" --step 87000
fi

echo "== [2/3] demo on sample.png (visual parity artifact) =="
if [ -f "$SAMPLE" ]; then
    squeezedet-demo --input_path "$SAMPLE" --out_dir "$WORK/demo" \
        --checkpoint "$CKPT_DIR" --demo_net "$NET"
    echo "wrote $WORK/demo/out_$(basename "$SAMPLE") — diff visually" \
         "against the reference README sample output"
else
    echo "sample image $SAMPLE not found; skipping demo stage"
fi

echo "== [3/3] eval-once on KITTI val (mAP parity) =="
squeezedet-eval --data_path "$KITTI_ROOT" --image_set val \
    --eval_dir "$WORK/eval" --checkpoint_path "$CKPT_DIR" --run_once \
    --net "$NET" --skip_analysis | tee "$WORK/eval.log"

MAP=$(grep "Mean average precision:" "$WORK/eval.log" | tail -1 \
      | awk '{print $NF}')
echo ""
echo "measured mAP: $MAP"
if [ -n "$REF_MAP" ]; then
    python3 - "$MAP" "$REF_MAP" <<'PY'
import sys
ours, ref = float(sys.argv[1]), float(sys.argv[2])
delta = abs(ours - ref)
print("reference mAP: {:.4f}   delta: {:.4f}".format(ref, delta))
if delta > 0.005:
    print("FAIL: outside the 0.5-mAP parity bar")
    sys.exit(1)
print("PASS: within the 0.5-mAP parity bar")
PY
else
    echo "(no REF_MAP given — record the reference eval's mAP on this"
    echo " split and re-run with it as the third argument to enforce"
    echo " the parity bar)"
fi
