"""Native (C++) components: KITTI evaluator binary + build helper."""

import os
import subprocess

_KITTI_EVAL_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "kitti_eval")
KITTI_EVAL_BINARY = os.path.join(_KITTI_EVAL_DIR, "evaluate_object")


def build_kitti_eval(force: bool = False) -> str:
    """Compile the evaluator in place (idempotent).  Returns binary path."""
    if force or not os.path.exists(KITTI_EVAL_BINARY):
        subprocess.check_call(["make", "-C", _KITTI_EVAL_DIR])
    return KITTI_EVAL_BINARY
