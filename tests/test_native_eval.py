"""C++ evaluator <-> Python scorer parity on identical detection files."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from squeezedet_tpu.data.kitti_ap import evaluate
from synth_kitti import make_synth_kitti

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "squeezedet_tpu", "native", "kitti_eval")
BINARY = os.path.join(NATIVE_DIR, "evaluate_object")


@pytest.fixture(scope="module")
def binary():
    if not os.path.exists(BINARY):
        subprocess.check_call(["make", "-C", NATIVE_DIR])
    return BINARY


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    """Synthetic kitti + noisy detections with varied scores, some FPs,
    some misses, a DontCare region and a Van."""
    root = tmp_path_factory.mktemp("kitti_native")
    make_synth_kitti(str(root), num_images=40, width=320, height=96,
                     image_set="val")
    rng = np.random.RandomState(7)
    lbl_dir = os.path.join(root, "training", "label_2")

    # add a DontCare + Van to one image's labels
    with open(os.path.join(lbl_dir, "000000.txt"), "a") as f:
        f.write("DontCare -1 -1 -10 5.00 5.00 60.00 60.00 "
                "-1 -1 -1 -1000 -1000 -1000 -10\n")
        f.write("Van 0.00 0 0.0 250.00 10.00 315.00 90.00 "
                "1.5 1.6 3.7 0.0 1.7 10.0 0.0\n")

    data_dir = os.path.join(root, "results", "data")
    os.makedirs(data_dir)
    with open(os.path.join(root, "ImageSets", "val.txt")) as f:
        indices = [x.strip() for x in f if x.strip()]
    for idx in indices:
        out_lines = []
        with open(os.path.join(lbl_dir, idx + ".txt")) as f:
            for line in f:
                p = line.split()
                if not p or p[0].lower() in ("dontcare", "van"):
                    continue
                if rng.rand() < 0.15:
                    continue  # missed detection
                jitter = rng.randn(4) * 3.0
                score = float(np.clip(rng.rand(), 0.05, 0.99))
                out_lines.append(
                    "{} -1 -1 0.0 {:.2f} {:.2f} {:.2f} {:.2f} 0.0 0.0 0.0 "
                    "0.0 0.0 0.0 0.0 {:.3f}".format(
                        p[0].lower(), float(p[4]) + jitter[0],
                        float(p[5]) + jitter[1], float(p[6]) + jitter[2],
                        float(p[7]) + jitter[3], score))
                # occasional false positive
                if rng.rand() < 0.1:
                    out_lines.append(
                        "car -1 -1 0.0 1.00 1.00 50.00 45.00 0.0 0.0 0.0 "
                        "0.0 0.0 0.0 0.0 {:.3f}".format(rng.rand()))
        with open(os.path.join(data_dir, idx + ".txt"), "w") as f:
            f.write("\n".join(out_lines) + "\n")
    return str(root)


def test_cpp_matches_python_scorer(binary, fixture, tmp_path):
    root = fixture
    image_set = os.path.join(root, "ImageSets", "val.txt")
    gt_dir = os.path.join(root, "training", "label_2")

    res_py = str(tmp_path / "py")
    res_cc = str(tmp_path / "cc")
    for res in (res_py, res_cc):
        shutil.copytree(os.path.join(root, "results"), res)

    evaluate(res_py, image_set, gt_dir)
    subprocess.check_call([binary, os.path.join(root, "training"),
                           image_set, res_cc, "40"])

    for cls in ("car", "pedestrian", "cyclist"):
        py_ap = os.path.join(res_py, "stats_{}_ap.txt".format(cls))
        cc_ap = os.path.join(res_cc, "stats_{}_ap.txt".format(cls))
        assert os.path.exists(py_ap) == os.path.exists(cc_ap)
        if not os.path.exists(py_ap):
            continue
        py_vals = [float(line.split("=")[1]) for line in open(py_ap)]
        cc_vals = [float(line.split("=")[1]) for line in open(cc_ap)]
        np.testing.assert_allclose(cc_vals, py_vals, rtol=1e-5,
                                   err_msg=cls)
        # full 11-point precision rows too
        py_det = np.loadtxt(os.path.join(
            res_py, "stats_{}_detection.txt".format(cls)))
        cc_det = np.loadtxt(os.path.join(
            res_cc, "stats_{}_detection.txt".format(cls)))
        np.testing.assert_allclose(cc_det, py_det, atol=1e-6)
        # PR plot data
        py_plot = np.loadtxt(os.path.join(res_py, "plot",
                                          "{}_detection.txt".format(cls)))
        cc_plot = np.loadtxt(os.path.join(res_cc, "plot",
                                          "{}_detection.txt".format(cls)))
        np.testing.assert_allclose(cc_plot, py_plot, atol=1e-6)


def test_cpp_cli_errors(binary, tmp_path):
    r = subprocess.run([binary], capture_output=True, text=True)
    assert r.returncode == 1 and "Usage" in r.stderr
    r = subprocess.run([binary, str(tmp_path), "/nonexistent.txt",
                        str(tmp_path), "5"], capture_output=True, text=True)
    assert r.returncode == 1
