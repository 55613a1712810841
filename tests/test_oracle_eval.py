"""Oracle mAP parity: the original KITTI evaluator from the reference
repo (compiled unmodified from /root/reference, never vendored) is the
protocol ground truth; both in-house scorers — the clean-room C++ binary
and the pure-Python twin — must reproduce its outputs file-for-file on
adversarial fixtures covering the fiddly corners of the 41-point
protocol: score ties at recall sample points, empty detection files, a
never-detected class, DontCare-saturated images, Van/Person_sitting
neighboring-class ignores, and classes with far fewer than 41 GT.
"""

import math
import os

import shutil
import subprocess

import numpy as np
import pytest

REFERENCE_CPP = "/root/reference/src/dataset/kitti-eval/cpp/evaluate_object.cpp"
NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "squeezedet_tpu", "native", "kitti_eval")
CLASSES = ("car", "pedestrian", "cyclist")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if not os.path.exists(REFERENCE_CPP):
        pytest.skip("reference evaluator source not available")
    build_dir = tmp_path_factory.mktemp("oracle")
    binary = str(build_dir / "evaluate_object_ref")
    subprocess.check_call(
        ["g++", "-O2", "-Wno-sign-compare", "-o", binary, REFERENCE_CPP,
         "-I", os.path.dirname(REFERENCE_CPP)])
    return binary


@pytest.fixture(scope="module")
def ours(tmp_path_factory):
    binary = os.path.join(NATIVE_DIR, "evaluate_object")
    if not os.path.exists(binary):
        subprocess.check_call(["make", "-C", NATIVE_DIR])
    return binary


# -- fixture construction ----------------------------------------------------

def _gt(cls, x1, y1, x2, y2, trunc=0.0, occ=0, alpha=0.0):
    return ("{} {:.2f} {} {:.2f} {:.2f} {:.2f} {:.2f} {:.2f} "
            "1.5 1.6 3.7 0.0 1.7 10.0 0.0").format(
                cls, trunc, occ, alpha, x1, y1, x2, y2)


def _det(cls, x1, y1, x2, y2, score, alpha=0.0):
    return ("{} -1 -1 {:.2f} {:.2f} {:.2f} {:.2f} {:.2f} "
            "0.0 0.0 0.0 0.0 0.0 0.0 0.0 {:.6f}").format(
                cls, alpha, x1, y1, x2, y2, score)


def _write_case(root, gt_by_image, det_by_image):
    indices = sorted(gt_by_image)
    label_dir = os.path.join(root, "training", "label_2")
    set_dir = os.path.join(root, "ImageSets")
    data_dir = os.path.join(root, "results", "data")
    for d in (label_dir, set_dir, data_dir):
        os.makedirs(d)
    with open(os.path.join(set_dir, "val.txt"), "w") as f:
        f.write("\n".join(indices) + "\n")
    for idx in indices:
        with open(os.path.join(label_dir, idx + ".txt"), "w") as f:
            f.write("".join(line + "\n" for line in gt_by_image[idx]))
        with open(os.path.join(data_dir, idx + ".txt"), "w") as f:
            f.write("".join(line + "\n" for line in det_by_image[idx]))
    return root, len(indices)


def _case_general(root):
    """60 images, >41 car GT, all difficulty bands, Van/Person_sitting
    ignores, DontCare regions, jittered detections with FPs and misses,
    real orientation values (AOS path exercised)."""
    rng = np.random.RandomState(11)
    gt_by_image, det_by_image = {}, {}
    for i in range(60):
        idx = "{:06d}".format(i)
        gts, dets = [], []
        for _ in range(rng.randint(1, 5)):
            cls = rng.choice(["car", "car", "pedestrian", "cyclist",
                              "van", "person_sitting", "truck"])
            x1 = rng.uniform(0, 900)
            y1 = rng.uniform(0, 200)
            h = rng.uniform(18, 90)        # spans every MIN_HEIGHT band
            w = h * rng.uniform(0.5, 2.5)
            trunc = float(rng.choice([0.0, 0.1, 0.2, 0.4, 0.6]))
            occ = int(rng.choice([0, 0, 1, 2, 3]))
            alpha = float(rng.uniform(-math.pi, math.pi))
            gts.append(_gt(cls, x1, y1, x1 + w, y1 + h, trunc, occ, alpha))
            if rng.rand() < 0.85:  # detected (sometimes badly)
                j = rng.randn(4) * (1.0 if rng.rand() < 0.8 else 12.0)
                det_cls = cls if cls in CLASSES or rng.rand() < 0.5 \
                    else rng.choice(list(CLASSES))
                if det_cls in ("van", "person_sitting", "truck"):
                    det_cls = "car"
                dets.append(_det(det_cls, x1 + j[0], y1 + j[1],
                                 x1 + w + j[2], y1 + h + j[3],
                                 rng.uniform(0.01, 0.99),
                                 alpha + rng.randn() * 0.3))
        if rng.rand() < 0.3:
            x1, y1 = rng.uniform(0, 900), rng.uniform(0, 200)
            gts.append(_gt("DontCare", x1, y1, x1 + 80, y1 + 40,
                           -1, -1, -10))
            if rng.rand() < 0.5:  # detection swallowed by the DontCare
                dets.append(_det("car", x1 + 5, y1 + 5, x1 + 70, y1 + 35,
                                 rng.uniform(0.01, 0.99), 0.1))
        for _ in range(rng.randint(0, 2)):  # pure background FPs
            x1, y1 = rng.uniform(0, 1000), rng.uniform(0, 250)
            dets.append(_det(rng.choice(list(CLASSES)), x1, y1,
                             x1 + rng.uniform(20, 70),
                             y1 + rng.uniform(25, 60),
                             rng.uniform(0.01, 0.99), -0.5))
        gt_by_image[idx] = gts
        det_by_image[idx] = dets
    return _write_case(root, gt_by_image, det_by_image)


def _case_score_ties(root):
    """Scores quantized to one decimal -> exact ties straddle recall
    sample points; detections carry alpha=-10 so the AOS path is OFF."""
    rng = np.random.RandomState(5)
    gt_by_image, det_by_image = {}, {}
    for i in range(50):
        idx = "{:06d}".format(i)
        gts, dets = [], []
        for _ in range(rng.randint(1, 4)):
            cls = rng.choice(list(CLASSES))
            x1, y1 = rng.uniform(0, 900), rng.uniform(0, 200)
            h = rng.uniform(30, 80)
            w = h * 1.4
            gts.append(_gt(cls, x1, y1, x1 + w, y1 + h))
            if rng.rand() < 0.9:
                score = round(float(rng.choice(
                    [0.1, 0.3, 0.5, 0.5, 0.7, 0.7, 0.7, 0.9])), 1)
                dets.append(_det(cls, x1 + rng.randn(), y1 + rng.randn(),
                                 x1 + w + rng.randn(),
                                 y1 + h + rng.randn(), score, alpha=-10))
        gt_by_image[idx] = gts
        det_by_image[idx] = dets
    return _write_case(root, gt_by_image, det_by_image)


def _case_sparse(root):
    """Empty det files, a never-detected class (cyclist -> no stats
    files), DontCare-saturated images, all-ignored images, and a
    pedestrian class with only 3 GT (<41 recall points)."""
    rng = np.random.RandomState(23)
    gt_by_image, det_by_image = {}, {}
    n_ped = 0
    for i in range(30):
        idx = "{:06d}".format(i)
        gts, dets = [], []
        if i < 8:  # DontCare-saturated: only stuff areas + dets on them
            for _ in range(3):
                x1, y1 = rng.uniform(0, 800), rng.uniform(0, 150)
                gts.append(_gt("DontCare", x1, y1, x1 + 90, y1 + 50,
                               -1, -1, -10))
                dets.append(_det("car", x1 + 4, y1 + 4, x1 + 80, y1 + 45,
                                 rng.uniform(0.2, 0.9)))
        elif i < 14:  # all GT ignored at every difficulty (occlusion 3)
            x1, y1 = rng.uniform(0, 800), rng.uniform(0, 150)
            gts.append(_gt("car", x1, y1, x1 + 70, y1 + 50, 0.9, 3))
            # empty detection file
        elif i < 20:  # cyclist GT exists but is never detected
            x1, y1 = rng.uniform(0, 800), rng.uniform(0, 150)
            gts.append(_gt("cyclist", x1, y1, x1 + 40, y1 + 55))
        else:  # cars detected; a few pedestrians (sub-41-GT class)
            x1, y1 = rng.uniform(0, 800), rng.uniform(0, 150)
            gts.append(_gt("car", x1, y1, x1 + 90, y1 + 55))
            dets.append(_det("car", x1 + 1, y1 - 1, x1 + 91, y1 + 54,
                             rng.uniform(0.1, 0.95)))
            if n_ped < 3:
                n_ped += 1
                px, py = rng.uniform(0, 800), rng.uniform(0, 150)
                gts.append(_gt("pedestrian", px, py, px + 25, py + 60))
                dets.append(_det("pedestrian", px, py, px + 25, py + 60,
                                 rng.uniform(0.1, 0.95)))
        gt_by_image[idx] = gts
        det_by_image[idx] = dets
    return _write_case(root, gt_by_image, det_by_image)


CASES = {"general": _case_general, "score_ties": _case_score_ties,
         "sparse": _case_sparse}


# -- comparison helpers -------------------------------------------------------

def _parse(path):
    """Every float in the file (AP= lines, rows of precision, plot data);
    nan/-nan tokens included."""
    toks = open(path).read().replace("=", " ").split()
    return np.array([float(t) for t in toks if _is_float(t)])


def _is_float(tok):
    try:
        float(tok)
        return True
    except ValueError:
        return False


def _compare_trees(ref_dir, got_dir, label):
    artifacts = ["stats_{}_ap.txt", "stats_{}_detection.txt",
                 "stats_{}_orientation.txt",
                 os.path.join("plot", "{}_detection.txt"),
                 os.path.join("plot", "{}_orientation.txt")]
    compared = 0
    for cls in CLASSES:
        for pattern in artifacts:
            rel = pattern.format(cls)
            ref_path = os.path.join(ref_dir, rel)
            got_path = os.path.join(got_dir, rel)
            assert os.path.exists(ref_path) == os.path.exists(got_path), \
                "{}: {} existence mismatch".format(label, rel)
            if not os.path.exists(ref_path):
                continue
            ref_vals = _parse(ref_path)
            got_vals = _parse(got_path)
            assert ref_vals.shape == got_vals.shape, \
                "{}: {} shape {} vs {}".format(label, rel, ref_vals.shape,
                                               got_vals.shape)
            np.testing.assert_allclose(
                got_vals, ref_vals, rtol=1e-6, atol=1e-9,
                err_msg="{}: {}".format(label, rel))
            compared += 1
    assert compared > 0, "{}: nothing compared".format(label)


@pytest.mark.parametrize("case", sorted(CASES))
def test_scorers_match_reference_oracle(case, oracle, ours, tmp_path):
    root, n = CASES[case](str(tmp_path / "fixture"))
    training = os.path.join(root, "training")
    image_set = os.path.join(root, "ImageSets", "val.txt")
    results = os.path.join(root, "results")

    res = {}
    for name in ("ref", "cc", "py"):
        res[name] = str(tmp_path / name)
        shutil.copytree(results, res[name])

    subprocess.check_call([oracle, training, image_set, res["ref"], str(n)],
                          stdout=subprocess.DEVNULL,
                          stderr=subprocess.DEVNULL)
    subprocess.check_call([ours, training, image_set, res["cc"], str(n)],
                          stdout=subprocess.DEVNULL,
                          stderr=subprocess.DEVNULL)
    from squeezedet_tpu.data.kitti_ap import evaluate
    evaluate(res["py"], image_set, os.path.join(training, "label_2"), n)

    _compare_trees(res["ref"], res["cc"], case + "/native")
    _compare_trees(res["ref"], res["py"], case + "/python")
