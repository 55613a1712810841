"""KITTI AP scorer tests (protocol semantics from evaluate_object.cpp)."""

import os

import numpy as np
import pytest

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.data import Kitti
from squeezedet_tpu.data.kitti_ap import (ap_from_precision, box_overlap,
                                          evaluate, get_thresholds)
from synth_kitti import make_synth_kitti


@pytest.fixture()
def kitti_root(tmp_path):
    # the 41-point recall discretization needs >= 41 gt objects PER CLASS
    # to populate every sample point; ~75 images x ~2 objects / 3 classes
    make_synth_kitti(str(tmp_path), num_images=75, width=320, height=96,
                     image_set="val")
    return str(tmp_path)


def _perfect_detections(root, noise=0.0, score_fn=None, drop_every=0):
    """all_boxes[cls][img] built straight from the labels."""
    rng = np.random.RandomState(3)
    lbl_dir = os.path.join(root, "training", "label_2")
    with open(os.path.join(root, "ImageSets", "val.txt")) as f:
        indices = [x.strip() for x in f if x.strip()]
    cls_to_idx = {"car": 0, "pedestrian": 1, "cyclist": 2}
    all_boxes = [[[] for _ in indices] for _ in range(3)]
    k = 0
    for i, idx in enumerate(indices):
        with open(os.path.join(lbl_dir, idx + ".txt")) as f:
            for line in f:
                p = line.split()
                if not p:
                    continue
                k += 1
                if drop_every and k % drop_every == 0:
                    continue
                c = cls_to_idx[p[0].lower()]
                box = [float(p[4]) + rng.randn() * noise,
                       float(p[5]) + rng.randn() * noise,
                       float(p[6]) + rng.randn() * noise,
                       float(p[7]) + rng.randn() * noise]
                score = score_fn(k) if score_fn else 0.9
                all_boxes[c][i].append(box + [score])
    return indices, all_boxes


def test_perfect_detections_give_ap_1(kitti_root, tmp_path):
    indices, all_boxes = _perfect_detections(kitti_root)
    cfg = tiny_test_config(image_width=320, image_height=96)
    db = Kitti("val", kitti_root, cfg, eval_tool="/nonexistent")
    aps, names = db.evaluate_detections(str(tmp_path / "eval"), 0,
                                        all_boxes)
    assert len(aps) == 9 and len(names) == 9
    present = [ap for ap in aps if ap > 0]
    assert present, "at least one class present"
    for ap in present:
        assert ap > 0.95, aps
    # stats files exist in reference layout
    res_dir = str(tmp_path / "eval" / "detection_files_0")
    assert os.path.exists(os.path.join(res_dir, "stats_car_ap.txt")) or \
        os.path.exists(os.path.join(res_dir, "stats_pedestrian_ap.txt"))


def test_missing_detections_lower_ap(kitti_root, tmp_path):
    cfg = tiny_test_config(image_width=320, image_height=96)
    _, perfect = _perfect_detections(kitti_root)
    _, degraded = _perfect_detections(kitti_root, drop_every=2)
    db = Kitti("val", kitti_root, cfg, eval_tool="/nonexistent")
    aps_p, _ = db.evaluate_detections(str(tmp_path / "e1"), 0, perfect)
    aps_d, _ = db.evaluate_detections(str(tmp_path / "e2"), 0, degraded)
    assert np.mean(aps_d) < np.mean(aps_p)


def test_box_overlap_criteria():
    class B:
        def __init__(self, x1, y1, x2, y2):
            self.x1, self.y1, self.x2, self.y2 = x1, y1, x2, y2
    a, b = B(0, 0, 10, 10), B(5, 0, 15, 10)
    assert box_overlap(a, b) == pytest.approx(50 / 150)
    assert box_overlap(a, b, 0) == pytest.approx(0.5)  # inter / area_a
    assert box_overlap(a, B(20, 20, 30, 30)) == 0.0


def test_get_thresholds_recall_discretization():
    # 10 gt, 10 TP scores descending -> recall steps of 0.1;
    # sample pts every 1/40 recall -> every score appears once it crosses
    scores = [0.9 - 0.05 * i for i in range(10)]
    t = get_thresholds(list(scores), 10)
    assert t[0] == 0.9
    assert all(t[i] >= t[i + 1] for i in range(len(t) - 1))
    assert set(t) <= set(scores)


def test_ap_from_precision_is_11_point():
    prec = [1.0] * 41
    assert ap_from_precision(prec) == 1.0
    prec = [1.0] * 20 + [0.0] * 21
    # samples at 0,4,8,12,16 are 1.0 (5 of 11)
    assert ap_from_precision(prec) == pytest.approx(5 / 11)


def test_dontcare_regions_absorb_detections(tmp_path):
    """A det inside a DontCare area must not count as FP
    (evaluate_object.cpp:450-470)."""
    root = str(tmp_path / "k")
    make_synth_kitti(root, num_images=1, width=320, height=96,
                     image_set="val")
    lbl = os.path.join(root, "training", "label_2", "000000.txt")
    with open(lbl) as f:
        lines = [line for line in f if line.strip()]
    gt_line = lines[0].split()
    with open(lbl, "w") as f:
        f.write(" ".join(gt_line) + "\n")
        f.write("DontCare -1 -1 -10 200.00 10.00 300.00 90.00 "
                "-1 -1 -1 -1000 -1000 -1000 -10\n")

    res = str(tmp_path / "res")
    os.makedirs(os.path.join(res, "data"))
    cls = gt_line[0].lower()
    with open(os.path.join(res, "data", "000000.txt"), "w") as f:
        # perfect detection of the gt
        f.write("{} -1 -1 0.0 {} {} {} {} 0.0 0.0 0.0 0.0 0.0 0.0 0.0 "
                "0.9\n".format(cls, *gt_line[4:8]))
        # spurious detection fully inside the DontCare region, scoring
        # above the TP so it isn't threshold-ignored
        f.write("{} -1 -1 0.0 210.00 20.00 290.00 80.00 0.0 0.0 0.0 0.0 "
                "0.0 0.0 0.0 0.95\n".format(cls))
    results = evaluate(res, os.path.join(root, "ImageSets", "val.txt"),
                       os.path.join(root, "training", "label_2"), 1)
    # single-gt degenerate case: one threshold -> AP = precision[0]/11
    # = 1/11 when the DontCare det is absorbed (0.5/11 if it were FP)
    assert results[cls][0] == pytest.approx(1 / 11)


def test_neighboring_class_van_ignored(tmp_path):
    """Van gt is 'ignored' for car eval: a det matching it is neither TP
    nor FP (evaluate_object.cpp:291-294)."""
    root = str(tmp_path / "k")
    make_synth_kitti(root, num_images=1, width=320, height=96,
                     image_set="val")
    lbl = os.path.join(root, "training", "label_2", "000000.txt")
    with open(lbl, "w") as f:
        f.write("Car 0.00 0 0.0 10.00 10.00 100.00 90.00 "
                "1.5 1.6 3.7 0.0 1.7 10.0 0.0\n")
        f.write("Van 0.00 0 0.0 200.00 10.00 300.00 90.00 "
                "1.5 1.6 3.7 0.0 1.7 10.0 0.0\n")
    res = str(tmp_path / "res")
    os.makedirs(os.path.join(res, "data"))
    with open(os.path.join(res, "data", "000000.txt"), "w") as f:
        f.write("car -1 -1 0.0 10.00 10.00 100.00 90.00 0.0 0.0 0.0 0.0 "
                "0.0 0.0 0.0 0.9\n")
        f.write("car -1 -1 0.0 200.00 10.00 300.00 90.00 0.0 0.0 0.0 0.0 "
                "0.0 0.0 0.0 0.95\n")
    results = evaluate(res, os.path.join(root, "ImageSets", "val.txt"),
                       os.path.join(root, "training", "label_2"), 1)
    # van-matched det assigned-to-ignored -> neither TP nor FP; one gt ->
    # one threshold -> AP = 1/11 (0.5/11 if the van det counted as FP)
    assert results["car"][0] == pytest.approx(1 / 11)


def test_render_pr_curves(tmp_path):
    """Matplotlib PR rendering from scorer plot data (stand-in for the
    reference's gnuplot pipeline, evaluate_object.cpp:583-643)."""
    import numpy as np
    from squeezedet_tpu.utils.plots import render_pr_curves
    plot_dir = tmp_path / "plot"
    plot_dir.mkdir()
    x = np.linspace(0, 1, 41)
    data = np.stack([x, 1 - x, 0.8 * (1 - x), 0.5 * (1 - x)], axis=1)
    np.savetxt(str(plot_dir / "car_detection.txt"), data, fmt="%f")
    np.savetxt(str(plot_dir / "car_orientation.txt"), data, fmt="%f")
    written = render_pr_curves(str(tmp_path))
    assert len(written) == 2
    import os
    assert all(os.path.getsize(p) > 1000 for p in written)
