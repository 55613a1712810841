"""Pascal VOC dataset + voc_eval tests on a synthetic VOC fixture."""

import os

import numpy as np
import pytest

from squeezedet_tpu.config import base_model_config
from squeezedet_tpu.data import PascalVoc
from squeezedet_tpu.data.voc_eval import parse_rec, voc_ap, voc_eval

_XML = """<annotation>
  <filename>{name}.jpg</filename>
  {objects}
</annotation>
"""
_OBJ = """<object>
    <name>{cls}</name>
    <pose>Unspecified</pose>
    <truncated>0</truncated>
    <difficult>{difficult}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("voc")
    base = os.path.join(root, "VOC2007")
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(os.path.join(base, sub))
    rng = np.random.RandomState(0)
    indices = []
    classes = ("car", "person", "dog")
    for i in range(8):
        name = "{:06d}".format(i)
        indices.append(name)
        objs = []
        for _ in range(rng.randint(1, 4)):
            x1, y1 = rng.randint(1, 200), rng.randint(1, 100)
            w, h = rng.randint(30, 80), rng.randint(30, 80)
            objs.append(_OBJ.format(cls=classes[rng.randint(3)],
                                    difficult=0, x1=x1, y1=y1,
                                    x2=x1 + w, y2=y1 + h))
        with open(os.path.join(base, "Annotations", name + ".xml"),
                  "w") as f:
            f.write(_XML.format(name=name, objects="\n".join(objs)))
        cv2.imwrite(os.path.join(base, "JPEGImages", name + ".jpg"),
                    rng.randint(0, 255, (192, 320, 3)).astype(np.uint8))
    with open(os.path.join(base, "ImageSets", "Main", "test.txt"),
              "w") as f:
        f.write("\n".join(indices) + "\n")
    return str(root)


def test_parse_rec(voc_root):
    objs = parse_rec(os.path.join(voc_root, "VOC2007", "Annotations",
                                  "000000.xml"))
    assert len(objs) >= 1
    assert objs[0]["name"] in ("car", "person", "dog")
    assert len(objs[0]["bbox"]) == 4


def test_voc_ap_07_metric():
    rec = np.array([0.2, 0.4, 0.6, 0.8, 1.0])
    prec = np.ones(5)
    assert voc_ap(rec, prec, use_07_metric=True) == pytest.approx(1.0)
    # area metric with perfect precision is also 1
    assert voc_ap(rec, prec, use_07_metric=False) == pytest.approx(1.0)


def test_pascal_voc_loading_and_eval(voc_root, tmp_path):
    cfg = base_model_config("PASCAL_VOC").replace(
        class_names=("car", "person", "dog"), batch_size=2,
        image_width=320, image_height=192)
    db = PascalVoc("test", "2007", voc_root, cfg,
                   rng=np.random.RandomState(0))
    assert len(db.image_idx) == 8
    # boxes are center-format with the +1 convention
    for idx in db.image_idx:
        for cx, cy, w, h, cls in db._rois[idx]:
            assert w > 0 and h > 0

    # perfect detections -> AP 1.0 for present classes
    all_boxes = [[[] for _ in db.image_idx] for _ in range(3)]
    for i, idx in enumerate(db.image_idx):
        for cx, cy, w, h, cls in db._rois[idx]:
            all_boxes[int(cls)][i].append(
                [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, 0.9])
    aps, names = db.evaluate_detections(str(tmp_path), 0, all_boxes)
    assert len(aps) == 3
    for ap, cls in zip(aps, names):
        n = sum(len(all_boxes[names.index(cls)][i])
                for i in range(len(db.image_idx)))
        if n:
            assert ap > 0.9, (cls, ap)


def test_read_batch_works_on_voc(voc_root):
    cfg = base_model_config("PASCAL_VOC").replace(
        class_names=("car", "person", "dog"), batch_size=2,
        image_width=320, image_height=192, data_augmentation=False)
    # anchors needed for assignment: build a tiny grid
    from squeezedet_tpu.config import (SQUEEZEDET_ANCHOR_SHAPES,
                                       make_anchor_grid)
    cfg = cfg.replace(anchor_box=make_anchor_grid(
        320, 192, 20, 12, SQUEEZEDET_ANCHOR_SHAPES / 4), anchor_per_grid=9,
        grid_w=20, grid_h=12)
    db = PascalVoc("test", "2007", voc_root, cfg,
                   rng=np.random.RandomState(0))
    images, labels, deltas, aidx, bboxes = db.read_batch(shuffle=False)
    assert len(images) == 2
    assert images[0].shape == (192, 320, 3)
    assert all(len(a) == len(l) for a, l in zip(aidx, labels))


def test_voc_config_for_net():
    from squeezedet_tpu.config.voc import voc_config_for_net
    cfg = voc_config_for_net("squeezeDet", 320, 192)
    assert cfg.dataset == "PASCAL_VOC"
    assert cfg.classes == 20
    assert cfg.image_width == 320 and cfg.image_height == 192
    assert cfg.anchors == cfg.grid_w * cfg.grid_h * 9


@pytest.mark.slow
def test_voc_cli_train_eval_end_to_end(tmp_path, capsys):
    """--dataset VOC through the real train and eval entry points on a
    synthetic VOC fixture (beyond reference: src/train.py:104 asserts
    KITTI-only despite plumbing the VOC flags)."""
    from synth_voc import make_synth_voc

    from squeezedet_tpu import eval as eval_entry
    from squeezedet_tpu import train as train_entry

    root = str(tmp_path / "voc")
    make_synth_voc(root, num_images=12, width=320, height=192,
                   image_set="train", seed=3)
    make_synth_voc(str(tmp_path / "v2"), num_images=12, width=320,
                   height=192, image_set="val", seed=3)
    import shutil
    shutil.copy(
        str(tmp_path / "v2" / "VOC2007" / "ImageSets" / "Main" /
            "val.txt"),
        root + "/VOC2007/ImageSets/Main/val.txt")

    train_dir = str(tmp_path / "tr")
    train_entry.main([
        "--dataset", "VOC", "--data_path", root, "--image_set", "train",
        "--train_dir", train_dir, "--image_width", "160",
        "--image_height", "96", "--batch_size", "4", "--max_steps",
        "220", "--checkpoint_step", "219", "--summary_step", "1000000",
        "--learning_rate", "0.001", "--no_augmentation",
        "--device_assign"])

    eval_entry.main([
        "--dataset", "VOC", "--data_path", root, "--image_set", "val",
        "--eval_dir", str(tmp_path / "ev"), "--checkpoint_path",
        train_dir, "--run_once", "--eval_batch_size", "12",
        "--image_width", "160", "--image_height", "96"])
    out = capsys.readouterr().out
    assert "Mean average precision:" in out
    # 220 steps on 12 images: the pipeline must show real learning
    # signal (random init scores 0.000)
    mAP = float(out.split("Mean average precision:")[1].split()[0])
    assert mAP > 0.01, out[-2000:]
