"""Native C++ batch loader parity vs the Python cv2 path."""

import numpy as np
import pytest

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.data import Kitti
from squeezedet_tpu.native import dataloader as ndl
from synth_kitti import make_synth_kitti


@pytest.fixture(scope="module")
def built():
    ndl.build()
    assert ndl.available()
    return True


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_native_ld")
    make_synth_kitti(str(root), num_images=5, width=400, height=140)
    return str(root)


def test_eval_batch_matches_python(built, kitti_root):
    cfg = tiny_test_config(image_width=320, image_height=96, batch_size=4)
    py_db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(0))
    nat_db = Kitti("train", kitti_root,
                   cfg.replace(use_native_loader=True),
                   rng=np.random.RandomState(0))
    py_images, py_scales = py_db.read_image_batch(shuffle=False)
    nat_images, nat_scales = nat_db.read_image_batch(shuffle=False)
    for a, b in zip(py_images, nat_images):
        # C++ subtracts the mean via a double cv::Scalar (half-ulp
        # differences at magnitude ~100); everything else is identical
        np.testing.assert_allclose(a, b, atol=5e-3)
    np.testing.assert_allclose(np.asarray(py_scales),
                               np.asarray(nat_scales), rtol=1e-6)


def test_train_batch_matches_python_with_augmentation(built, kitti_root):
    cfg = tiny_test_config(image_width=320, image_height=96,
                           batch_size=4).replace(
        data_augmentation=True, drift_x=30, drift_y=20)
    py_db = Kitti("train", kitti_root, cfg, rng=np.random.RandomState(5))
    nat_db = Kitti("train", kitti_root,
                   cfg.replace(use_native_loader=True),
                   rng=np.random.RandomState(5))
    for _ in range(3):  # several batches -> several rng draws
        pi, pg, pl, pn = py_db.read_batch_raw_targets(shuffle=False,
                                                      max_gt=8)
        ni, ng, nl, nn = nat_db.read_batch_raw_targets(shuffle=False,
                                                       max_gt=8)
        np.testing.assert_array_equal(pn, nn)
        np.testing.assert_allclose(pg, ng, rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(pl, nl)
        np.testing.assert_allclose(pi, ni, atol=5e-3)


def test_native_loader_error_on_missing_file(built, tmp_path):
    with pytest.raises(IOError):
        ndl.load_image_batch([str(tmp_path / "nope.png")], 32, 32,
                             np.zeros(3), 1)
