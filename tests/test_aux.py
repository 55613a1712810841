"""Auxiliary-subsystem tests: error analysis taxonomy, failure
propagation, summaries, metrics report, utilities (SURVEY §5)."""

import os
import threading
import time

import numpy as np
import pytest

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.data import Kitti
from squeezedet_tpu.loader import PrefetchLoader
from squeezedet_tpu.utils.util import Timer, bgr_to_rgb, sparse_to_dense
from synth_kitti import make_synth_kitti


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_aux")
    make_synth_kitti(str(root), num_images=4, width=320, height=96,
                     image_set="val")
    return str(root)


def test_sparse_to_dense():
    out = sparse_to_dense([[0, 1], [2, 3]], [3, 4], [5.0, 7.0])
    assert out[0, 1] == 5.0 and out[2, 3] == 7.0 and out.sum() == 12.0
    with pytest.raises(AssertionError):
        sparse_to_dense([[0]], [2], [1.0, 2.0])


def test_bgr_to_rgb():
    im = np.arange(12).reshape(2, 2, 3)
    out = bgr_to_rgb([im])[0]
    np.testing.assert_array_equal(out[..., 0], im[..., 2])


def test_timer_running_average():
    t = Timer()
    t.tic()
    time.sleep(0.01)
    d1 = t.toc(average=False)
    t.tic()
    time.sleep(0.01)
    avg = t.toc()
    assert t.calls == 2
    assert avg == pytest.approx(t.total_time / 2)
    assert d1 > 0


def test_error_analysis_taxonomy(kitti_root, tmp_path):
    """correct / loc / bg / missed classification (kitti.py:216-296)."""
    cfg = tiny_test_config(image_width=320, image_height=96)
    db = Kitti("val", kitti_root, cfg)
    det_dir = str(tmp_path / "data")
    os.makedirs(det_dir)
    # image 0: one perfect det for the first gt, one background det;
    # other images: no detections (missed)
    for i, idx in enumerate(db.image_idx):
        with open(os.path.join(det_dir, idx + ".txt"), "w") as f:
            if i == 0:
                cx, cy, w, h, cls = db._rois[idx][0]
                x1, y1 = cx - w / 2, cy - h / 2
                x2, y2 = cx + w / 2 - 1, cy + h / 2 - 1
                name = cfg.class_names[int(cls)]
                f.write("{} -1 -1 0.0 {:.2f} {:.2f} {:.2f} {:.2f} 0 0 0 "
                        "0 0 0 0 0.9\n".format(name, x1, y1, x2, y2))
                f.write("car -1 -1 0.0 300.00 90.00 310.00 95.00 0 0 0 "
                        "0 0 0 0 0.8\n")
    stats = db.analyze_detections(det_dir,
                                  str(tmp_path / "det_error.txt"))
    assert stats["num of detections"] >= 1
    assert stats["% correct detections"] > 0
    assert stats["% recall"] < 1.0  # other images missed
    # error file written with type tags
    content = open(str(tmp_path / "det_error.txt")).read()
    assert "missed" in content


def test_visualize_detections_gallery(kitti_root, tmp_path):
    cfg = tiny_test_config(image_width=320, image_height=96)
    db = Kitti("val", kitti_root, cfg)
    err_file = str(tmp_path / "err.txt")
    idx = db.image_idx[0]
    with open(err_file, "w") as f:
        f.write("{} loc 10.0 10.0 50.0 50.0 car 0.700\n".format(idx))
        f.write("{} bg 60.0 10.0 90.0 50.0 cyclist 0.400\n".format(idx))
    ims = db.visualize_detections(
        image_dir=os.path.join(kitti_root, "training", "image_2"),
        image_format=".png", det_error_file=err_file,
        output_image_dir=str(tmp_path / "viz"))
    assert len(ims) == 2
    assert os.path.exists(str(tmp_path / "viz" / "loc" / "0.png"))


def test_loader_propagates_worker_failure(kitti_root):
    """Enqueue-thread failures must surface in the consumer
    (reference coord.request_stop, train.py:235-236)."""
    cfg = tiny_test_config(image_width=320, image_height=96)
    db = Kitti("val", kitti_root, cfg)

    def boom(*a, **k):
        raise RuntimeError("synthetic IO failure")

    db.read_batch = boom
    loader = PrefetchLoader(db, num_threads=1).start()
    try:
        with pytest.raises(RuntimeError):
            loader.get(timeout=10)
    finally:
        loader.stop()


def test_summary_writer_writes_event_files(tmp_path):
    from squeezedet_tpu.summary import SummaryWriter
    w = SummaryWriter(str(tmp_path))
    w.scalar("loss/total", 1.5, 0)
    w.image("viz", np.zeros((1, 8, 8, 3), np.uint8), 0)
    w.flush()
    w.close()
    files = os.listdir(str(tmp_path))
    assert any("tfevents" in f for f in files)


def test_model_metrics_report(tmp_path):
    import jax

    from squeezedet_tpu.models import get_model
    from squeezedet_tpu.utils.metrics import write_model_metrics
    cfg = tiny_test_config()
    det = get_model("squeezeDet", cfg)
    _, _, tracer = det.init(jax.random.key(0))
    path = str(tmp_path / "model_metrics.txt")
    write_model_metrics(path, tracer)
    content = open(path).read()
    assert "Number of parameter by layer:" in content
    assert "conv12" in content
    assert "Number of flops by layer:" in content
    total = sum(v for _, v in tracer.model_size_counter)
    assert "total: {}".format(total) in content


def test_debug_mode_layer_shape_prints(capsys):
    """DEBUG_MODE prints 'Input tensor shape to <layer>: <shape>' for
    every conv/fc layer at init (nn_skeleton.py:510-511, 618-619)."""
    import jax

    from squeezedet_tpu.models import get_model

    cfg = tiny_test_config(image_width=64, image_height=64,
                           batch_size=2).replace(debug_mode=True)
    det = get_model("squeezeDet", cfg)
    det.init(jax.random.key(0))
    out = capsys.readouterr().out
    assert "Input tensor shape to conv1: (2, 64, 64, 3)" in out
    assert "Input tensor shape to conv12:" in out
    # squeeze layer of the first fire module is a conv layer too
    assert "Input tensor shape to fire2/squeeze1x1:" in out


def test_reset_cursor_is_public_and_locked(kitti_root):
    cfg = tiny_test_config(image_width=64, image_height=64, batch_size=2)
    imdb = Kitti("val", kitti_root, cfg)
    imdb.read_image_batch(shuffle=False)
    assert imdb._cur_idx != 0
    imdb.reset_cursor()
    assert imdb._cur_idx == 0
