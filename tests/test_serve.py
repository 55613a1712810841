"""HTTP serving daemon: artifact-backed detection over a socket."""

import http.server
import json
import threading
import urllib.request

import cv2
import jax
import numpy as np

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.models import get_model
from squeezedet_tpu.serve import _build_from_artifact, make_handler
from squeezedet_tpu.serving import export_model


def test_http_detect_roundtrip(tmp_path):
    cfg = tiny_test_config(image_width=96, image_height=96, batch_size=1)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    art = str(tmp_path / "artifact")
    export_model(det, params, art, platforms=("cpu",))

    run, meta = _build_from_artifact(art)
    server = http.server.HTTPServer(
        ("127.0.0.1", 0), make_handler(run, meta, prob_thresh=0.0))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = "http://127.0.0.1:{}".format(server.server_address[1])
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert r.status == 200 and r.read() == b"ok"

        # a differently-sized input: the server resizes and rescales
        # boxes back to the original resolution
        rng = np.random.RandomState(0)
        im = rng.randint(0, 255, (48, 192, 3), np.uint8)
        png = cv2.imencode(".png", im)[1].tobytes()
        req = urllib.request.Request(base + "/detect", data=png,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.loads(r.read())
        assert "latency_ms" in payload
        assert isinstance(payload["detections"], list)
        for d in payload["detections"]:
            assert set(d) == {"box", "score", "class_name"}
            assert d["class_name"] in cfg.class_names
            assert len(d["box"]) == 4

        # undecodable body -> 400
        req = urllib.request.Request(base + "/detect", data=b"not an "
                                     b"image", method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 400
        assert raised
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_http_detect_quantized_artifact(tmp_path):
    """The int8 artifact serves through the same handler: export with
    quantized=True, reload, answer a detect request."""
    cfg = tiny_test_config(image_width=96, image_height=96, batch_size=1)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    calib = rng.randint(0, 255, (1, 96, 96, 3), np.uint8)
    qparams = det.quantize(params, [calib])
    art = str(tmp_path / "artifact_q")
    export_model(det, qparams, art, platforms=("cpu",), quantized=True)

    run, meta = _build_from_artifact(art)
    assert meta["quantized"] is True
    server = http.server.HTTPServer(
        ("127.0.0.1", 0), make_handler(run, meta, prob_thresh=0.0))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = "http://127.0.0.1:{}".format(server.server_address[1])
    try:
        im = rng.randint(0, 255, (96, 96, 3), np.uint8)
        png = cv2.imencode(".png", im)[1].tobytes()
        req = urllib.request.Request(base + "/detect", data=png,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.loads(r.read())
        assert isinstance(payload["detections"], list)
    finally:
        server.shutdown()
        thread.join(timeout=10)
