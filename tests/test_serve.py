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


def test_micro_batcher_folds_concurrent_requests():
    """MicroBatcher groups concurrent submissions into one padded
    device call and routes each caller its own row."""
    from squeezedet_tpu.serve import MicroBatcher

    calls = []

    def run_batched(imgs):
        calls.append(imgs.shape)
        # echo: "boxes" = per-image mean so each caller can check
        # it got its own row back
        means = imgs.reshape(imgs.shape[0], -1).mean(axis=1)
        return (means, means, means, means)

    b = MicroBatcher(run_batched, batch=4, window_ms=200.0)
    imgs = [np.full((8, 8, 3), v, np.uint8) for v in (10, 20, 30)]
    results = [None] * 3

    def worker(i):
        results[i] = b.submit(imgs[i])

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    # one padded batch-4 call served all three concurrent requests
    assert calls == [(4, 8, 8, 3)]
    assert b.batches_run == 1 and b.requests == 3
    got = sorted(float(r[0][0]) for r in results)
    assert got == [10.0, 20.0, 30.0]


def test_micro_batcher_propagates_errors():
    from squeezedet_tpu.serve import MicroBatcher

    def run_batched(imgs):
        raise RuntimeError("device fell over")

    b = MicroBatcher(run_batched, batch=2, window_ms=1.0)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="device fell over"):
        b.submit(np.zeros((8, 8, 3), np.uint8))


def test_micro_batcher_overload_rejects():
    """With max_queue set, a burst beyond the queue limit is shed
    immediately with Overloaded instead of parking handler threads —
    accepted requests keep a bounded wait."""
    from squeezedet_tpu.serve import MicroBatcher, Overloaded

    import time as _time

    def run_batched(imgs):
        _time.sleep(0.05)  # a slow device program under load
        z = np.zeros((imgs.shape[0],), np.float32)
        return (z, z, z, z)

    b = MicroBatcher(run_batched, batch=2, window_ms=50.0, max_queue=2)
    n = 10
    outcomes = [None] * n

    def worker(i):
        try:
            b.submit(np.zeros((4, 4, 3), np.uint8))
            outcomes[i] = "ok"
        except Overloaded:
            outcomes[i] = "shed"

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    assert outcomes.count("shed") >= 1, outcomes
    assert outcomes.count("ok") >= 2, outcomes
    assert b.rejects == outcomes.count("shed")
    assert b.requests == outcomes.count("ok")


def test_http_detect_load_p99_bounded_and_503(tmp_path):
    """Load test of the serving path: N concurrent clients against a
    micro-batched server with a bounded queue.  Every request either
    completes (200) or is shed (503 + Retry-After); the p99 latency of
    ACCEPTED requests stays bounded by the queue depth times the
    device-program time instead of growing with offered load."""
    from squeezedet_tpu.serve import MicroBatcher

    import time as _time

    cfg = tiny_test_config(image_width=96, image_height=96,
                           batch_size=2)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    art = str(tmp_path / "artifact_load")
    export_model(det, params, art, batch_size=2, platforms=("cpu",))
    run, meta = _build_from_artifact(art, max_batch=2)
    jax.block_until_ready(run(np.zeros((2, 96, 96, 3), np.uint8)))

    t_run = []

    def slowed(imgs):
        t0 = _time.perf_counter()
        out = run(imgs)
        jax.block_until_ready(out)
        t_run.append(_time.perf_counter() - t0)
        _time.sleep(0.05)  # widen the program so the burst overlaps
        return out

    batcher = MicroBatcher(slowed, batch=2, window_ms=5.0, max_queue=2)
    server = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(lambda im1: batcher.submit(im1[0]), meta,
                     prob_thresh=0.0))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = "http://127.0.0.1:{}".format(server.server_address[1])
    rng = np.random.RandomState(0)
    png = cv2.imencode(
        ".png", rng.randint(0, 255, (96, 96, 3), np.uint8))[1].tobytes()

    n = 16
    codes = [None] * n
    lat = [None] * n
    retry_after = []
    try:
        def post(i):
            req = urllib.request.Request(base + "/detect", data=png,
                                         method="POST")
            t0 = _time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=300) as r:
                    codes[i] = r.status
            except urllib.error.HTTPError as e:
                codes[i] = e.code
                if e.code == 503:
                    retry_after.append(e.headers.get("Retry-After"))
            lat[i] = _time.perf_counter() - t0

        ts = [threading.Thread(target=post, args=(i,))
              for i in range(n)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)

        assert set(codes) <= {200, 503}, codes
        ok_lat = [l for c, l in zip(codes, lat) if c == 200]
        assert len(ok_lat) >= 2, codes
        # the 16-deep burst against a 2-deep queue must shed something
        assert codes.count(503) >= 1, codes
        assert all(r == "1" for r in retry_after)
        assert batcher.rejects == codes.count(503)
        # accepted p99 bound: at most (max_queue/batch + 1) programs
        # queue ahead of an accepted request; allow generous headroom
        # for CI scheduling on the shared CPU
        program = max(max(t_run) + 0.05, 0.1)
        assert max(ok_lat) < 10 * (batcher.max_queue / batcher.batch
                                   + 2) * program, (max(ok_lat), program)
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_http_detect_micro_batched(tmp_path):
    """End-to-end: a batch-4 artifact behind the micro-batcher serves
    concurrent HTTP requests, folding them into shared programs."""
    from squeezedet_tpu.serve import MicroBatcher

    cfg = tiny_test_config(image_width=96, image_height=96,
                           batch_size=4)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    art = str(tmp_path / "artifact_b4")
    export_model(det, params, art, batch_size=4, platforms=("cpu",))

    run, meta = _build_from_artifact(art, max_batch=4)
    batcher = MicroBatcher(run, batch=4, window_ms=100.0)
    server = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(lambda im1: batcher.submit(im1[0]), meta,
                     prob_thresh=0.0))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = "http://127.0.0.1:{}".format(server.server_address[1])
    rng = np.random.RandomState(0)
    payloads = [None] * 6
    try:
        def post(i):
            im = rng.randint(0, 255, (96, 96, 3), np.uint8)
            png = cv2.imencode(".png", im)[1].tobytes()
            req = urllib.request.Request(base + "/detect", data=png,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                payloads[i] = json.loads(r.read())

        ts = [threading.Thread(target=post, args=(i,)) for i in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert all(p is not None and isinstance(p["detections"], list)
                   for p in payloads)
        # 6 requests must NOT have cost 6 device programs
        assert batcher.batches_run < 6, batcher.batches_run
        assert batcher.requests == 6
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_micro_batcher_p99_bound_at_realistic_service_time():
    """The serving tail-latency claim as a tested invariant (round-4
    verdict item 5): with reject-on-overload, the latency of every
    ACCEPTED request is bounded by the queue geometry —
        p99_accepted <= (max_queue/max_batch + 1) x (service + window)
    x a 2x scheduler-jitter tolerance — independent of OFFERED load,
    and the excess is shed as Overloaded.  Uses a stub run_batched at
    ~25 ms service time (a realistic PCIe-host batch-8 program; the
    PARITY load-test numbers are tunnel-distorted to ~1 s), driving
    ~3x overload in closed-loop bursts."""
    import time as _time

    from squeezedet_tpu.serve import MicroBatcher, Overloaded

    service_s = 0.025
    batch, max_queue, window_ms = 8, 16, 2.0

    def run_batched(imgs):
        _time.sleep(service_s)  # stand-in for the device program
        n = imgs.shape[0]
        z = np.zeros((n, 4), np.float32)
        return np.zeros((n, 4, 4), np.float32), z, z, z

    b = MicroBatcher(run_batched, batch=batch, window_ms=window_ms,
                     max_queue=max_queue)

    lat_accepted, rejected = [], [0]
    lock = threading.Lock()

    def client(rounds):
        for _ in range(rounds):
            t0 = _time.perf_counter()
            try:
                b.submit(np.zeros((2, 2, 3), np.uint8))
            except Overloaded:
                with lock:
                    rejected[0] += 1
                continue
            dt = _time.perf_counter() - t0
            with lock:
                lat_accepted.append(dt)

    # 96 concurrent clients x 3 rounds = 288 offered against a
    # capacity of batch/service = 320 req/s -> sustained ~3x overload
    # while any round's burst is in flight
    threads = [threading.Thread(target=client, args=(3,))
               for _ in range(96)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60.0)

    offered = len(lat_accepted) + rejected[0]
    assert offered == 288
    # accounting: every offered request was either served or shed
    assert b.requests == len(lat_accepted)
    assert b.rejects == rejected[0]
    # overload must actually shed (the queue bound is live)
    assert rejected[0] > 0
    # enough accepted samples for a meaningful p99
    assert len(lat_accepted) >= 50

    bound = (max_queue / batch + 1) * (service_s + window_ms / 1000.0)
    p99 = float(np.percentile(np.asarray(lat_accepted), 99))
    assert p99 <= 2.0 * bound, (
        "accepted p99 {:.3f}s exceeds 2x the queue-geometry bound "
        "{:.3f}s".format(p99, bound))


def test_mesh_serving_matches_single_device():
    """--num_devices N serving: the mesh-sharded program (params
    replicated, micro-batch over the data axis) returns the
    single-device program's detections, its compiled HLO contains no
    collectives (inference has no cross-image term), and the batch
    divisibility guard fires."""
    import pytest

    from squeezedet_tpu.parallel.mesh import make_mesh
    from squeezedet_tpu.serving import mesh_inference_fn

    cfg = tiny_test_config(image_width=96, image_height=96, batch_size=8)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (8, 96, 96, 3), np.uint8)

    want = [np.asarray(o)
            for o in jax.jit(det.predict_raw_postprocessed)(params, imgs)]

    mesh = make_mesh(4)
    fn, params_sh, input_sh = mesh_inference_fn(det, 8, mesh)
    pdev = jax.device_put(params, params_sh)
    idev = jax.device_put(imgs, input_sh)
    got = fn(pdev, idev)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-5)
    # outputs really live batch-sharded on the 4-device mesh
    assert got[0].sharding.mesh.devices.size == 4
    # no collectives in the optimized HLO: batch-parallel inference is
    # communication-free (contrast tools/collective_audit.py's train
    # step, whose gradient all-reduce is the one expected collective)
    txt = fn.lower(pdev, idev).compile().as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "reduce-scatter"):
        assert coll not in txt, coll

    with pytest.raises(ValueError, match="divisible"):
        mesh_inference_fn(det, 6, mesh)


def test_http_detect_mesh_data_parallel():
    """End-to-end data-parallel serving: concurrent HTTP requests fold
    into micro-batches that execute sharded over a 4-device mesh."""
    from squeezedet_tpu.parallel.mesh import make_mesh
    from squeezedet_tpu.serve import MicroBatcher
    from squeezedet_tpu.serving import mesh_inference_fn

    cfg = tiny_test_config(image_width=96, image_height=96, batch_size=4)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    mesh = make_mesh(4)
    fn, params_sh, input_sh = mesh_inference_fn(det, 4, mesh)
    pdev = jax.device_put(params, params_sh)
    run = lambda im: fn(pdev, jax.device_put(im, input_sh))
    meta = {"class_names": list(cfg.class_names), "image_height": 96,
            "image_width": 96, "plot_prob_thresh": 0.0}

    batcher = MicroBatcher(run, batch=4, window_ms=100.0)
    server = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(lambda im1: batcher.submit(im1[0]), meta,
                     prob_thresh=0.0))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = "http://127.0.0.1:{}".format(server.server_address[1])
    rng = np.random.RandomState(0)
    payloads = [None] * 6
    try:
        def post(i):
            im = rng.randint(0, 255, (96, 96, 3), np.uint8)
            png = cv2.imencode(".png", im)[1].tobytes()
            req = urllib.request.Request(base + "/detect", data=png,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                payloads[i] = json.loads(r.read())

        ts = [threading.Thread(target=post, args=(i,)) for i in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert all(p is not None and isinstance(p["detections"], list)
                   for p in payloads)
        assert batcher.batches_run < 6 and batcher.requests == 6
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_serve_num_devices_cli_guards(tmp_path):
    """--num_devices CLI semantics: 0 = all visible devices; a
    non-divisible --max_batch exits with the divisibility message; an
    artifact cannot serve data-parallel (single-device program)."""
    import pytest

    from squeezedet_tpu.serve import (_resolve_num_devices,
                                      build_arg_parser, main)

    parser = build_arg_parser()
    assert _resolve_num_devices(
        parser.parse_args(['--max_batch', '8', '--num_devices', '4'])) == 4
    assert _resolve_num_devices(
        parser.parse_args(['--max_batch', '8', '--num_devices', '0'])) \
        == len(jax.devices())
    with pytest.raises(SystemExit, match="not divisible"):
        _resolve_num_devices(
            parser.parse_args(['--max_batch', '6', '--num_devices', '4']))

    cfg = tiny_test_config(image_width=96, image_height=96, batch_size=1)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    art = str(tmp_path / "artifact_mesh_guard")
    export_model(det, params, art, platforms=("cpu",))
    with pytest.raises(SystemExit, match="single-device program"):
        main(['--artifact', art, '--num_devices', '2', '--max_batch', '2'])


def test_build_from_checkpoint_mesh_branch(monkeypatch):
    """serve's checkpoint builder wires the mesh path end to end:
    random-init params land replicated, the returned run callable
    executes the shard_map program on a zeros micro-batch."""
    import squeezedet_tpu.config as config_mod
    from squeezedet_tpu.serve import _build_from_checkpoint, \
        build_arg_parser

    cfg = tiny_test_config(image_width=96, image_height=96, batch_size=4)
    monkeypatch.setattr(config_mod, "config_for_net",
                        lambda net: cfg.replace(class_names=cfg.class_names))
    args = build_arg_parser().parse_args(
        ['--max_batch', '4', '--num_devices', '4'])
    run, meta = _build_from_checkpoint(args)
    assert meta["image_height"] == 96 and meta["image_width"] == 96
    boxes, probs, classes, keep = [
        np.asarray(o) for o in run(np.zeros((4, 96, 96, 3), np.uint8))]
    assert boxes.shape[0] == 4 and boxes.shape[-1] == 4
    assert probs.shape == keep.shape == classes.shape
