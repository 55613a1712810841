"""``squeezedet-serve``: a minimal stdlib HTTP detection service.

The production face of the serving stack: loads either a checkpoint or
an :func:`squeezedet_tpu.serving.export_model` artifact, compiles the
fully-fused uint8 -> detections program once, and answers

    POST /detect      body = image bytes (png/jpeg)
                      -> JSON {detections: [{box: [cx, cy, w, h],
                         score, class_name}, ...], latency_ms}
    GET  /healthz     -> 200 'ok' once the model is warm

The reference's closest analog is demo.py's batch-of-one loop
(demo.py:161-225); this serves the same program behind a socket with
no per-request Python postprocessing beyond JSON encoding.  Stdlib
http.server only — no framework dependency.

By default requests are handled serially per process (scale out with
processes behind a load balancer; for offline bulk scoring use
squeezedet-eval's batched path instead).  ``--max_batch N`` switches
to a threading server with a micro-batcher: concurrent requests that
arrive within ``--batch_window_ms`` of each other are padded into ONE
batch-N device program — the TPU-native way to serve concurrency,
since a batch-N forward costs far less than N batch-1 forwards
(PARITY.md throughput-vs-batch tables).
"""

from __future__ import annotations

import argparse
import json
import time


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Serve squeezedet-tpu detections over HTTP.")
    p.add_argument('--checkpoint', default='',
                   help='Checkpoint dir / caffe pkl / TF1 ckpt.')
    p.add_argument('--artifact', default='',
                   help='export_model artifact dir (alternative to '
                        '--checkpoint; runs without model code).')
    p.add_argument('--net', default='squeezeDet')
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=8752)
    p.add_argument('--compute_dtype', default='bfloat16')
    p.add_argument('--prob_thresh', type=float, default=None,
                   help='Report only detections above this score '
                        '(default: the config plot threshold).')
    p.add_argument('--quantize', default='', choices=['', 'int8'],
                   help='Serve the int8 PTQ program (quant.py); '
                        'requires --calib_images.')
    p.add_argument('--calib_images', default='',
                   help='Image file or directory for --quantize '
                        'calibration (representative frames).')
    p.add_argument('--calib_percentile', type=float, default=None,
                   help='Calibrate activation ranges at this '
                        'percentile of |activation| instead of '
                        'abs-max (saturating clip, e.g. 99.99).')
    p.add_argument('--max_batch', type=int, default=1,
                   help='Micro-batching: compile the program at this '
                        'batch size, run a threading server, and fold '
                        'concurrent requests into one device program '
                        '(padding partial batches).')
    p.add_argument('--batch_window_ms', type=float, default=2.0,
                   help='How long the micro-batcher waits for more '
                        'requests after the first of a batch arrives.')
    p.add_argument('--num_devices', type=int, default=1,
                   help='Data-parallel serving mesh: 1 (default) serves '
                        'on a single device with the layout-negotiated '
                        'entry; N>1 shards each micro-batch over the '
                        'first N devices (requires --max_batch divisible '
                        'by N); 0 uses every visible device. '
                        'Checkpoint-backed only — a StableHLO artifact '
                        'is a single-device program.')
    p.add_argument('--max_queue', type=int, default=None,
                   help='Reject /detect with 503 when this many '
                        'requests are already queued for the '
                        'micro-batcher (bounds tail latency under '
                        'overload). Default: 4x max_batch; 0 disables.')
    return p


class Overloaded(RuntimeError):
    """The micro-batch queue is at its limit; the caller should shed
    the request (HTTP 503) instead of parking another handler thread —
    an unbounded queue turns a load spike into unbounded tail latency,
    the classic queueing failure the reference never had to face at
    batch-of-one (demo.py)."""


class MicroBatcher:
    """Folds concurrent single-image requests into one batched device
    program.

    ``run_batched`` takes a [N, H, W, 3] uint8 array and returns the
    postprocessed (boxes, probs, classes, keep) arrays; ``submit(im)``
    blocks the calling handler thread until its image's row is back.
    Partial batches are padded with the first image (results of pad
    rows are dropped), so exactly one executable exists regardless of
    load.

    ``max_queue`` bounds the number of not-yet-grouped requests:
    beyond it, ``submit`` raises :class:`Overloaded` immediately
    (reject-on-overload keeps p99 of ACCEPTED requests bounded by
    ~(max_queue/batch + 1) device programs instead of growing with
    offered load).  0 = unbounded.
    """

    def __init__(self, run_batched, batch: int, window_ms: float,
                 max_queue: int = 0):
        import threading
        self._run = run_batched
        self.batch = batch
        self.window = window_ms / 1000.0
        self.max_queue = max_queue
        self._cv = threading.Condition()
        self._pending = []  # [(image, slot dict, event)]
        self.batches_run = 0
        self.requests = 0
        self.rejects = 0
        t = threading.Thread(target=self._worker, daemon=True)
        t.start()

    def submit(self, im):
        import threading
        ev = threading.Event()
        slot = {}
        with self._cv:
            if self.max_queue and len(self._pending) >= self.max_queue:
                self.rejects += 1
                raise Overloaded(
                    "micro-batch queue full ({} pending)".format(
                        len(self._pending)))
            self._pending.append((im, slot, ev))
            self.requests += 1
            self._cv.notify_all()
        if not ev.wait(timeout=120.0):
            raise TimeoutError("micro-batch worker stalled")
        if "error" in slot:
            raise slot["error"]
        return slot["out"]

    def _worker(self):
        import time as _time

        import numpy as np
        while True:
            with self._cv:
                while not self._pending:
                    self._cv.wait()
                deadline = _time.monotonic() + self.window
                while len(self._pending) < self.batch:
                    remaining = deadline - _time.monotonic()
                    if remaining <= 0 or not self._cv.wait(remaining):
                        break
                group = self._pending[:self.batch]
                del self._pending[:len(group)]
            imgs = np.stack([g[0] for g in group] +
                            [group[0][0]] * (self.batch - len(group)))
            try:
                outs = [np.asarray(o) for o in self._run(imgs)]
                for i, (_, slot, ev) in enumerate(group):
                    slot["out"] = tuple(o[i:i + 1] for o in outs)
                    ev.set()
            except Exception as e:  # surface to every waiting handler
                for _, slot, ev in group:
                    slot["error"] = e
                    ev.set()
            self.batches_run += 1


def _resolve_num_devices(args):
    """0 -> every visible device; validates batch divisibility."""
    import jax
    n = getattr(args, 'num_devices', 1)
    if n == 0:
        n = len(jax.devices())
    if n > 1 and args.max_batch % n:
        raise SystemExit(
            "--max_batch {} is not divisible by --num_devices {} — the "
            "micro-batch shards evenly over the mesh".format(
                args.max_batch, n))
    return n


def _build_from_checkpoint(args):
    import jax

    from squeezedet_tpu.config import config_for_net
    from squeezedet_tpu.models import get_model

    cfg = config_for_net(args.net).replace(
        batch_size=args.max_batch, load_pretrained_model=False,
        compute_dtype=args.compute_dtype)
    det = get_model(args.net, cfg)
    if args.checkpoint:
        from squeezedet_tpu.demo import load_params
        params = load_params(det, args.checkpoint)
    else:
        print("WARNING: no --checkpoint/--artifact; serving random init")
        params, _, _ = det.init(jax.random.key(0))
    quant_fn = None
    if args.quantize:
        assert args.quantize == 'int8', args.quantize
        assert args.calib_images, "--quantize needs --calib_images"
        from squeezedet_tpu.quant import calib_batch_from_images
        calib = calib_batch_from_images(
            args.calib_images, cfg.image_width, cfg.image_height)
        print("Quantizing (int8 PTQ, {} calibration frames)...".format(
            len(calib)))
        params = det.quantize(params, [calib],
                              percentile=args.calib_percentile)
        quant_fn = det.predict_quant_postprocessed
    meta = {"class_names": list(cfg.class_names),
            "image_height": cfg.image_height,
            "image_width": cfg.image_width,
            "plot_prob_thresh": cfg.plot_prob_thresh}

    n_dev = _resolve_num_devices(args)
    if n_dev > 1:
        # data-parallel serving: micro-batch sharded over a 1-D mesh,
        # params replicated, no collectives in the program (see
        # serving.mesh_inference_fn)
        from squeezedet_tpu.parallel.mesh import make_mesh
        from squeezedet_tpu.serving import mesh_inference_fn
        mesh = make_mesh(n_dev)
        fn, params_sh, input_sh = mesh_inference_fn(
            det, args.max_batch, mesh, fn=quant_fn)
        params = jax.device_put(params, params_sh)
        print("serving mesh: {} devices x batch {} "
              "({} rows/device)".format(n_dev, args.max_batch,
                                        args.max_batch // n_dev))
        return (lambda im: fn(params, jax.device_put(im, input_sh))), \
            meta

    # XLA-negotiated entry layout: same program jax.jit would build,
    # minus the in-program relayout copy of the uint8 frame
    from squeezedet_tpu.serving import negotiated_inference_fn
    fn, input_format = negotiated_inference_fn(det, args.max_batch,
                                               params, fn=quant_fn)
    # close over a device-resident copy: load_params returns host numpy
    # arrays, and handing those to the compiled fn would re-transfer the
    # full weight set on every request
    params = jax.device_put(params)
    return (lambda im: fn(params, jax.device_put(im, input_format))), \
        meta


def _build_from_artifact(path, max_batch: int = 1):
    from squeezedet_tpu.serving import load_exported

    fn, meta = load_exported(path)
    if not meta.get("postprocess", True):
        raise SystemExit("artifact was exported with --no_postprocess; "
                         "the server needs the postprocessed outputs")
    if meta.get("input_dtype", "uint8") != "uint8":
        raise SystemExit("artifact takes {} input; the server sends raw "
                         "uint8 frames — re-export without "
                         "--f32_input".format(meta["input_dtype"]))
    if meta.get("batch_size", 1) != max_batch:
        raise SystemExit("artifact was exported at batch_size={}; the "
                         "server runs the program at batch {} — "
                         "re-export with a matching --batch_size or "
                         "pass --max_batch {}".format(
                             meta["batch_size"], max_batch,
                             meta["batch_size"]))
    return fn, meta


def make_handler(run, meta, prob_thresh):
    """Build the request handler around a warm inference callable."""
    import http.server

    import cv2
    import numpy as np

    h, w = meta["image_height"], meta["image_width"]
    names = meta["class_names"]

    class Handler(http.server.BaseHTTPRequestHandler):
        def _reply(self, code, body, ctype="application/json",
                   headers=None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, b"ok", "text/plain")
            else:
                self._reply(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/detect":
                self._reply(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._reply(400, b'{"error": "bad Content-Length"}')
                return
            if length <= 0 or length > 64 * 1024 * 1024:
                self._reply(400, b'{"error": "body must be 1 byte to '
                                 b'64 MiB of image data"}')
                return
            raw = self.rfile.read(length)
            im = cv2.imdecode(np.frombuffer(raw, np.uint8),
                              cv2.IMREAD_COLOR)
            if im is None:
                self._reply(400, b'{"error": "undecodable image"}')
                return
            t0 = time.perf_counter()
            x_scale = im.shape[1] / float(w)
            y_scale = im.shape[0] / float(h)
            im = cv2.resize(im, (w, h))
            try:
                boxes, probs, classes, keep = [
                    np.asarray(o) for o in run(im[None])]
            except Overloaded:
                self._reply(503, b'{"error": "overloaded, retry later"}',
                            headers={"Retry-After": "1"})
                return
            dt = (time.perf_counter() - t0) * 1000
            dets = []
            for k in range(boxes.shape[1]):
                if not keep[0, k] or probs[0, k] < prob_thresh:
                    continue
                cx, cy, bw, bh = [float(v) for v in boxes[0, k]]
                dets.append({
                    "box": [cx * x_scale, cy * y_scale,
                            bw * x_scale, bh * y_scale],
                    "score": float(probs[0, k]),
                    "class_name": names[int(classes[0, k])],
                })
            self._reply(200, json.dumps(
                {"detections": dets,
                 "latency_ms": round(dt, 2)}).encode())

        def log_message(self, fmt, *a):  # quiet per-request chatter
            pass

    return Handler


def main(argv=None):
    import http.server

    import numpy as np

    args = build_arg_parser().parse_args(argv)
    assert args.max_batch >= 1, args.max_batch
    if args.artifact:
        if args.quantize:
            raise SystemExit(
                "--quantize does not apply to --artifact (an artifact "
                "bakes its program in at export time — use "
                "squeezedet-export --quantize int8 to build an int8 "
                "artifact)")
        if _resolve_num_devices(args) > 1:
            raise SystemExit(
                "--num_devices > 1 needs --checkpoint: a StableHLO "
                "artifact is a single-device program (shardings are a "
                "property of the jitted program, not the serialized "
                "HLO) — serve the checkpoint directly for data-parallel "
                "serving")
        run, meta = _build_from_artifact(args.artifact, args.max_batch)
    else:
        run, meta = _build_from_checkpoint(args)
    prob_thresh = args.prob_thresh if args.prob_thresh is not None \
        else meta.get("plot_prob_thresh", 0.4)

    # warm the compile before accepting traffic
    h, w = meta["image_height"], meta["image_width"]
    print("compiling {}x{} program (batch {})...".format(
        h, w, args.max_batch))
    import jax
    jax.block_until_ready(
        run(np.zeros((args.max_batch, h, w, 3), np.uint8)))

    if args.max_batch > 1:
        # concurrency path: handler threads park in the micro-batcher,
        # which folds them into one batch-N device program
        max_queue = args.max_queue if args.max_queue is not None \
            else 4 * args.max_batch
        batcher = MicroBatcher(run, args.max_batch,
                               args.batch_window_ms,
                               max_queue=max_queue)
        handler = make_handler(lambda im1: batcher.submit(im1[0]),
                               meta, prob_thresh)

        # The stdlib default accept backlog (5) resets connections
        # under burst overload BEFORE the handler can shed with a
        # clean 503 + Retry-After (measured: 47/384 raw conn_errors at
        # 64 concurrent clients).  Deep-enough listen queue lets every
        # request reach the app-level load policy.
        class _Server(http.server.ThreadingHTTPServer):
            request_queue_size = 128

        server = _Server((args.host, args.port), handler)
    else:
        server = http.server.HTTPServer(
            (args.host, args.port), make_handler(run, meta, prob_thresh))
    print("serving on http://{}:{}  (POST /detect, GET /healthz)".format(
        args.host, args.port))
    server.serve_forever()


if __name__ == '__main__':
    main()
