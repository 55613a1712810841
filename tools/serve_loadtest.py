"""Load-test a running ``squeezedet-serve`` endpoint.

N concurrent clients each fire sequential POST /detect requests;
prints one JSON summary line with the status-code mix and the latency
distribution of ACCEPTED (200) requests — the measurement behind
PARITY.md's serving tail-latency table (VERDICT r3 item 8).  503s
count as shed load, not failures: with ``--max_queue`` bounding the
micro-batch queue, p99 of accepted requests stays ~flat as offered
load grows past capacity.

Usage:
    squeezedet-serve --max_batch 8 --port 8752 &     # on the TPU host
    python tools/serve_loadtest.py --url http://127.0.0.1:8752 \
        --clients 16 --requests 20 --width 1242 --height 375
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.error
import urllib.request


def run_load(url: str, clients: int, requests_per_client: int,
             body: bytes, timeout: float = 300.0) -> dict:
    latencies = []  # accepted only
    codes: dict = {}
    lock = threading.Lock()

    def client():
        for _ in range(requests_per_client):
            req = urllib.request.Request(url + "/detect", data=body,
                                         method="POST")
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=timeout) as r:
                    code = r.status
                    r.read()
            except urllib.error.HTTPError as e:
                code = e.code
            except (urllib.error.URLError, OSError):
                # resets/refusals under overload must not kill the
                # client thread (the divisor is clients*requests)
                code = "conn_error"
            dt = time.perf_counter() - t0
            with lock:
                codes[code] = codes.get(code, 0) + 1
                if code == 200:
                    latencies.append(dt)

    threads = [threading.Thread(target=client) for _ in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    latencies.sort()

    def pct(p):
        if not latencies:
            return None
        i = min(len(latencies) - 1, int(round(p / 100.0 *
                                              (len(latencies) - 1))))
        return round(latencies[i] * 1000, 2)

    total = clients * requests_per_client
    return {
        "clients": clients,
        "requests": total,
        "status_codes": codes,
        "accepted": len(latencies),
        "shed_pct": round(100.0 * codes.get(503, 0) / total, 1),
        "accepted_qps": round(len(latencies) / wall, 1),
        "latency_ms": {"p50": pct(50), "p95": pct(95), "p99": pct(99),
                       "max": pct(100)},
        "wall_s": round(wall, 2),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8752")
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=20,
                    help="requests per client")
    ap.add_argument("--image", default="",
                    help="image file to post (default: random noise at "
                         "--width x --height)")
    ap.add_argument("--width", type=int, default=1242)
    ap.add_argument("--height", type=int, default=375)
    args = ap.parse_args(argv)

    if args.image:
        with open(args.image, "rb") as f:
            body = f.read()
    else:
        import cv2
        import numpy as np
        rng = np.random.RandomState(0)
        body = cv2.imencode(".png", rng.randint(
            0, 255, (args.height, args.width, 3), np.uint8))[1].tobytes()

    # one warm request so compile/startup never lands in the measured set
    urllib.request.urlopen(urllib.request.Request(
        args.url + "/detect", data=body, method="POST"), timeout=600).read()
    print(json.dumps(run_load(args.url, args.clients, args.requests,
                              body)))


if __name__ == "__main__":
    main()
