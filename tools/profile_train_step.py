"""Per-op roofline profiler for the training step.

Captures a ``jax.profiler`` trace of one scanned K-step train dispatch
(so per-dispatch host/transfer overhead amortizes out and the device
program dominates the trace), parses the xplane with
``tensorboard_plugin_profile``, and prints each HLO op category's
self-time per step next to the step total — the raw material for the
PARITY.md roofline tables (reference telemetry analog:
src/train.py:317-325 prints images/sec; this decomposes it).

Usage (on the TPU host):
    python tools/profile_train_step.py --batch_size 128 --k 3
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import tempfile

# tensorboard_plugin_profile ships pre-protoc-3.19 _pb2 files; the
# pure-python protobuf fallback must be selected before anything
# (jax/orbax/tf) first imports google.protobuf.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def capture(batch_size: int, k: int, net: str, compute_dtype: str,
            logdir: str, compiler_options=None,
            donate: bool = False, rng_impl: str = "",
            pallas_grads: str = "") -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from squeezedet_tpu.config import config_for_net
    from squeezedet_tpu.models import get_model
    from squeezedet_tpu.optim import build_optimizer
    from squeezedet_tpu.trainer import make_train_step_device_scan

    if pallas_grads:
        from squeezedet_tpu.models import layers
        layers.set_pallas_filter_grad(
            True if pallas_grads == "all" else pallas_grads)

    cfg = config_for_net(net).replace(
        load_pretrained_model=False, batch_size=batch_size,
        compute_dtype=compute_dtype)
    det = get_model(net, cfg)
    params, mask, _ = det.init(jax.random.key(0))
    det.set_trainable_mask(mask)
    tx = build_optimizer(cfg, mask)
    # uint8 ingest (the production feed) so the dispatch transfer over
    # a tunnel-attached host doesn't swamp the wall number
    step = make_train_step_device_scan(det, tx, k, donate=donate,
                                       uint8_ingest=True)

    rng = np.random.RandomState(0)
    g = 16
    images = jnp.asarray(rng.randint(
        0, 255, (k, batch_size, cfg.image_height, cfg.image_width, 3),
        dtype=np.uint8))
    gt = np.zeros((k, batch_size, g, 4), np.float32)
    gt[..., :3, :] = [[300, 200, 60, 40], [600, 100, 80, 60],
                      [900, 300, 50, 70]]
    labels = jnp.asarray(np.zeros((k, batch_size, g), np.int32))
    num_gt = jnp.asarray(np.full((k, batch_size), 3, np.int32))
    root = jax.random.key(1, impl=rng_impl) if rng_impl \
        else jax.random.key(1)
    keys = jax.random.split(root, k)
    opt0 = tx.init(params)
    host_p = jax.device_get(params)
    host_o = jax.device_get(opt0)

    def fresh_args():
        # donated params/opt-state are consumed per call; rebuild them
        return (jax.device_put(host_p), jax.device_put(host_o), images,
                jnp.asarray(gt), labels, num_gt, keys)

    args = fresh_args()
    if compiler_options:
        # TPU-backend flags can't go through client XLA_FLAGS when the
        # backend is a plugin (compilation happens behind the PJRT
        # boundary); jit's compiler_options reaches the real compiler.
        step = step.lower(*args).compile(
            compiler_options=compiler_options)
    out = step(*args)
    jax.block_until_ready(out)
    import time
    args = fresh_args()
    jax.block_until_ready(args)  # exclude arg transfer from the wall
    t0 = time.perf_counter()
    out = step(*args)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / k

    args = fresh_args()
    jax.profiler.start_trace(logdir)
    out = step(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return wall


def parse_op_stats(logdir: str):
    """Aggregate per-op device time (us) from the captured xplane.

    Reads the XSpace proto directly (the tensorboard_plugin_profile
    converter in this image predates TF 2.20's pywrap API): takes every
    TPU device plane, sums event durations per op name on the 'XLA Ops'
    line (op executions on one line don't overlap, so the sum is device
    busy time per op).
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.xplane.pb"))
    assert xplanes, "no xplane.pb under {}".format(logdir)
    totals = {}
    for path in xplanes:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name or "device" not in plane.name:
                continue
            meta = plane.event_metadata
            lines = [ln for ln in plane.lines if "XLA Ops" in ln.name] \
                or list(plane.lines)
            for ln in lines:
                if "XLA Ops" not in ln.name and len(lines) > 1:
                    continue
                # flame-graph SELF time: control-flow ops (the scan
                # while, conditionals) enclose their body ops on the
                # same line; summing raw durations would double-count.
                # Events sorted by (start, -duration) nest properly: a
                # stack walk attributes each op its duration minus its
                # direct children's.
                evs = sorted(((ev.offset_ps, -ev.duration_ps,
                               meta[ev.metadata_id].name)
                              for ev in ln.events))
                stack = []  # [end_ps, name, child_total_ps]

                def pop_into_totals():
                    end, name, child = stack.pop()
                    dur = end - stack_start.pop()
                    totals[name] = totals.get(name, 0.0) \
                        + (dur - child) / 1e6
                    if stack:
                        stack[-1][2] += dur

                stack_start = []
                for off, negdur, name in evs:
                    dur = -negdur
                    while stack and off >= stack[-1][0]:
                        pop_into_totals()
                    stack.append([off + dur, name, 0])
                    stack_start.append(off)
                while stack:
                    pop_into_totals()
    rows = [{"operation": n, "total_self_time_us": t}
            for n, t in totals.items()]
    return rows, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--net", default="squeezeDet")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--logdir", default="")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep_raw", action="store_true",
                    help="print the raw tool payload instead of a table")
    ap.add_argument("--compiler_option", action="append", default=[],
                    help="key=value TPU compiler option (repeatable), "
                         "e.g. xla_tpu_scoped_vmem_limit_kib=65536")
    ap.add_argument("--donate", action="store_true",
                    help="donate params/opt-state buffers (the "
                         "production train-loop configuration)")
    ap.add_argument("--rng_impl", default="",
                    help="PRNG implementation for the step keys "
                         "(e.g. rbg) — dropout bit generation shows up "
                         "in the profile under threefry")
    ap.add_argument("--pallas_grads", default="",
                    choices=["", "1x1", "all"],
                    help="route eligible filter grads through the "
                         "Pallas backward kernel (ops/filter_grad.py); "
                         "'1x1' = reshape-only frames, 'all' = also "
                         "3x3/5x5 (measured net loss)")
    args = ap.parse_args()

    opts = dict(kv.split("=", 1) for kv in args.compiler_option)
    logdir = args.logdir or tempfile.mkdtemp(prefix="sdprof_")
    wall = capture(args.batch_size, args.k, args.net, args.dtype, logdir,
                   compiler_options=opts or None, donate=args.donate,
                   rng_impl=args.rng_impl, pallas_grads=args.pallas_grads)
    print("wall per step: {:.2f} ms  ({:.1f} img/s)".format(
        wall * 1000, args.batch_size / wall))

    rows, raw = parse_op_stats(logdir)
    if args.keep_raw or rows is None:
        # fall back: dump raw payload for manual inspection
        out = os.path.join(logdir, "op_stats.json")
        with open(out, "w") as f:
            f.write(raw if isinstance(raw, str) else str(raw))
        print("raw op stats written to", out)
        return
    print("{:<60s} {:>12s} {:>8s}".format("op", "self us/step", "%"))
    total = sum(float(r.get("total_self_time_us", r.get(
        "self_time_us", 0))) for r in rows)
    for r in sorted(rows, key=lambda r: -float(
            r.get("total_self_time_us", r.get("self_time_us", 0))))[
                :args.top]:
        t = float(r.get("total_self_time_us",
                        r.get("self_time_us", 0))) / args.k
        name = r.get("operation", r.get("op_name", "?"))[:60]
        print("{:<60s} {:>12.1f} {:>7.1f}%".format(
            name, t, 100 * t * args.k / max(total, 1e-9)))
    print("trace dir:", logdir)


if __name__ == "__main__":
    main()
