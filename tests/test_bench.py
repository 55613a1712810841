"""bench.py driver contract: one JSON line, sane fields.

The driver runs ``python bench.py`` on real TPU hardware at the
flagship geometry; this hermetic smoke pins the harness itself (config
plumbing, quant path, JSON contract) at a tiny geometry on CPU.
"""

import json
import subprocess
import sys

import pytest


def _run(args):
    # --platform cpu pins via jax.config.update inside bench.py — the
    # JAX_PLATFORMS env var is not reliable on the plugin backend and
    # can hang against a wedged tunnel (CLAUDE.md)
    r = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--init_probe_timeout",
         "0", "--platform", "cpu", "--image_width", "96",
         "--image_height", "64", "--batch_size", "2", "--iters", "2"]
        + args,
        capture_output=True, text=True, timeout=1200,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root"})
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line)


@pytest.mark.slow
@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_bench_inference_contract(dtype):
    out = _run(["--dtype", dtype])
    assert out["metric"] == "images_per_sec_per_chip"
    assert out["value"] > 0
    assert out["unit"] == "img/s"
    # both fields are independently rounded (value to 0.1 -> 2.5e-5
    # after /2000, ratio to 1e-3 -> 5e-4; worst case 5.25e-4)
    assert out["vs_baseline"] == pytest.approx(out["value"] / 2000.0,
                                               abs=5.3e-4)
    d = out["detail"]
    assert d["resolution"] == [64, 96]
    assert d["compute_dtype"] == dtype
    assert d["includes_postprocess"] is True


def test_bench_rejects_int8_outside_inference():
    r = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--mode", "train",
         "--dtype", "int8"],
        capture_output=True, text=True, timeout=120)
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["value"] == 0 and "int8" in out["error"]
