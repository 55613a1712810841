"""Tests for tools/collective_audit.py — the HLO collective-traffic
auditor behind the multi-chip communication analysis (PARITY.md)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from collective_audit import _shape_bytes, audit_hlo, lower_train_step


def test_shape_bytes():
    assert _shape_bytes("f32[2,3]") == 24
    assert _shape_bytes("bf16[128]") == 256
    assert _shape_bytes("(f32[4], u8[8])") == 24
    assert _shape_bytes("pred[]") == 1  # scalar: empty dims = 1 element
    assert _shape_bytes("token[]") == 0  # unknown dtype ignored


def test_audit_hlo_finds_collectives():
    hlo = """
  %ar = f32[100,2]{1,0} all-reduce(f32[100,2] %x), replica_groups={}
  %cp = bf16[8,16]{1,0} collective-permute(bf16[8,16] %y)
  %noise = f32[4]{0} add(f32[4] %a, f32[4] %b)
  %ag = (f32[32], f32[32]) all-gather(f32[4] %z), dimensions={0}
"""
    found = audit_hlo(hlo)
    assert len(found["all-reduce"]) == 1
    assert found["all-reduce"][0][0] == 800
    assert len(found["collective-permute"]) == 1
    assert found["collective-permute"][0][0] == 256
    assert len(found["all-gather"]) == 1
    assert found["all-gather"][0][0] == 256
    assert "all-to-all" not in found


def test_train_step_collectives_on_meshes():
    """The real lowered train step carries exactly the expected
    communication: gradient all-reduces on the 1-D data mesh, plus
    halo collective-permutes (and no giant all-gathers of activations)
    when the spatial axis is on."""
    hlo_dp, mesh, _ = lower_train_step(8, 1, full_res=False)
    found = audit_hlo(hlo_dp)
    assert found["all-reduce"], "data-parallel step must psum gradients"
    assert not found.get("collective-permute"), \
        "1-D data parallelism needs no halo exchanges"

    hlo_sp, mesh, _ = lower_train_step(8, 4, full_res=False)
    found_sp = audit_hlo(hlo_sp)
    assert found_sp["all-reduce"]
    assert found_sp["collective-permute"], \
        "spatial sharding must lower to halo collective-permutes"


def test_sharded_device_dataset_step_is_collective_free_on_canvas_path():
    """The mesh-sharded HBM-dataset step must put EXACTLY the plain
    data-parallel step's collectives on the wire (the gradient psum):
    the canvas gather is shard-local by construction, so sharding the
    dataset adds zero ICI bytes — the audit proves 'N chips hold N× the
    dataset' costs nothing per step."""
    hlo_dp, _, _ = lower_train_step(8, 1, full_res=False)
    hlo_ds, _, _ = lower_train_step(8, 1, full_res=False,
                                    device_dataset=True)
    found_dp = audit_hlo(hlo_dp)
    found_ds = audit_hlo(hlo_ds)
    assert found_ds["all-reduce"], "gradient psum must survive"
    for kind in ("all-gather", "collective-permute", "all-to-all",
                 "reduce-scatter"):
        assert not found_ds.get(kind), (kind, found_ds.get(kind))
    # same collective inventory (kind -> count) as plain DP
    assert {k: len(v) for k, v in found_ds.items()} == \
        {k: len(v) for k, v in found_dp.items()}
