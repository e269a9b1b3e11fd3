"""Device-resolved performance parameters and the VMEM shrink-retry path
(reference analogue: ``nufhe/performance.py:137-230`` and the
``OutOfResourcesError`` loops in ``blind_rotate.py:143-187``)."""

import os

import numpy as np
import pytest

import nufhe_tpu as nf
from nufhe_tpu.ops.bootstrap import lane_tile_for
from nufhe_tpu.models import gates as g


def test_lane_tile_tracks_vmem_budget():
    # 128 MB-class cores run 1024-lane tiles on the exact PER-STEP
    # kernel; the leaner rounded-key engine and (since round 5) the
    # chunked exact kernel — whose accumulator input stays in HBM —
    # fit 2048; 16 MB-class cores drop to 128
    assert lane_tile_for(16384, 120) == 1024
    assert lane_tile_for(16384, 120, exact=False) == 2048
    assert lane_tile_for(16384, 120, chunked=True) == 2048
    assert lane_tile_for(16384, 40) == 512
    assert lane_tile_for(16384, 16) == 128
    assert lane_tile_for(256, 120) == 256     # tile never exceeds the batch
    assert lane_tile_for(64, 120) == 128      # floor


def test_vmem_oom_matcher_against_real_mosaic_message():
    """The shrink-retry trigger is pinned against a REAL captured
    XLA:TPU/Mosaic out-of-VMEM message (tools/capture_oom.py on v5e:
    the exact engine at lane tile 2048), not a fabricated string — a
    toolchain message change must fail THIS test, not silently convert
    OOM-retry into a hard failure."""
    path = os.path.join(os.path.dirname(__file__), "data",
                        "mosaic_oom_message.txt")
    text = open(path).read()
    assert "Ran out of memory in memory space vmem" in text  # provenance
    assert g._looks_like_vmem_oom(RuntimeError(text))
    assert not g._looks_like_vmem_oom(RuntimeError("unrelated failure"))


def test_perf_params_resolve_vmem(monkeypatch):
    class FakeDev:
        platform = "tpu"
        device_kind = "TPU v3"
        id = 0

    p = nf.PerformanceParameters().for_device(FakeDev())
    assert p.vmem_limit_mb == 8               # 16 MB kind minus headroom
    monkeypatch.setenv("NUFHE_TPU_VMEM_MB", "64")
    p2 = nf.PerformanceParameters().for_device(FakeDev())
    assert p2.vmem_limit_mb == 56
    p3 = nf.PerformanceParameters(vmem_mb=128).for_device(FakeDev())
    assert p3.vmem_limit_mb == 120


def test_vmem_fallback_shrinks_and_remembers():
    g._WORKING_TILE.clear()
    attempts = []

    def run(tile):
        attempts.append(tile)
        if tile is None or tile > 256:
            raise RuntimeError("RESOURCE_EXHAUSTED: ran out of VMEM")
        return "ok-%s" % tile

    assert g._run_with_vmem_fallback(run, None, 4096) == "ok-256"
    assert attempts == [None, 1024, 512, 256]
    # the working tile is remembered: next call goes straight there
    attempts.clear()
    assert g._run_with_vmem_fallback(run, None, 4096) == "ok-256"
    assert attempts == [256]


def test_vmem_fallback_propagates_other_errors():
    def run(tile):
        raise ValueError("unrelated failure")

    with pytest.raises(ValueError, match="unrelated"):
        g._run_with_vmem_fallback(run, None, 128)


def test_interactive_device_selection(monkeypatch):
    candidates = nf.find_devices()
    if len(candidates) < 1:
        pytest.skip("no devices")
    many = candidates * 3
    answers = iter(["bogus", "99", "2"])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(answers))
    chosen = nf.Context._ask_device(many)
    assert chosen is many[2]
