"""Unit tests for the dual-gate acceptance logic in
scripts/scaling_protocol.py (round-4: bandwidth ratio alone proved
insufficient — a run passed BW 3.98/4.04 yet measured 0.638 efficiency
under CPU steal, so acceptance now also requires compute-ratio and
compute-stability gates). Pure python — no Spark, no probes."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.scaling_protocol import gates_ok


def _reading(label, bw1=10.0, bw4=40.0, cpu1=5000.0, cpu4=20000.0):
    return {
        "label": label,
        "bw": {"1": bw1, "4": bw4, "ratio": round(bw4 / bw1, 2)},
        "cpu": {"1": cpu1, "4": cpu4, "ratio": round(cpu4 / cpu1, 2)},
    }


def test_clean_window_accepted():
    ok, why = gates_ok([_reading("pre"), _reading("mid"), _reading("post")], 3.5)
    assert ok and why == ""


def test_bandwidth_ratio_rejects():
    readings = [_reading("pre"), _reading("mid", bw4=30.0), _reading("post")]
    ok, why = gates_ok(readings, 3.5)
    assert not ok and why.startswith("bw_ratio_mid")


def test_cpu_ratio_rejects_steal_window():
    # the exact round-4 failure shape: bandwidth fine, compute capped
    readings = [_reading("pre"), _reading("post", cpu4=12000.0)]
    ok, why = gates_ok(readings, 3.5)
    assert not ok and why.startswith("cpu_ratio_post")


def test_cpu_instability_rejects_even_when_ratios_pass():
    # both levels pass every ratio, but the 1-proc series drifts 1.3x
    # between readings: the two levels did not see the same host
    readings = [
        _reading("pre", cpu1=5000.0, cpu4=20000.0),
        _reading("mid", cpu1=6500.0, cpu4=26000.0),
        _reading("post", cpu1=5000.0, cpu4=20000.0),
    ]
    ok, why = gates_ok(readings, 3.5)
    assert not ok and why.startswith("cpu1_unstable")


def test_instability_gate_is_symmetric():
    # drift that would INFLATE efficiency is rejected the same way
    readings = [
        _reading("pre", cpu4=20000.0),
        _reading("post", cpu4=26000.0),
    ]
    ok, why = gates_ok(readings, 3.5)
    assert not ok and why.startswith("cpu4_unstable")


def test_boundary_values_accepted():
    # ratio exactly at the gate and drift exactly at 1.15 both pass
    readings = [
        _reading("pre", bw4=35.0, cpu1=5000.0, cpu4=17500.0),
        _reading("post", bw4=35.0, cpu1=5000.0, cpu4=17500.0 * 1.15),
    ]
    ok, why = gates_ok(readings, 3.5)
    assert ok, why
