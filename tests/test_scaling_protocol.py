"""Unit tests for the acceptance logic in scripts/scaling_protocol.py.

v2 history: bandwidth ratio alone proved insufficient (a run passed BW
3.98/4.04 yet measured 0.638 efficiency under CPU steal), so a compute
ratio gate was added; v2 also rejected on cpu-series drift > 1.15 across
an attempt, which rejected 5/5 attempts in a 2.7 h window because this
host genuinely drifts 1.4-1.6x in 12 minutes. v3 gates on the MEDIAN
reading (with a 0.9x-gate floor per reading, so genuine steal windows
still reject) and replaces the stability reject with counterbalanced
ABBA runs + min-per-level + a directional fairness check on the CHOSEN
runs' host windows (window_speed). Pure python — no Spark, no probes."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.scaling_protocol import gates_ok, window_speed


def _reading(label, bw1=10.0, bw4=40.0, cpu1=5000.0, cpu4=20000.0):
    return {
        "label": label,
        "bw": {"1": bw1, "4": bw4, "ratio": round(bw4 / bw1, 2)},
        "cpu": {"1": cpu1, "4": cpu4, "ratio": round(cpu4 / cpu1, 2)},
    }


def test_clean_window_accepted():
    ok, why = gates_ok([_reading("pre"), _reading("mid"), _reading("post")], 3.5)
    assert ok and why == ""


def test_bandwidth_floor_rejects_real_steal_dip():
    # one reading at 3.0 (< 0.9 x 3.5 = 3.15): a real contended window,
    # rejected even though the median (4.0) clears the gate
    readings = [_reading("pre"), _reading("mid", bw4=30.0), _reading("post")]
    ok, why = gates_ok(readings, 3.5)
    assert not ok and why.startswith("bw_ratio_min")


def test_bandwidth_median_rejects_degraded_window():
    # most readings below gate -> the whole window is non-linear
    readings = [_reading("pre", bw4=33.0), _reading("mid", bw4=33.0), _reading("post")]
    ok, why = gates_ok(readings, 3.5)
    assert not ok and why.startswith("bw_ratio_median")


def test_cpu_ratio_rejects_steal_window():
    # the exact round-4 failure shape: bandwidth fine, compute capped
    readings = [_reading("pre"), _reading("post", cpu4=12000.0)]
    ok, why = gates_ok(readings, 3.5)
    assert not ok and why.startswith("cpu_ratio_min")


def test_single_probe_jitter_dip_tolerated():
    # the v2 failure mode that killed whole attempts: one cpu reading at
    # 3.34 (probe jitter against a 4.0+ typical) while every other
    # reading is clean -> v3 accepts (median 4.0, floor 3.15 < 3.34)
    readings = [
        _reading("pre"),
        _reading("r1"),
        _reading("r2", cpu4=16700.0),  # ratio 3.34
        _reading("r3"),
        _reading("r4"),
    ]
    ok, why = gates_ok(readings, 3.5)
    assert ok, why


def test_drift_alone_no_longer_rejects_when_ratios_hold():
    # v3: proportional drift (cpu1 AND cpu4 move together, ratios stay
    # >= gate) passes the hard gate — fairness of the CHOSEN runs'
    # windows is judged separately by window_speed in the main loop
    readings = [
        _reading("pre", cpu1=5000.0, cpu4=20000.0),
        _reading("mid", cpu1=6500.0, cpu4=26000.0),
        _reading("post", cpu1=5000.0, cpu4=20000.0),
    ]
    ok, why = gates_ok(readings, 3.5)
    assert ok, why


def test_boundary_ratio_accepted():
    readings = [
        _reading("pre", bw4=35.0, cpu1=5000.0, cpu4=17500.0),
        _reading("post", bw4=35.0, cpu1=5000.0, cpu4=17500.0),
    ]
    ok, why = gates_ok(readings, 3.5)
    assert ok, why


def test_window_speed_brackets_the_run():
    # ABBA readings list: [pre, r1, r2, r3, r4]; run i sits between
    # readings[i] and readings[i+1]
    readings = [
        _reading("pre", cpu1=5000.0),
        _reading("r1", cpu1=6000.0),
        _reading("r2", cpu1=7000.0),
        _reading("r3", cpu1=6000.0),
        _reading("r4", cpu1=5000.0),
    ]
    assert window_speed(readings, 0) == 5500.0  # first lo run
    assert window_speed(readings, 1) == 6500.0  # first hi run
    assert window_speed(readings, 2) == 6500.0  # second hi run
    assert window_speed(readings, 3) == 5500.0  # second lo run


def test_fairness_directionality():
    # mirrors the main-loop decision: lo window faster -> efficiency
    # understated -> acceptable as lower bound iff eff >= 0.8;
    # lo window slower -> efficiency inflated -> must reject
    speed_lo, speed_hi, band = 6500.0, 5000.0, 1.2
    assert max(speed_lo, speed_hi) / min(speed_lo, speed_hi) > band
    assert speed_lo > speed_hi  # deflating direction -> lower bound ok
    speed_lo, speed_hi = 5000.0, 6500.0
    assert not (speed_lo > speed_hi)  # inflating direction -> reject
