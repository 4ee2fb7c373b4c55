"""Probe-GATED scaling-efficiency protocol (round-4 directive 4).

Round-3 evidence (SCALING.json round3_repeat_runs_1_to_4): identical code
measured 1→4-core efficiency 0.92 / 0.78 / 0.77 / 0.58 across same-day
repeats, tracking the host's bandwidth windows — in bad windows the VM
gives 4 pinned procs only ~2.5x of 1 proc's streaming bandwidth, so the
run measures the HOST, not the engine. The criterion (≥0.8 from N to 4N)
assumes the linear-resource regime that real added cluster NODES provide
(each brings its own memory channels and cores).

Round-4 addition: bandwidth alone is not enough. A 500k attempt passed the
BW gate cleanly (ratios 3.98 pre / 4.04 post) yet measured 0.638 — the
4-core level ran 63% slower than an equal-bandwidth window minutes
earlier: CPU steal, invisible to a streaming probe. The protocol therefore
gates on BOTH probes — scripts/membw_probe.py (streaming GB/s) and
scripts/cpu_probe.py (cache-resident compute iters/s) — read at 1 and 4
procs BEFORE the 1-core level, BETWEEN the levels, and AFTER the 4-core
level. A measurement is ACCEPTED only if

  * every reading shows ratio(4-proc/1-proc) ≥ gate (default 3.5), and
  * the 4-proc compute readings are stable across pre/mid/post
    (max/min ≤ 1.15) — both LEVELS must have seen the same host.

Rejected windows are recorded with all readings, never silently retried.
Repeats until ``SPARK_GRAFT_ACCEPT_TARGET`` accepted runs (default 2) or
``SPARK_GRAFT_MAX_ATTEMPTS`` (default 8) attempts.

Input size note: at 200k clips the pipeline's ~20s of non-parallelizable
fixed cost (job scheduling, driver-side CC, action setup) caps 1→4
efficiency near 0.8 by Amdahl alone (measured: accepted clean-window runs
0.823 / 0.759); the criterion default is therefore 500k clips, where the
same fixed cost dilutes to ~0.9 expected.

Prints one JSON line: {"attempts": [...], "accepted": [...], ...}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _probe_once(script: str, n_procs: int) -> float:
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), str(n_procs)],
        capture_output=True, text=True, timeout=120,
    ).stdout
    return float(out.strip().split()[-2])


def _probe(script: str, n_procs: int) -> float:
    """Median of 3 back-to-back probe runs.

    Measured (round 4, quiet window): six back-to-back 1-proc cpu_probe
    runs spread 6699-7214 iters/s (max/min 1.077) — a single 2-second
    reading carries ~8% scheduler noise, which alone consumes half the
    1.15 stability band and rejects genuinely-stable windows. Median-of-3
    cuts the per-reading noise so the stability gate measures actual host
    drift between the two pipeline levels, not probe jitter.
    """
    return sorted(_probe_once(script, n_procs) for _ in range(3))[1]


def read_host(label: str) -> dict:
    """One full host reading: bandwidth + compute at 1 and 4 procs."""
    bw1 = _probe("membw_probe.py", 1)
    bw4 = _probe("membw_probe.py", 4)
    cpu1 = _probe("cpu_probe.py", 1)
    cpu4 = _probe("cpu_probe.py", 4)
    return {
        "label": label,
        "bw": {"1": round(bw1, 1), "4": round(bw4, 1), "ratio": round(bw4 / bw1, 2)},
        "cpu": {"1": round(cpu1, 0), "4": round(cpu4, 0), "ratio": round(cpu4 / cpu1, 2)},
    }


def gates_ok(readings: list[dict], gate: float) -> tuple[bool, str]:
    for r in readings:
        if r["bw"]["ratio"] < gate:
            return False, f"bw_ratio_{r['label']}={r['bw']['ratio']}"
        if r["cpu"]["ratio"] < gate:
            return False, f"cpu_ratio_{r['label']}={r['cpu']['ratio']}"
    # BOTH compute series must be stable across pre/mid/post: the two
    # levels must have seen the same host. (First dual-gate run: cpu1
    # drifted 1.29x between levels while cpu4 stayed within 1.11x — the
    # level pair was not comparable, measured 0.791 vs 0.919 in a stable
    # window.) Symmetric: drift that would inflate efficiency is rejected
    # the same as drift that deflates it.
    for series in ("1", "4"):
        vals = [r["cpu"][series] for r in readings]
        if max(vals) / min(vals) > 1.15:
            return False, f"cpu{series}_unstable={[round(v) for v in vals]}"
    return True, ""


def main() -> None:
    from scripts.scaling_bench import run_one  # pinned-subprocess runner

    n_clips = int(os.environ.get("SPARK_GRAFT_SCALE_CLIPS", "500000"))
    lo, hi = (
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "1,4").split(",")
    )
    gate = float(os.environ.get("SPARK_GRAFT_BW_GATE", "3.5"))
    target = int(os.environ.get("SPARK_GRAFT_ACCEPT_TARGET", "2"))
    max_attempts = int(os.environ.get("SPARK_GRAFT_MAX_ATTEMPTS", "8"))

    from bench import ensure_clips

    ensure_clips(n_clips)
    ensure_clips(2_000)

    attempts: list[dict] = []
    accepted: list[dict] = []
    while len(accepted) < target and len(attempts) < max_attempts:
        pre = read_host("pre")
        rec: dict = {"readings": [pre]}
        ok, why = gates_ok([pre], gate)
        if not ok:
            rec["status"] = "rejected_pre_gate"
            rec["reason"] = why
            attempts.append(rec)
            print(json.dumps({"attempt": rec}), flush=True)
            time.sleep(60)  # wait out the contended window
            continue
        sec_lo = run_one(lo, n_clips)
        mid = read_host("mid")
        rec["readings"].append(mid)
        sec_hi = run_one(hi, n_clips)
        post = read_host("post")
        rec["readings"].append(post)
        eff = (sec_lo / sec_hi) / (hi / lo)
        rec.update(
            {
                f"sec_{lo}": round(sec_lo, 1),
                f"sec_{hi}": round(sec_hi, 1),
                f"clips_per_sec_{lo}": round(n_clips / sec_lo, 1),
                f"clips_per_sec_{hi}": round(n_clips / sec_hi, 1),
                "scaling_efficiency": round(eff, 3),
            }
        )
        ok, why = gates_ok(rec["readings"], gate)
        if ok:
            rec["status"] = "accepted"
            accepted.append(rec)
        else:
            rec["status"] = "rejected_gate"
            rec["reason"] = why
        attempts.append(rec)
        print(json.dumps({"attempt": rec}), flush=True)

    print(
        json.dumps(
            {
                "n_clips": n_clips,
                "levels": [lo, hi],
                "gate": gate,
                "attempts": attempts,
                "accepted": [a["scaling_efficiency"] for a in accepted],
                "all_accepted_ge_0.8": bool(accepted)
                and all(a["scaling_efficiency"] >= 0.8 for a in accepted),
            }
        )
    )


if __name__ == "__main__":
    main()
