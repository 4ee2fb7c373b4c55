"""Scaling-efficiency evidence: the same dedup pipeline, same input, at two
parallelism levels (8 vs 32 CPUs — the sandbox proxy for N vs 4N executors,
per BASELINE.md "Target baseline").

Each configuration runs in a fresh subprocess (one JVM can't change master)
PINNED to its CPU budget with ``taskset -c``: plain ``local[8]`` on a 32-core
box is NOT an 8-core run — the 8 task slots happily borrow the other 24 cores
for Python workers, GC threads, and shuffle writeback (measured: unpinned
local[8] beat local[32] outright). Pinning bounds the whole process tree —
JVM, Python workers, GC — to N CPUs, which is what an N-core executor
actually provides.

Prints one JSON line:
  {"n_clips":..., "sec_8":..., "sec_32":..., "clips_per_sec_8":...,
   "clips_per_sec_32":..., "scaling_efficiency":...}

efficiency = (T_8 / T_32) / 4  — 1.0 = perfect linear scaling.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_one(cpus: int, n_clips: int) -> float:
    code = f"""
import os, sys, time
sys.path.insert(0, "{REPO}")
# pre-touch the heap at JVM start (outside the timed runs) — heap growth
# during run 1 pays first-touch fault stalls under host allocation pressure
os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
from file_deduplicator_spark.session import get_spark
from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.plans.pipeline import dedup_pipeline

spark = get_spark(master="local[{cpus}]", shuffle_partitions={cpus})
clips = spark.read.parquet("{REPO}/.cache/clips_n{n_clips}_s42/clips.parquet")
clips.count()  # warm file listing
import os
from file_deduplicator_spark.plans.pipeline import release_pipeline
# steady-state methodology (same rationale as bench.py): one pilot pass
# over a small fixture first so the timed runs measure per-clip cost, not
# the ~20-50s of one-time JVM JIT — which would otherwise dominate the
# SMALLER-core level less than the larger one and corrupt the ratio
if os.environ.get("SPARK_GRAFT_WARMUP", "1") != "0":
    _p = dedup_pipeline(
        spark.read.parquet("{REPO}/.cache/clips_n2000_s42/clips.parquet"),
        DedupConfig())
    _p["report"].collect(); _p["clustered"].count(); release_pipeline(_p)
best = None
runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))
for i in range(runs):  # min over runs damps writeback/JIT variance
    t0 = time.perf_counter()
    res = dedup_pipeline(clips, DedupConfig())
    res["report"].collect()
    res["clustered"].count()
    dt = time.perf_counter() - t0
    release_pipeline(res)
    best = dt if best is None else min(best, dt)
print("ELAPSED", best)
"""
    # settle: flush dirty pages from the previous run so its writeback
    # doesn't bleed into this measurement
    subprocess.run(["sync"], timeout=600)
    time.sleep(5)
    cmd = [sys.executable, "-c", code]
    import shutil as _sh

    if _sh.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("ELAPSED"):
            return float(line.split()[1])
    raise RuntimeError(f"run failed (cpus={cpus}):\n{out.stderr[-2000:]}")


def main() -> None:
    # 200k clips (~5 GB) by default: at 50k the pipeline is ~10 s of fixed
    # job/scheduling overhead over ~100 core-seconds of work, so the
    # efficiency ratio measures the SCHEDULER, not the engine. 200k puts
    # >500 core-seconds of parallel work behind the same overhead — the
    # regime the north rule's two-cluster-size criterion is about.
    n_clips = int(os.environ.get("SPARK_GRAFT_SCALE_CLIPS", "200000"))
    lo, hi = (
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "8,32").split(",")
    )
    from bench import ensure_clips  # noqa: E402

    sys.path.insert(0, str(REPO))
    ensure_clips(n_clips)
    ensure_clips(2_000)  # pilot fixture for the in-JVM warm-up pass
    sec_lo = run_one(lo, n_clips)
    sec_hi = run_one(hi, n_clips)
    eff = (sec_lo / sec_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "n_clips": n_clips,
                "levels": [lo, hi],
                f"sec_{lo}": round(sec_lo, 1),
                f"sec_{hi}": round(sec_hi, 1),
                f"clips_per_sec_{lo}": round(n_clips / sec_lo, 1),
                f"clips_per_sec_{hi}": round(n_clips / sec_hi, 1),
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    main()
