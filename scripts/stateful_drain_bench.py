"""Stateful-tier drain benchmark (round-4 directive: cut the state-store
cost; done = >= 3,000 clips/s on the same 200k drain with alert recall
unchanged).

One availableNow drain of the deterministic .cache clips fixture through
streaming/stateful.start_stateful_watch, timed, with alert volume and
distinct verified pair counts per modality. Round-4 baseline of record
(SCALING.json round4_stateful_tier_drain_200k, audio-only, unsharded):
199,002 clips in 191.2 s = 1,041 clips/s, 108,890 distinct pairs.

    python scripts/stateful_drain_bench.py [n_clips] [modalities] [shard_bits]

modalities: comma list, default audio,exact,text ("audio" reproduces the
round-4 recall comparison). Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    modalities = tuple(
        (sys.argv[2] if len(sys.argv) > 2 else "audio,exact,text").split(","))
    shard_bits = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    from pyspark.sql import functions as F

    from bench import cpu_probe, ensure_clips, membw_probe
    from file_deduplicator_spark.session import get_spark
    from file_deduplicator_spark.streaming.stateful import start_stateful_watch

    fixture = ensure_clips(n_clips)
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    work = Path(tempfile.mkdtemp(prefix="drain_bench_"))
    try:
        inp, out = work / "in", work / "out"
        # the file stream wants exactly CLIPS_SCHEMA columns
        (spark.read.parquet(str(fixture / "clips.parquet"))
         .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
         .write.parquet(str(inp)))

        bw0, cpu0 = membw_probe(), cpu_probe()
        t0 = time.perf_counter()
        q = start_stateful_watch(
            spark, inp, out, modalities=modalities, shard_bits=shard_bits)
        q.awaitTermination()
        wall = time.perf_counter() - t0
        bw1, cpu1 = membw_probe(), cpu_probe()

        alerts = spark.read.parquet(str(out / "alerts"))
        n_alerts = alerts.count()
        by_kind = {
            r["kind"]: (r["alerts"], r["pairs"])
            for r in alerts.groupBy("kind").agg(
                F.count("*").alias("alerts"),
                F.countDistinct("new_id", "matched_id").alias("pairs"),
            ).collect()
        }
        n_pairs = alerts.select("new_id", "matched_id").distinct().count()
        print(json.dumps({
            "n_clips": n_clips,
            "modalities": list(modalities),
            "shard_bits": shard_bits,
            "wall_s": round(wall, 1),
            "clips_per_sec": round(n_clips / wall, 1),
            "alert_rows": n_alerts,
            "distinct_pairs": n_pairs,
            "by_kind": {k: {"alerts": a, "pairs": p}
                        for k, (a, p) in by_kind.items()},
            "probes": {"membw_before": bw0, "membw_after": bw1,
                       "cpu_before": cpu0, "cpu_after": cpu1},
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
