"""Round-2 verdict item #7: exercise the DISTRIBUTED connected-components
path (driver_threshold=0 — the 10^12-scale strategy) at bench scale once and
record rounds/wall, so the scale claim doesn't rest on small-n pytest only.

Runs the full 200k-clip pipeline twice in one session — once with the
default size-adaptive CC (driver union-find at these edge counts) and once
with the distributed min-label + double pointer-jump loop forced — and
prints one JSON line with both wall times and the CC metrics.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    from bench import ensure_clips
    from file_deduplicator_spark.config import DedupConfig
    from file_deduplicator_spark.operators.components import connected_components
    from file_deduplicator_spark.plans.pipeline import (
        dedup_pipeline,
        near_dup_edges,
        release_pipeline,
        with_signatures,
    )
    from file_deduplicator_spark.session import get_spark

    n_clips = int(os.environ.get("SPARK_GRAFT_SCALE_CLIPS", "200000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    path = ensure_clips(n_clips)
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    clips = spark.read.parquet(str(path / "clips.parquet"))

    # build the REAL edge list once (signatures + LSH + verify), checkpointed
    # by connected_components itself; time ONLY the CC strategies on it
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    cfg = DedupConfig()
    sigs = with_signatures(clips, cfg).drop("bytes")
    sigs = sigs.withColumn(
        "digest_root", F.min("clip_id").over(Window.partitionBy("digest"))
    ).persist()
    edges = near_dup_edges(sigs, cfg).distinct().persist()
    n_edges = edges.count()

    out: dict = {"n_clips": n_clips, "cpus": cpus, "edges": n_edges}
    for label, thr in (("driver_union_find", 2_000_000), ("distributed", 0)):
        t0 = time.perf_counter()
        labels, metrics = connected_components(edges, driver_threshold=thr)
        n_labels = labels.count()
        out[label] = {
            "wall_sec": round(time.perf_counter() - t0, 2),
            "labels": n_labels,
            **{k: v for k, v in metrics.items() if k != "mode"},
        }
    # both strategies must produce identical clusterings
    a, _ = connected_components(edges, driver_threshold=2_000_000)
    b, _ = connected_components(edges, driver_threshold=0)
    diff = a.withColumnRenamed("cluster_id", "ca").join(
        b.withColumnRenamed("cluster_id", "cb"), "id"
    ).filter("ca != cb").count()
    out["label_mismatches"] = diff
    print(json.dumps(out))


if __name__ == "__main__":
    main()
