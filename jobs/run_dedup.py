"""spark-submit entry point for the full dedup pipeline (north rule:
"packaged for spark-submit --py-files ... run via spark-submit on a
multi-executor cluster").

Cluster:

    scripts/package_pyfiles.py                       # builds dist/*.zip
    spark-submit --master <cluster> \
        --py-files dist/file_deduplicator_spark.zip \
        jobs/run_dedup.py --input <parquet-or-iceberg> --output /runs/r1

Local smoke (same script, local master from SPARK_GRAFT_CPUS):

    python jobs/run_dedup.py --input /root/testdata/sf0.001 --local \
        --output /tmp/dedup_run

The job writes the reference's output family (SURVEY §2 S3-S7) under
--output: report.json, clusters/, pairs/, action plan appended to the
actions/ lineage table, and a run-metrics row per collected metric.
Reference analog: main() main.go:307-520 (scan -> filter -> hash ->
group -> select keepers -> report/export).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--input", required=True,
                   help="clips table: a parquet path/dir, a directory "
                        "containing clips.parquet, or <catalog>.<db>.<table> "
                        "for an Iceberg catalog configured on the session")
    p.add_argument("--output", required=True, help="run output directory")
    p.add_argument("--local", action="store_true",
                   help="force local[$SPARK_GRAFT_CPUS] master (default: "
                        "defer to spark-submit)")
    p.add_argument("--min-size", type=int, default=0)
    p.add_argument("--max-size", type=int, default=0)
    p.add_argument("--hash-algo", default="sha256")
    p.add_argument("--sim-algo", default="dhash",
                   choices=["dhash", "ahash", "phash"])
    p.add_argument("--sim-threshold", type=int, default=10)
    p.add_argument("--strictness", default="normal")
    p.add_argument("--keep", default="first", dest="keep_criteria",
                   help="oldest|newest|largest|smallest|path:<prefix>|first")
    p.add_argument("--no-perceptual", action="store_true")
    p.add_argument("--no-containment", action="store_true",
                   help="skip the suffix-array contained-transcript stage "
                        "(north_star lists it as a pipeline stage; it adds "
                        "a transcript-only pass, no payload rescan)")
    p.add_argument("--jaccard-threshold", type=float, default=0.5)
    p.add_argument("--probe", action="store_true",
                   help="also write a header-only media-probe table "
                        "(container/codec/duration per clip) to "
                        "<output>/probe")
    p.add_argument("--run-id", type=int, default=None,
                   help="lineage run id (default: unix seconds)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p.parse_args(argv)


def load_clips(spark, source: str):
    """parquet path, dir with clips.parquet, an Iceberg table DIRECTORY (read
    jar-free via sources/iceberg_lite), or a catalog table name."""
    path = Path(source)
    if path.exists():
        from file_deduplicator_spark.sources import iceberg_lite

        if iceberg_lite.is_iceberg_table(path):
            return iceberg_lite.read_table(spark, path)
        if path.is_dir() and (path / "clips.parquet").exists():
            return spark.read.parquet(str(path / "clips.parquet"))
        return spark.read.parquet(str(path))
    return spark.read.table(source)


def main(argv: list[str] | None = None) -> dict:
    args = parse_args(argv)

    from file_deduplicator_spark.config import DedupConfig
    from file_deduplicator_spark.plans.pipeline import (
        collect_run_metrics,
        dedup_pipeline,
        release_pipeline,
    )
    from file_deduplicator_spark.session import get_spark
    from file_deduplicator_spark.sources import sinks

    spark = get_spark(
        app_name="dedup_run",
        master=None if args.local else "",
        shuffle_partitions=args.shuffle_partitions,
    )
    cfg = DedupConfig(
        min_size=args.min_size,
        max_size=args.max_size,
        hash_algo=args.hash_algo,
        perceptual=not args.no_perceptual,
        sim_algo=args.sim_algo,
        sim_threshold=args.sim_threshold,
        strictness=args.strictness,
        keep_criteria=args.keep_criteria,
        jaccard_threshold=args.jaccard_threshold,
    )
    run_id = args.run_id if args.run_id is not None else int(time.time())
    out = Path(args.output)

    t0 = time.monotonic()
    clips = load_clips(spark, args.input)
    # suffix-array contained-transcript edges (north_star pipeline stage);
    # a transcript-only pass — the payload column is pruned from its scan —
    # lifted to digest roots inside dedup_pipeline before CC
    extra = None
    if not args.no_containment:
        from file_deduplicator_spark.operators.containment import containment_edges

        extra = containment_edges(clips, cfg)
    result = dedup_pipeline(clips, cfg, extra_edges=extra)

    # clusters + pairs land as parquet (distributed writes); the O(1)-row
    # report goes to a single JSON file; the action plan appends to the
    # undo/lineage table so undoLast keeps working across runs.
    if args.probe:
        # corpus inventory: header-only metadata per payload (what codecs
        # are in this bucket, how many undecodable rows) — runs before any
        # decode so a probe of a 100 TB table costs one column-pruned scan
        from file_deduplicator_spark.operators.multimodal import probe_media

        probe_media(clips, id_col="clip_id").write.mode("overwrite").parquet(
            str(out / "probe"))
    result["clusters"].write.mode("overwrite").parquet(str(out / "clusters"))
    result["pairs"].write.mode("overwrite").parquet(str(out / "pairs"))
    report = sinks.write_report_json(result["report"], out / "report.json")
    sinks.append_actions(result["plan"], out / "actions", run_id=run_id)
    n_parts = sinks.append_partition_lineage(
        clips, out / "partitions", run_id=run_id)

    metrics = collect_run_metrics(result)
    metrics["input_partitions"] = n_parts
    metrics["wall_sec"] = round(time.monotonic() - t0, 3)
    sinks.append_metrics(spark, out / "metrics", run_id, metrics)
    release_pipeline(result)

    summary = {"run_id": run_id, "output": str(out), "report": report,
               "metrics": metrics}
    print(json.dumps(summary, default=str))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
