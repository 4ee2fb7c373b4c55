"""Snapshot-log table format — Iceberg-semantics emulation for the sandbox.

The production design targets Iceberg: incremental dedup reads only files
added by snapshots newer than the last checkpoint (``incremental read``), and
resumability comes from the snapshot log + engine checkpoints. The test
container ships no Iceberg jars, so this module implements the same contract
over plain parquet + a JSON manifest:

    <table_dir>/
      data/part-<snapshot>-<n>.parquet     # immutable data files
      _snapshots.json                      # append-only snapshot log

Each manifest entry: {"snapshot_id": int, "files": [...], "row_count": int}.
Snapshot ids are dense integers (0, 1, 2, ...) — deterministic, no wall
clock. ``try_iceberg()`` reports whether a real Iceberg catalog is on the
classpath; when it is, callers can swap this module for
``spark.read.format("iceberg").option("start-snapshot-id", ...)`` without
touching the dedup logic (same (DataFrame, snapshot_id) interface).

Reference analog: watch-mode's fsnotify event stream (main.go:1585-1732) —
"new files appeared under the watched root" generalizes to "new files were
committed by a snapshot".
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def try_iceberg(spark: SparkSession) -> bool:
    """True if an Iceberg catalog is usable in this session.

    NOTE: a bare ``spark._jvm.org.apache.iceberg.Table`` attribute access
    does NOT prove the class exists — py4j hands back a JavaPackage
    placeholder without touching the classpath (found by the round-3 smoke
    test). Class.forName is the real probe.
    """
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def resolve_backend(table_dir: str | Path):
    """Pick the table backend by on-disk layout: a real Iceberg metadata dir
    (``metadata/*.metadata.json``) routes to sources.iceberg_lite (the
    dependency-free reader of the actual Iceberg v2 format); otherwise the
    JSON snapshot-log emulation in this module. Both expose the same
    ``read_table / read_incremental / append_snapshot / current_snapshot_id``
    contract, so callers (streaming/watch.py) are backend-agnostic."""
    import sys

    from file_deduplicator_spark.sources import iceberg_lite

    if iceberg_lite.is_iceberg_table(table_dir):
        return iceberg_lite
    return sys.modules[__name__]


def _manifest_path(table_dir: str | Path) -> Path:
    return Path(table_dir) / "_snapshots.json"


def read_manifest(table_dir: str | Path) -> list[dict]:
    p = _manifest_path(table_dir)
    if not p.exists():
        return []
    return json.loads(p.read_text())


def current_snapshot_id(table_dir: str | Path) -> int | None:
    m = read_manifest(table_dir)
    return m[-1]["snapshot_id"] if m else None


def append_snapshot(df: DataFrame, table_dir: str | Path, **meta) -> int:
    """Commit ``df`` as a new snapshot; returns the new snapshot id.

    Extra ``meta`` keys are recorded on the manifest entry — e.g.
    ``source_snapshot=<id>`` lets an incremental consumer detect an
    already-ingested source snapshot on crash replay (idempotent commits).

    Files are written under a snapshot-scoped subdirectory (immutability),
    then the manifest is atomically replaced (write-temp + rename).
    """
    table_dir = Path(table_dir)
    manifest = read_manifest(table_dir)
    snap_id = (manifest[-1]["snapshot_id"] + 1) if manifest else 0
    out = table_dir / "data" / f"snap-{snap_id:06d}"
    df.write.mode("error").parquet(str(out))
    files = sorted(str(p) for p in out.glob("*.parquet"))
    # row count from the parquet footers, driver-side — no Spark job, no
    # re-scan of what was just written
    import pyarrow.parquet as pq

    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    entry = {"snapshot_id": snap_id, "files": files, "row_count": n}
    entry.update(meta)
    manifest.append(entry)
    tmp = _manifest_path(table_dir).with_suffix(".tmp")
    tmp.write_text(json.dumps(manifest, indent=1))
    tmp.rename(_manifest_path(table_dir))
    return snap_id


def read_table(spark: SparkSession, table_dir: str | Path) -> DataFrame:
    """Full-table scan across all snapshots."""
    manifest = read_manifest(table_dir)
    files = [f for m in manifest for f in m["files"]]
    if not files:
        raise FileNotFoundError(f"empty snapshot table at {table_dir}")
    return spark.read.parquet(*files)


def read_incremental(
    spark: SparkSession, table_dir: str | Path, after_snapshot: int | None
) -> tuple[DataFrame | None, int | None]:
    """Rows added strictly after ``after_snapshot`` (None = from the start).

    Returns (df | None if nothing new, latest_snapshot_id). This is the
    incremental-scan contract (Iceberg ``start-snapshot-id`` semantics).
    """
    manifest = read_manifest(table_dir)
    if not manifest:
        return None, after_snapshot
    latest = manifest[-1]["snapshot_id"]
    new = [
        f
        for m in manifest
        if after_snapshot is None or m["snapshot_id"] > after_snapshot
        for f in m["files"]
    ]
    if not new:
        return None, latest
    return spark.read.parquet(*new), latest
