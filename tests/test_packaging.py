"""spark-submit --py-files packaging (north rule: "packaged for
spark-submit --py-files"). The zip must be importable on its own — the
exact contract --py-files gives executors/driver — and the job script
must parse its CLI without touching Spark."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_zip_builds_deterministically(tmp_path):
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        from package_pyfiles import build
    finally:
        sys.path.pop(0)
    a = build(tmp_path / "d1")
    b = build(tmp_path / "d2")
    assert a["files"] > 20
    assert a["sha256"] == b["sha256"]  # reproducible artifact


def test_zip_imports_standalone(tmp_path):
    """Import the package from the zip ALONE (cwd stripped from sys.path)
    in a fresh interpreter — what --py-files does on an executor."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        from package_pyfiles import build
    finally:
        sys.path.pop(0)
    info = build(tmp_path)
    code = (
        "import sys\n"
        # strip repo/cwd entries so only the zip can satisfy the import
        f"sys.path = [p for p in sys.path if not p.startswith({str(REPO)!r})]\n"
        f"sys.path.insert(0, {info['zip']!r})\n"
        "import file_deduplicator_spark as m\n"
        "from file_deduplicator_spark.config import DedupConfig\n"
        "from file_deduplicator_spark.plans.pipeline import dedup_pipeline\n"
        "from file_deduplicator_spark.functions.image import dhash_image\n"
        "assert m.__file__.endswith('.zip/file_deduplicator_spark/__init__.py'), m.__file__\n"
        "print('ZIP_IMPORT_OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(tmp_path), timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert "ZIP_IMPORT_OK" in r.stdout


def test_job_cli_parses_without_spark():
    sys.path.insert(0, str(REPO / "jobs"))
    try:
        from run_dedup import parse_args
    finally:
        sys.path.pop(0)
    a = parse_args(["--input", "/x", "--output", "/y", "--keep", "newest",
                    "--sim-algo", "phash", "--sim-threshold", "8"])
    assert (a.input, a.keep_criteria, a.sim_algo, a.sim_threshold) == (
        "/x", "newest", "phash", 8)
    assert not a.local


def test_job_end_to_end_local(spark, tmp_path, clips_df, clips_fixture):
    """Full job main() against the 120-clip fixture in local mode: report
    JSON + clusters/pairs parquet + actions lineage + metrics rows land."""
    sys.path.insert(0, str(REPO / "jobs"))
    try:
        from run_dedup import main
    finally:
        sys.path.pop(0)
    src = tmp_path / "clips.parquet"
    clips_df.write.mode("overwrite").parquet(str(src))
    out = tmp_path / "run"
    summary = main([
        "--input", str(src), "--output", str(out),
        "--local", "--run-id", "7", "--probe",
    ])
    assert (out / "report.json").exists()
    # --probe writes the header-only corpus inventory next to the outputs
    probe = spark.read.parquet(str(out / "probe"))
    assert probe.count() == clips_df.count()
    assert probe.filter("ok and container = 'wav'").count() > 0
    report = json.loads((out / "report.json").read_text())
    assert report["duplicate_groups"] > 0
    assert summary["run_id"] == 7
    assert spark.read.parquet(str(out / "clusters")).count() > 0
    actions = spark.read.parquet(str(out / "actions"))
    assert actions.filter("run_id = 7").count() == actions.count()
    metrics = spark.read.parquet(str(out / "metrics"))
    assert metrics.filter("metric = 'wall_sec'").count() == 1
    # per-partition lineage table (north rule resumability posture)
    lineage = spark.read.parquet(str(out / "partitions"))
    assert lineage.filter("run_id = 7").count() == lineage.count()
    n_rows = lineage.groupBy().sum("rows").first()[0]
    assert n_rows == clips_df.count()
    assert metrics.filter("metric = 'input_partitions'").count() == 1
    # the suffix-array containment stage is wired into the job by default
    # (north_star pipeline stage): planted contained-transcript pairs —
    # which the near-dup recall test explicitly excludes — must co-cluster
    plan = spark.read.parquet(str(out / "actions")).toPandas()
    clip_cluster = dict(zip(plan.clip_id, plan.cluster_id))
    clip_cluster.update(dict(zip(plan.keeper_id, plan.cluster_id)))
    contained = clips_fixture.expected_pairs.query("kind == 'contained'")
    for a, b in zip(contained.clip_id_a, contained.clip_id_b):
        assert clip_cluster.get(a) is not None and (
            clip_cluster.get(a) == clip_cluster.get(b)
        ), f"contained pair ({a}, {b}) not co-clustered by the job"
