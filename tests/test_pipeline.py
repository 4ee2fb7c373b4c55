"""End-to-end pipeline: recall ≥ 0.99 on planted dup pairs, zero forbidden
(near-miss) pairs, chain merging via CC, hot-bucket skew boundedness."""

import pandas as pd
from pyspark.sql import functions as F

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.operators.components import connected_components
from file_deduplicator_spark.plans.pipeline import dedup_pipeline

CFG = DedupConfig()


def _cluster_map(result) -> dict:
    pdf = result["clustered"].select("clip_id", "cluster_id").toPandas()
    return dict(zip(pdf.clip_id, pdf.cluster_id))


def test_pipeline_recall_and_precision(spark, clips_df, clips_fixture):
    result = dedup_pipeline(clips_df, CFG)
    cmap = _cluster_map(result)

    exp = clips_fixture.expected_pairs
    total, hit = 0, 0
    missed = []
    for a, b, kind in zip(exp.clip_id_a, exp.clip_id_b, exp.kind):
        if kind == "contained":
            continue  # containment edges come from the suffix-array op (separate test)
        total += 1
        if cmap.get(a) == cmap.get(b) and cmap.get(a) is not None:
            hit += 1
        else:
            missed.append((a, b, kind))
    recall = hit / total
    assert recall >= 0.99, f"recall {recall:.3f}; missed {missed[:10]}"

    # precision guard: no forbidden near-miss pair may share a cluster
    for a, b in zip(clips_fixture.forbidden_pairs.clip_id_a, clips_fixture.forbidden_pairs.clip_id_b):
        assert cmap.get(a) != cmap.get(b), f"forbidden pair clustered: {a},{b}"


def test_chain_merging(spark, clips_df, clips_fixture):
    """A≈B, B≈C ⇒ one cluster (CC transitive closure, SURVEY §7.3)."""
    result = dedup_pipeline(clips_df, CFG)
    cmap = _cluster_map(result)
    chain = clips_fixture.clips.query("scenario == 'chain'")
    # consecutive triples planted together
    ids = list(chain.clip_id)
    for i in range(0, len(ids) - 2, 3):
        a, b, c = ids[i : i + 3]
        assert cmap[a] == cmap[b] == cmap[c], (a, b, c)


def test_hot_bucket_single_cluster_and_bounded_pairs(spark, clips_df, clips_fixture):
    """1000×-identical silence: one cluster; edge list stays linear (the
    exact-dup quarantine means LSH never sees the duplicates)."""
    result = dedup_pipeline(clips_df, CFG)
    cmap = _cluster_map(result)
    hot = list(clips_fixture.clips.query("scenario == 'hot_bucket'").clip_id)
    assert len({cmap[h] for h in hot}) == 1
    n_hot = len(hot)
    n_edges = result["pairs"].count()
    n_rows = len(clips_fixture.clips)
    # linear bound: exact edges are star-shaped (n-1 per group), LSH capped
    assert n_edges < 6 * n_rows, f"{n_edges} edges for {n_rows} rows"


def test_report_and_plan_consistency(spark, clips_df):
    result = dedup_pipeline(clips_df, CFG)
    rep = result["report"].first()
    plan = result["plan"]
    assert rep.duplicate_rows == plan.count()
    # keeper never appears as a victim
    labeled = result["labeled"]
    keepers = {r.clip_id for r in labeled.filter("action='KEEP'").select("clip_id").collect()}
    victims = {r.clip_id for r in plan.select("clip_id").collect()}
    assert not keepers & victims
    # every victim row's keeper is in its own cluster
    bad = plan.filter(F.col("keeper_id").isNull()).count()
    assert bad == 0


def test_run_metrics_roundtrip(spark, clips_df, tmp_path):
    """Statistics analog: CC + bucket-skew metrics land in the metrics table
    (ref main.go:46-59, 1507-1565; VERDICT r1 item 10)."""
    from file_deduplicator_spark.config import DedupConfig
    from file_deduplicator_spark.plans.pipeline import (
        collect_run_metrics,
        dedup_pipeline,
        release_pipeline,
    )
    from file_deduplicator_spark.sources.sinks import append_metrics

    result = dedup_pipeline(clips_df, DedupConfig())
    result["report"].collect()
    m = collect_run_metrics(result)
    assert "cc_converged" in m and "lsh_buckets" in m
    assert m["lsh_buckets"] > 0
    append_metrics(spark, tmp_path / "metrics", run_id=1, metrics=m)
    back = spark.read.parquet(str(tmp_path / "metrics"))
    assert back.filter("metric = 'lsh_buckets'").count() == 1
    release_pipeline(result)


def test_partition_lineage_resume_diff(spark, clips_df, tmp_path):
    """North rule: "resumable from checkpoint with per-partition lineage +
    metrics tables". Lineage rows cover every input row; an unchanged input
    diffs empty against its own recorded run; dropping rows flags exactly
    the partitions whose membership changed (the work a resume must redo)."""
    from file_deduplicator_spark.sources.sinks import (
        append_partition_lineage,
        changed_partitions,
        partition_lineage,
    )

    lin_dir = tmp_path / "partitions"
    n_parts = append_partition_lineage(clips_df, lin_dir, run_id=7)
    back = spark.read.parquet(str(lin_dir))
    assert back.count() == n_parts
    # lineage accounts for every input row, no partition double-counted
    total = back.agg(F.sum("rows")).first()[0]
    assert total == clips_df.count()
    assert back.select("part").distinct().count() == n_parts

    # identical input → empty resume diff (prior outputs reusable)
    assert changed_partitions(spark, clips_df, lin_dir, run_id=7).count() == 0

    # membership change → exactly the touched partitions flagged; the
    # checksum (sum of xxhash64) catches same-count swaps too
    cur = partition_lineage(clips_df)
    victim = clips_df.limit(1).select("clip_id").first()[0]
    mutated = clips_df.where(F.col("clip_id") != victim)
    diff = changed_partitions(spark, mutated, lin_dir, run_id=7).collect()
    assert len(diff) >= 1
    for row in diff:
        assert row.prev_rows is None or row.cur_rows is None or (
            row.prev_rows != row.cur_rows or row.prev_checksum != row.cur_checksum
        )


import pytest as _pytest


@_pytest.mark.parametrize("driver_threshold", [2_000_000, 0])
def test_connected_components_basic(spark, driver_threshold):
    """Both strategies: driver union-find (small edge lists) and the
    distributed min-label loop (driver_threshold=0 forces it)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "s")],
        "id_a string, id_b string",
    )
    labels, metrics = connected_components(edges, driver_threshold=driver_threshold)
    pdf = labels.toPandas().set_index("id").cluster_id
    assert pdf["a"] == pdf["b"] == pdf["c"] == "a"
    assert pdf["x"] == pdf["y"] == "x"
    assert pdf["p"] == pdf["q"] == pdf["r"] == pdf["s"] == "p"
    assert metrics["converged"]
    expected_mode = "driver_union_find" if driver_threshold else "distributed_two_phase"
    assert metrics.get("mode") == expected_mode


@_pytest.mark.parametrize("driver_threshold", [2_000_000, 0])
def test_cc_long_chain_converges(spark, driver_threshold):
    """Pathological 64-node path graph — label propagation must still finish
    within the iteration bound (doubling takes log2(64)=6+ rounds)."""
    n = 64
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n - 1)], "id_a string, id_b string"
    )
    labels, metrics = connected_components(
        edges, max_iters=80, driver_threshold=driver_threshold
    )
    assert metrics["converged"], metrics
    pdf = labels.toPandas()
    assert set(pdf.cluster_id) == {"n000"}


def test_cc_checkpoint_fallback_path_converges(spark, monkeypatch):
    """Round-2 verdict directive: the distributed loop must also converge
    within budget on the plain localCheckpoint FALLBACK (the private-API
    detached checkpoint can vanish on Spark Connect / future versions)."""
    import os as _os

    import file_deduplicator_spark.operators.components as comp

    monkeypatch.setitem(_os.environ, "SPARK_GRAFT_FORCE_CKPT_FALLBACK", "1")
    monkeypatch.setattr(comp, "_CKPT_PATH_ACTIVE", None)
    n = 64
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n - 1)], "id_a string, id_b string"
    )
    labels, metrics = connected_components(edges, max_iters=80, driver_threshold=0)
    assert metrics["converged"], metrics
    assert set(labels.toPandas().cluster_id) == {"n000"}
    assert comp._CKPT_PATH_ACTIVE == "fallback"


def test_cc_checkpoint_probe(spark):
    from file_deduplicator_spark.operators.components import detached_checkpoint_probe

    assert detached_checkpoint_probe(spark) in ("internal", "fallback")


def test_bucket_members_adaptive_shortcut(spark):
    """Round-3 rework: cached skew-free band tables take the single-shuffle
    plain path; a bucket above the cap re-engages the salted topology.
    All three topologies must produce identical capped member lists."""
    from file_deduplicator_spark.operators.lsh import bucket_members

    # skew-free: 100 buckets of 3 members (cap 8)
    rows = [(f"id{i:04d}", 0, i % 100) for i in range(300)]
    cold = spark.createDataFrame(rows, "id string, band int, bh long").persist()
    cold.count()
    plain = bucket_members(cold, cap=8, salt=1).orderBy("bh").collect()
    adaptive = bucket_members(cold, cap=8, salt=16).orderBy("bh").collect()
    assert [r.ids for r in adaptive] == [r.ids for r in plain]
    assert all(r.bucket_n == 3 for r in adaptive)
    cold.unpersist()

    # one hot bucket (40 > cap 8) among cold ones
    rows = [(f"h{i:03d}", 0, 7) for i in range(40)] + [
        (f"c{i:03d}", 0, 100 + i % 5) for i in range(15)
    ]
    hot = spark.createDataFrame(rows, "id string, band int, bh long").persist()
    hot.count()
    salted = {r.bh: r for r in bucket_members(hot, cap=8, salt=4).collect()}
    unsalted = {r.bh: r for r in bucket_members(hot, cap=8, salt=1).collect()}
    assert salted.keys() == unsalted.keys()
    for bh in salted:
        # salted merge is exact: cap lowest ids survive, true size reported
        assert salted[bh].ids == unsalted[bh].ids
        assert salted[bh].bucket_n == unsalted[bh].bucket_n
    assert salted[7].bucket_n == 40 and len(salted[7].ids) == 8
    hot.unpersist()
