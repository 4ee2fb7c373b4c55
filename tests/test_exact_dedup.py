"""Exact dedup + keeper + report semantics on the synthetic clips table.

Mirrors main_test.go:55-98 (group of 3), 554-616 (no dups / many groups),
926-943 (digest-only key), 1030-1156 (keeper criteria)."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.operators.exact import (
    exact_dup_clusters,
    exact_dup_groups,
    size_filter,
    with_digest,
)
from file_deduplicator_spark.operators.keeper import label_keepers
from file_deduplicator_spark.operators.report import dedup_report, stats_by_codec


def test_exact_groups_match_scenarios(spark, clips_df, clips_fixture):
    df = with_digest(clips_df, DedupConfig())
    clustered = exact_dup_clusters(df)
    rows = clustered.select("clip_id", "cluster_id", "scenario").collect()
    by_scenario = {}
    for r in rows:
        by_scenario.setdefault(r.scenario, []).append(r)

    # every exact_dup_k3 clip is clustered; groups have exactly 3 members
    k3 = by_scenario.get("exact_dup_k3", [])
    n_k3_planted = int((clips_fixture.clips.scenario == "exact_dup_k3").sum())
    assert len(k3) == n_k3_planted
    sizes = pd.Series([r.cluster_id for r in k3]).value_counts()
    assert set(sizes.values) == {3}

    # hot_bucket: all rows in ONE cluster (identical silence)
    hot = by_scenario.get("hot_bucket", [])
    assert len({r.cluster_id for r in hot}) == 1

    # unique rows never appear
    assert "unique" not in by_scenario
    # near-dups are NOT exact dups (different bytes)
    assert "near_dup_gain" not in by_scenario


def test_exact_pair_recall(spark, clips_df, clips_fixture):
    """Every planted exact pair lands in the same cluster (recall 1.0)."""
    df = with_digest(clips_df, DedupConfig())
    lab = exact_dup_clusters(df).select("clip_id", "cluster_id").toPandas()
    cmap = dict(zip(lab.clip_id, lab.cluster_id))
    exact = clips_fixture.expected_pairs.query("kind == 'exact'")
    missed = [
        (a, b)
        for a, b in zip(exact.clip_id_a, exact.clip_id_b)
        if cmap.get(a) != cmap.get(b) or cmap.get(a) is None
    ]
    assert not missed, f"{len(missed)} exact pairs missed: {missed[:5]}"


def test_group_view_counts(spark, clips_df):
    df = with_digest(clips_df, DedupConfig())
    g = exact_dup_groups(df)
    assert g.filter(F.col("group_count") < 2).count() == 0


def test_size_filter_bounds(spark, clips_df):
    df = with_digest(clips_df, DedupConfig(min_size=100, max_size=50_000))
    out = size_filter(df, DedupConfig(min_size=100, max_size=50_000))
    mn, mx = out.agg(F.min("size"), F.max("size")).first()
    assert mn >= 100 and mx <= 50_000


def test_keeper_criteria(spark, clips_fixture):
    cases = clips_fixture.keeper_cases
    expected = cases.attrs["expected"]
    sdf = spark.createDataFrame(cases.rename(columns={"group_id": "cluster_id"}))
    for criteria, want in expected.items():
        lab = label_keepers(sdf, criteria, id_col="clip_id", path_col="path")
        keeper = lab.filter("action = 'KEEP'").select("clip_id").first()[0]
        assert keeper == want, f"{criteria}: got {keeper}, want {want}"
        # exactly one keeper; everyone else DELETE (main.go:948-954)
        assert lab.filter("action = 'KEEP'").count() == 1
        assert lab.filter("action = 'DELETE'").count() == len(cases) - 1


def test_report_totals(spark, clips_df, clips_fixture):
    """total_duplicates = Σ(group−1); reclaimable = Σ size·(group−1)
    (main.go:913-935, 1335-1338)."""
    df = with_digest(clips_df, DedupConfig())
    labeled = label_keepers(exact_dup_clusters(df), "first")
    rep = dedup_report(labeled).first()

    pdf = clips_fixture.clips.copy()
    import hashlib

    pdf["digest"] = pdf["bytes"].map(lambda b: hashlib.sha256(b).hexdigest())
    grp = pdf.groupby("digest").agg(n=("clip_id", "size"), size=("bytes", lambda s: len(s.iloc[0])))
    dup = grp[grp.n > 1]
    assert rep.duplicate_groups == len(dup)
    assert rep.duplicate_rows == int((dup.n - 1).sum())
    assert rep.reclaimable_bytes == int((dup["size"] * (dup.n - 1)).sum())


def test_stats_by_codec(spark, clips_df):
    df = with_digest(clips_df, DedupConfig())
    stats = stats_by_codec(df).toPandas()
    assert list(stats.columns) == ["codec", "n", "bytes"]
    assert stats.n.is_monotonic_decreasing
