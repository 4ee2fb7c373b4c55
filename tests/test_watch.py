"""Incremental ("watch mode") dedup tests: snapshot source, state bootstrap,
new-arrival-is-victim, exact + similar matching, resumable checkpoints.

Mirrors reference semantics: initialScan (main.go:1757-1826), processNewFiles
(main.go:1829-1921), new-file-is-victim (SURVEY §2.7 note)."""

import numpy as np
import pytest
from pyspark.sql import types as T

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.datagen import _synth_pcm
from file_deduplicator_spark.functions.audio import wav_encode
from file_deduplicator_spark.sources import snapshots as snap
from file_deduplicator_spark.streaming.watch import process_new_snapshots, read_checkpoint

CLIP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("transcript", T.StringType()),
    ]
)


def _row(cid, pcm, sr, txt):
    return (cid, bytearray(wav_encode(pcm, sr)), sr, int(len(pcm) / sr * 1000), "wav", txt)


@pytest.fixture()
def watch_env(spark, tmp_path):
    rng = np.random.RandomState(7)
    base = _synth_pcm(rng, 16000, 600)
    other = _synth_pcm(rng, 16000, 500)
    third = _synth_pcm(rng, 16000, 700)
    src = tmp_path / "clips_table"
    state = tmp_path / "state"

    batch0 = spark.createDataFrame(
        [
            _row("clip_a", base, 16000, "the quick brown fox jumps over the lazy dog today"),
            _row("clip_b", other, 16000, "совершенно другие слова здесь"),
        ],
        CLIP_SCHEMA,
    )
    snap.append_snapshot(batch0, src)
    return {"src": src, "state": state, "base": base, "other": other, "third": third}


def test_bootstrap_then_exact_match(spark, watch_env):
    cfg = DedupConfig()
    env = watch_env
    s0 = process_new_snapshots(spark, env["src"], env["state"], cfg)
    assert s0["new_rows"] == 2 and s0["alerts"] == 0

    # idempotent no-op when nothing new
    s_noop = process_new_snapshots(spark, env["src"], env["state"], cfg)
    assert s_noop["new_rows"] == 0

    # new arrival byte-identical to clip_a → exact alert, new id is victim
    batch1 = spark.createDataFrame(
        [_row("clip_c", env["base"], 16000,
              "the quick brown fox jumps over the lazy dog today")],
        CLIP_SCHEMA,
    )
    snap.append_snapshot(batch1, env["src"])
    s1 = process_new_snapshots(spark, env["src"], env["state"], cfg)
    assert s1["new_rows"] == 1 and s1["alerts"] >= 1

    alerts = spark.read.parquet(str(env["state"] / "alerts")).toPandas()
    exact = alerts.query("match_kind == 'exact'")
    assert list(exact.new_id) == ["clip_c"]          # the NEW file is the victim
    assert list(exact.matched_id) == ["clip_a"]      # keeper = pre-existing


def test_similar_audio_and_text_match(spark, watch_env):
    cfg = DedupConfig()
    env = watch_env
    process_new_snapshots(spark, env["src"], env["state"], cfg)

    # +2 dB gain copy of clip_a, same transcript → similar_audio + similar_text
    g = 10 ** (2.0 / 20.0)
    batch = spark.createDataFrame(
        [_row("clip_d", np.clip(env["base"] * g, -1, 1), 16000,
              "the quick brown fox jumps over the lazy dog today")],
        CLIP_SCHEMA,
    )
    snap.append_snapshot(batch, env["src"])
    s = process_new_snapshots(spark, env["src"], env["state"], cfg)
    assert s["alerts"] >= 1
    alerts = spark.read.parquet(str(env["state"] / "alerts")).toPandas()
    kinds = set(alerts.match_kind)
    assert "similar_audio" in kinds
    assert "similar_text" in kinds
    assert set(alerts.new_id) == {"clip_d"}
    assert set(alerts.matched_id) == {"clip_a"}


def test_checkpoint_resume(spark, watch_env):
    cfg = DedupConfig()
    env = watch_env
    process_new_snapshots(spark, env["src"], env["state"], cfg)
    ck = read_checkpoint(env["state"])
    assert ck["last_source_snapshot"] == 0 and ck["batches"] == 1

    snap.append_snapshot(
        spark.createDataFrame([_row("clip_e", env["third"], 16000, "novel words")], CLIP_SCHEMA),
        env["src"],
    )
    snap.append_snapshot(
        spark.createDataFrame([_row("clip_f", env["third"], 16000, "novel words")], CLIP_SCHEMA),
        env["src"],
    )
    # one batch consumes BOTH pending snapshots; clip_f dups clip_e within batch
    s = process_new_snapshots(spark, env["src"], env["state"], cfg)
    assert s["new_rows"] == 2
    ck2 = read_checkpoint(env["state"])
    assert ck2["last_source_snapshot"] == 2 and ck2["batches"] == 2
    alerts = spark.read.parquet(str(env["state"] / "alerts")).toPandas()
    ex = alerts.query("match_kind == 'exact'")
    assert ("clip_f" in set(ex.new_id)) and ("clip_e" in set(ex.matched_id))


def test_snapshot_table_roundtrip(spark, tmp_path):
    d = tmp_path / "t"
    df = spark.range(5).withColumnRenamed("id", "x")
    sid = snap.append_snapshot(df, d)
    assert sid == 0
    sid2 = snap.append_snapshot(spark.range(5, 8).withColumnRenamed("id", "x"), d)
    assert sid2 == 1
    assert snap.read_table(spark, d).count() == 8
    inc, latest = snap.read_incremental(spark, d, 0)
    assert inc.count() == 3 and latest == 1
    none_df, latest2 = snap.read_incremental(spark, d, 1)
    assert none_df is None and latest2 == 1
