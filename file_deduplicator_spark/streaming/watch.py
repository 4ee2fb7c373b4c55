"""Incremental ("watch mode") dedup over snapshot commits.

Generalizes the reference's watch mode (runWatchMode main.go:1585-1732,
processNewFiles main.go:1829-1921), which at HEAD is design-complete but
unwired (SURVEY snapshot-integrity note). Semantics preserved:

* initial scan bootstraps the signature state       (initialScan, T3)
* per batch: new rows are checked against the state (T4)
* THE NEW ARRIVAL IS ALWAYS THE VICTIM — the pre-existing row is the keeper
  (unlike batch keep-criteria; SURVEY §2.7 note)
* the O(n) per-arrival threshold scan (main.go:1874-1886) is replaced by an
  LSH band equi-join against the persisted signature state
* auto-clean emits action rows, never silent deletes (T5)
* WatchStats counters → metrics table               (A5)

Resumability (north rule): state = a signatures snapshot-table + a checkpoint
file carrying the last processed source snapshot id; both are committed only
after a batch fully succeeds, so a crashed batch replays idempotently.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.functions.minhash_sql import (
    minhash_bands_col,
    simhash_bands_col,
)
from file_deduplicator_spark.sources import snapshots as snap

SIG_COLS = ["clip_id", "digest", "size", "sim_sig", "minhash_sig"]


def _checkpoint_path(state_dir: str | Path) -> Path:
    return Path(state_dir) / "_checkpoint.json"


def read_checkpoint(state_dir: str | Path) -> dict:
    p = _checkpoint_path(state_dir)
    if not p.exists():
        return {"last_source_snapshot": None, "batches": 0}
    return json.loads(p.read_text())


def _write_checkpoint(state_dir: str | Path, ckpt: dict) -> None:
    p = _checkpoint_path(state_dir)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps(ckpt))
    tmp.rename(p)


def compute_signatures(df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Shared signature projection (plans.pipeline.with_signatures) slimmed
    to the persisted state columns. NOTE: a persisted state is bound to the
    cfg it was built with (minhash_impl/seed/algo) — never mix."""
    from file_deduplicator_spark.plans.pipeline import with_signatures

    return with_signatures(df, cfg).select(*SIG_COLS)


def _match_new_against_state(
    new_sigs: DataFrame, state: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Alerts: (new_id, matched_id, match_kind). New arrival = victim.

    Exact: equi-join on digest (hashMap lookup, main.go:1846-1856).
    Similar: SimHash band join + Hamming verify (replaces the O(n) scan,
    main.go:1874-1886) and MinHash band join + agreement verify.
    State side of the band join is derived from stored signatures — pure
    column exprs, no re-decode of audio.
    """
    n = new_sigs.select(
        F.col("clip_id").alias("new_id"),
        F.col("digest").alias("n_digest"),
        F.col("sim_sig").alias("n_sim"),
        F.col("minhash_sig").alias("n_mh"),
    )
    s = state.select(
        F.col("clip_id").alias("old_id"),
        F.col("digest").alias("s_digest"),
        F.col("sim_sig").alias("s_sim"),
        F.col("minhash_sig").alias("s_mh"),
    )

    exact = (
        n.join(s, F.col("n_digest") == F.col("s_digest"))
        .select("new_id", F.col("old_id").alias("matched_id"),
                F.lit("exact").alias("match_kind"))
    )

    def explode_bands(df, sig_col, id_alias, bands_builder):
        return df.where(F.col(sig_col).isNotNull()).select(
            F.col(id_alias), F.col(sig_col),
            F.explode(bands_builder(F.col(sig_col))).alias("e"),
        ).select(id_alias, sig_col, F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))

    sim_builder = lambda c: simhash_bands_col(  # noqa: E731
        c, cfg.simhash_bands, cfg.simhash_rotations, cfg.simhash_key_blocks)
    nb = explode_bands(n, "n_sim", "new_id", sim_builder)
    sb = explode_bands(s, "s_sim", "old_id", sim_builder)
    similar_audio = (
        nb.join(sb, ["band", "bh"])
        .filter(F.bit_count(F.col("n_sim").bitwiseXOR(F.col("s_sim"))) <= cfg.effective_threshold)
        .select("new_id", F.col("old_id").alias("matched_id"),
                F.lit("similar_audio").alias("match_kind"))
        .distinct()
    )

    mh_builder = lambda c: minhash_bands_col(c, cfg.minhash_bands, cfg.minhash_rows)  # noqa: E731
    nt = explode_bands(n, "n_mh", "new_id", mh_builder)
    st = explode_bands(s, "s_mh", "old_id", mh_builder)
    from file_deduplicator_spark.functions.minhash_sql import sig_agreement_col

    similar_text = (
        nt.join(st, ["band", "bh"])
        .filter(sig_agreement_col(F.col("n_mh"), F.col("s_mh")) >= cfg.jaccard_threshold)
        .select("new_id", F.col("old_id").alias("matched_id"),
                F.lit("similar_text").alias("match_kind"))
        .distinct()
    )

    return exact.unionByName(similar_audio).unionByName(similar_text)


def process_new_snapshots(
    spark: SparkSession,
    source_table: str | Path,
    state_dir: str | Path,
    cfg: DedupConfig = DedupConfig(),
) -> dict:
    """One incremental batch: read rows added since the checkpoint, alert on
    duplicates vs state (and within the batch), extend state, advance the
    checkpoint. Returns WatchStats-style metrics (A5).
    """
    state_dir = Path(state_dir)
    ckpt = read_checkpoint(state_dir)
    new_rows, latest = snap.read_incremental(spark, source_table, ckpt["last_source_snapshot"])
    if new_rows is None:
        return {"new_rows": 0, "alerts": 0, "batch": ckpt["batches"],
                "last_source_snapshot": ckpt["last_source_snapshot"]}

    new_sigs = compute_signatures(new_rows, cfg).persist()
    sig_table = state_dir / "signatures"

    have_state = (sig_table / "_snapshots.json").exists()
    if have_state:
        state = snap.read_table(spark, sig_table)
        alerts_vs_state = _match_new_against_state(new_sigs, state, cfg)
    else:
        alerts_vs_state = None  # bootstrap batch = initialScan (T3)

    # within-batch duplicates: later clip_id is the victim (arrival order →
    # stable id order, SURVEY §4 determinism note)
    earlier = new_sigs.select(*[F.col(c).alias(c) for c in SIG_COLS])
    within = _match_new_against_state(
        new_sigs, earlier, cfg
    ).filter(F.col("new_id") > F.col("matched_id"))

    alerts = within if alerts_vs_state is None else alerts_vs_state.unionByName(within)
    alerts = alerts.distinct().persist()
    n_alerts = alerts.count()
    n_new = new_sigs.count()

    # commit: extend signature state, append alerts, then checkpoint
    snap.append_snapshot(new_sigs, sig_table)
    if n_alerts:
        alerts.withColumn("batch", F.lit(ckpt["batches"])).write.mode("append").parquet(
            str(state_dir / "alerts")
        )
    ckpt = {"last_source_snapshot": latest, "batches": ckpt["batches"] + 1}
    _write_checkpoint(state_dir, ckpt)

    stats = {
        "new_rows": n_new,
        "alerts": n_alerts,
        "batch": ckpt["batches"] - 1,
        "last_source_snapshot": latest,
    }
    new_sigs.unpersist()
    alerts.unpersist()
    return stats
