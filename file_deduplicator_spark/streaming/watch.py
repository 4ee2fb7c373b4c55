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
    return match_new_against_state(new_sigs, state, cfg)


def match_new_against_state(
    new_sigs: DataFrame, state: DataFrame, cfg: DedupConfig,
    include: tuple = ("exact", "similar_audio", "similar_text"),
    mh_bands_builder=None, mh_agreement=None, mh_guard=None,
) -> DataFrame:
    """Alerts: (new_id, matched_id, match_kind). New arrival = victim.

    Exact: equi-join on digest (hashMap lookup, main.go:1846-1856).
    Similar: SimHash band join + Hamming verify (replaces the O(n) scan,
    main.go:1874-1886) and MinHash band join + agreement verify.
    State side of the band join is derived from stored signatures — pure
    column exprs, no re-decode of audio.

    ``include`` selects the match kinds built; ``mh_bands_builder`` /
    ``mh_agreement`` / ``mh_guard`` override the MinHash band, verify and
    degenerate-signature guard expressions — the value-level gate
    (__spark_entry__.q_watch_arrivals) runs THIS function with the
    portable (DuckDB-replicable) MinHash builders, so the join/victim
    topology under the gate is the production watch code path itself.
    """
    if not include:
        raise ValueError("include must name at least one match kind")
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

    parts = []
    if "exact" in include:
        parts.append(
            n.join(s, F.col("n_digest") == F.col("s_digest"))
            # a replayed batch can meet its own rows in state — never
            # self-match
            .filter(F.col("new_id") != F.col("old_id"))
            .select("new_id", F.col("old_id").alias("matched_id"),
                    F.lit("exact").alias("match_kind"))
        )

    def explode_bands(df, sig_col, id_alias, bands_builder):
        return df.where(F.col(sig_col).isNotNull()).select(
            F.col(id_alias), F.col(sig_col),
            F.explode(bands_builder(F.col(sig_col))).alias("e"),
        ).select(id_alias, sig_col, F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))

    if "similar_audio" in include:
        sim_builder = lambda c: simhash_bands_col(  # noqa: E731
            c, cfg.simhash_bands, cfg.simhash_rotations, cfg.simhash_key_blocks,
            cfg.simhash_design)
        nb = explode_bands(n, "n_sim", "new_id", sim_builder)
        sb = explode_bands(s, "s_sim", "old_id", sim_builder)
        parts.append(
            nb.join(sb, ["band", "bh"])
            .filter(F.bit_count(F.col("n_sim").bitwiseXOR(F.col("s_sim"))) <= cfg.effective_threshold)
            .select("new_id", F.col("old_id").alias("matched_id"),
                    F.lit("similar_audio").alias("match_kind"))
            .distinct()
        )

    if "similar_text" in include:
        from file_deduplicator_spark.functions.minhash_sql import (
            EMPTY_SLOT,
            sig_agreement_col,
        )

        # empty/whitespace transcripts carry the degenerate all-EMPTY_SLOT
        # signature: agreement would be 1.0 between ANY two silent clips,
        # so they are excluded from the MinHash join (batch path guards
        # this with the has-text flag in near_dup_edges; same rule here)
        def default_guard(df, sig_col):
            return df.filter(
                F.element_at(F.col(sig_col), 1) != F.lit(EMPTY_SLOT))

        guard = mh_guard or default_guard
        mh_builder = mh_bands_builder or (
            lambda c: minhash_bands_col(c, cfg.minhash_bands, cfg.minhash_rows))
        agree = mh_agreement or (
            lambda a, b: sig_agreement_col(a, b) >= cfg.jaccard_threshold)
        nt = explode_bands(guard(n, "n_mh"), "n_mh", "new_id", mh_builder)
        st = explode_bands(guard(s, "s_mh"), "s_mh", "old_id", mh_builder)
        parts.append(
            nt.join(st, ["band", "bh"])
            .filter(agree(F.col("n_mh"), F.col("s_mh")))
            .select("new_id", F.col("old_id").alias("matched_id"),
                    F.lit("similar_text").alias("match_kind"))
            .distinct()
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # replayed rows meeting themselves in state must never alert,
    # whatever the match kind
    return out.filter(F.col("new_id") != F.col("matched_id"))


# ---------------------------------------------------------------------------
# Pruned banded state (T4 at 10^12-row state): instead of re-deriving band
# tables from the FULL signature state every batch (a full scan — the direct
# analog of the reference's O(n) per-arrival threshold scan, main.go:1874-
# 1886), the state is persisted as hash-bucket-partitioned INDEXES:
#
#   sim_bands/batch=<b>/pbkt=<k>   (band, bh, clip_id, sim_sig)
#   mh_bands/batch=<b>/pbkt=<k>    (band, bh, clip_id)
#   digests/batch=<b>/dbkt=<k>     (digest, clip_id)
#   sig_idx/batch=<b>/sbkt=<k>     (clip_id, digest, size, sim_sig, minhash_sig)
#
# A micro-batch collects the ≤ state_buckets distinct bucket ids its own keys
# hash to (a tiny driver round-trip, ONCE per batch) and reads the state with
# `pbkt IN (...)` — parquet partition pruning skips every other bucket, so
# batch cost scales with batch size, not state size. Per-batch directories
# with overwrite semantics keep crash replay idempotent.
# ---------------------------------------------------------------------------


def _pbkt(col, n: int):
    return F.pmod(F.xxhash64(col), F.lit(n))


def _sim_bands_of(df: DataFrame, cfg: DedupConfig, id_col: str = "clip_id") -> DataFrame:
    return (
        df.where(F.col("sim_sig").isNotNull())
        .select(
            F.col(id_col).alias("clip_id"), "sim_sig",
            F.explode(simhash_bands_col(
                F.col("sim_sig"), cfg.simhash_bands, cfg.simhash_rotations,
                cfg.simhash_key_blocks, cfg.simhash_design)).alias("e"),
        )
        .select("clip_id", "sim_sig", F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))
        .withColumn("pbkt", _pbkt(F.col("bh"), cfg.state_buckets))
    )


def _mh_bands_of(df: DataFrame, cfg: DedupConfig, id_col: str = "clip_id") -> DataFrame:
    from file_deduplicator_spark.functions.minhash_sql import EMPTY_SLOT

    return (
        df.where(F.element_at(F.col("minhash_sig"), 1) != F.lit(EMPTY_SLOT))
        .select(
            F.col(id_col).alias("clip_id"),
            F.explode(minhash_bands_col(
                F.col("minhash_sig"), cfg.minhash_bands, cfg.minhash_rows)).alias("e"),
        )
        .select("clip_id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))
        .withColumn("pbkt", _pbkt(F.col("bh"), cfg.state_buckets))
    )


def _append_state_indexes(
    new_sigs: DataFrame, state_dir: Path, cfg: DedupConfig, batch_id: int
) -> None:
    """Write this batch's index slices (overwrite per-batch dirs = replay-safe)."""
    n = cfg.state_buckets
    _sim_bands_of(new_sigs, cfg).write.partitionBy("pbkt").mode("overwrite").parquet(
        str(state_dir / "sim_bands" / f"batch={batch_id}")
    )
    _mh_bands_of(new_sigs, cfg).write.partitionBy("pbkt").mode("overwrite").parquet(
        str(state_dir / "mh_bands" / f"batch={batch_id}")
    )
    new_sigs.select("digest", "clip_id").withColumn(
        "dbkt", _pbkt(F.col("digest"), n)
    ).write.partitionBy("dbkt").mode("overwrite").parquet(
        str(state_dir / "digests" / f"batch={batch_id}")
    )
    new_sigs.select(*SIG_COLS).withColumn(
        "sbkt", _pbkt(F.col("clip_id"), n)
    ).write.partitionBy("sbkt").mode("overwrite").parquet(
        str(state_dir / "sig_idx" / f"batch={batch_id}")
    )


def _collect_buckets(df: DataFrame, col: str) -> list[int]:
    return [int(r[0]) for r in df.select(col).distinct().collect()]


def _match_new_pruned(
    spark: SparkSession, new_sigs: DataFrame, state_dir: Path, cfg: DedupConfig
) -> DataFrame:
    """Alerts vs the banded state indexes — reads only matching buckets.

    Same semantics as _match_new_against_state (exact digest join, SimHash
    Hamming ≤ t, MinHash agreement ≥ threshold, new arrival = victim)."""
    from file_deduplicator_spark.functions.minhash_sql import sig_agreement_col

    n = cfg.state_buckets

    # exact: digest-bucket pruned join (hashMap lookup, main.go:1846-1856)
    nd = new_sigs.select(
        F.col("clip_id").alias("new_id"), F.col("digest")
    ).withColumn("dbkt", _pbkt(F.col("digest"), n))
    dbkts = _collect_buckets(nd, "dbkt")
    sd = (
        spark.read.parquet(str(state_dir / "digests"))
        .filter(F.col("dbkt").isin(dbkts))
        .select(F.col("digest"), F.col("clip_id").alias("old_id"))
    )
    exact = (
        nd.join(sd, "digest")
        .select("new_id", F.col("old_id").alias("matched_id"),
                F.lit("exact").alias("match_kind"))
    )

    # similar audio: pruned band join; sim_sig rides in the index rows so no
    # second lookup is needed for the Hamming verify
    nb = _sim_bands_of(new_sigs, cfg).withColumnRenamed("clip_id", "new_id") \
        .withColumnRenamed("sim_sig", "n_sim")
    pbkts_a = _collect_buckets(nb, "pbkt")
    sb = (
        spark.read.parquet(str(state_dir / "sim_bands"))
        .filter(F.col("pbkt").isin(pbkts_a))
        .select("band", "bh", F.col("clip_id").alias("old_id"),
                F.col("sim_sig").alias("s_sim"))
    )
    similar_audio = (
        nb.join(sb, ["band", "bh"])
        .filter(F.bit_count(F.col("n_sim").bitwiseXOR(F.col("s_sim")))
                <= cfg.effective_threshold)
        .select("new_id", F.col("old_id").alias("matched_id"),
                F.lit("similar_audio").alias("match_kind"))
        .distinct()
    )

    # similar text: pruned band join → candidate ids → signature-bucket pruned
    # sig_idx lookup for the agreement verify
    nt = _mh_bands_of(new_sigs, cfg).withColumnRenamed("clip_id", "new_id")
    pbkts_t = _collect_buckets(nt, "pbkt")
    st = (
        spark.read.parquet(str(state_dir / "mh_bands"))
        .filter(F.col("pbkt").isin(pbkts_t))
        .select("band", "bh", F.col("clip_id").alias("old_id"))
    )
    cand = nt.join(st, ["band", "bh"]).select("new_id", "old_id").distinct()
    cand = cand.withColumn("sbkt", _pbkt(F.col("old_id"), n))
    sbkts = _collect_buckets(cand, "sbkt")
    old_sigs = (
        spark.read.parquet(str(state_dir / "sig_idx"))
        .filter(F.col("sbkt").isin(sbkts))
        .select(F.col("clip_id").alias("old_id"), F.col("minhash_sig").alias("s_mh"))
    )
    new_mh = new_sigs.select(F.col("clip_id").alias("new_id"),
                             F.col("minhash_sig").alias("n_mh"))
    similar_text = (
        cand.join(old_sigs, "old_id")
        .join(new_mh, "new_id")
        .filter(sig_agreement_col(F.col("n_mh"), F.col("s_mh")) >= cfg.jaccard_threshold)
        .select("new_id", F.col("old_id").alias("matched_id"),
                F.lit("similar_text").alias("match_kind"))
        .distinct()
    )

    return (
        exact.unionByName(similar_audio)
        .unionByName(similar_text)
        .filter(F.col("new_id") != F.col("matched_id"))
    )


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
    from file_deduplicator_spark.functions.audio import SIG_KERNEL_VERSION

    state_dir = Path(state_dir)
    ckpt = read_checkpoint(state_dir)
    # persisted signatures are only comparable to signatures produced by the
    # SAME kernel version (borderline envelope bits flip across numeric
    # changes, e.g. the float64→float32 decode switch). A checkpoint without
    # the marker predates versioning = version 1 — and that default applies
    # whenever ANY state artifact exists on disk, not just when the
    # checkpoint file says a snapshot was processed: a crash between
    # _append_state_indexes and _write_checkpoint leaves signature state
    # without a checkpoint, and inferring "fresh state = current version"
    # there would silently defeat the guard (round-3 advice).
    if "sig_kernel_version" in ckpt:
        state_ver = ckpt["sig_kernel_version"]
    else:
        state_artifacts = any(
            (state_dir / d).exists()
            for d in ("signatures", "sig_idx", "sim_bands", "mh_bands", "digests")
        )
        state_ver = 1 if state_artifacts else SIG_KERNEL_VERSION
    if state_ver != SIG_KERNEL_VERSION:
        raise ValueError(
            f"watch state at {state_dir} was built with signature kernel "
            f"v{state_ver}, current engine is v{SIG_KERNEL_VERSION}: rebuild "
            "the state (delete the state dir and re-bootstrap) — comparing "
            "across kernel versions silently degrades match quality"
        )
    # backend-agnostic source read: JSON snapshot log or a real Iceberg v2
    # table layout (sources/iceberg_lite.py) — same incremental contract
    source_backend = snap.resolve_backend(source_table)
    new_rows, latest = source_backend.read_incremental(
        spark, source_table, ckpt["last_source_snapshot"]
    )
    if new_rows is None:
        return {"new_rows": 0, "alerts": 0, "batch": ckpt["batches"],
                "last_source_snapshot": ckpt["last_source_snapshot"]}

    # F6: re-apply the batch filters to new arrivals (ref main.go:1683-1704
    # runs the same size/pattern checks per watch event)
    from file_deduplicator_spark.plans.pipeline import apply_prefilters

    new_rows = apply_prefilters(new_rows, cfg)
    new_sigs = compute_signatures(new_rows, cfg).persist()
    sig_table = state_dir / "signatures"

    have_state = (sig_table / "_snapshots.json").exists()
    if not have_state:
        alerts_vs_state = None  # bootstrap batch = initialScan (T3)
    elif cfg.watch_pruned_state and (state_dir / "sig_idx").exists():
        # scale path: bucket-pruned index reads (batch cost ∝ batch size)
        alerts_vs_state = _match_new_pruned(spark, new_sigs, state_dir, cfg)
    else:
        # fallback: full state scan (pre-index states / pruned mode off)
        state = snap.read_table(spark, sig_table)
        alerts_vs_state = _match_new_against_state(new_sigs, state, cfg)

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
    batch_id = ckpt["batches"]

    # commit protocol (idempotent replay): state append is tagged with the
    # SOURCE snapshot id and skipped if that snapshot was already ingested
    # (crash between append and checkpoint); alerts/actions go to a
    # deterministic per-batch directory with overwrite semantics, so a
    # replayed batch rewrites identical output instead of duplicating it.
    already = any(
        m.get("source_snapshot") == latest for m in snap.read_manifest(sig_table)
    )
    if not already:
        snap.append_snapshot(new_sigs, sig_table, source_snapshot=latest)
    if cfg.watch_pruned_state:
        # per-batch overwrite dirs — replay rewrites identical slices
        _append_state_indexes(new_sigs, state_dir, cfg, batch_id)
    if n_alerts:
        alerts.withColumn("batch", F.lit(batch_id)).write.mode("overwrite").parquet(
            str(state_dir / "alerts" / f"batch={batch_id}")
        )

    # T5 handleAutoClean (ref main.go:1952-1984): the NEW ARRIVAL is the
    # victim; emit one action row per alerted arrival — never silent deletes
    # (action application is a separate explicit step, operators/apply_actions)
    n_actions = 0
    if cfg.watch_auto_clean and n_alerts:
        actions = (
            alerts.groupBy("new_id")
            .agg(F.min("matched_id").alias("keeper_id"))
            .select(
                F.col("new_id").alias("clip_id"),
                F.col("keeper_id"),
                F.lit(cfg.watch_clean_action).alias("action"),
                (F.lit(None).cast("string") if cfg.watch_clean_action != "move"
                 else F.concat(F.lit(cfg.watch_move_to.rstrip("/") + "/"),
                               F.col("new_id"))).alias("target"),
                F.lit(batch_id).alias("batch"),
            )
        )
        n_actions = actions.count()
        actions.write.mode("overwrite").parquet(
            str(state_dir / "actions" / f"batch={batch_id}")
        )

    ckpt = {"last_source_snapshot": latest, "batches": batch_id + 1,
            "sig_kernel_version": SIG_KERNEL_VERSION}
    _write_checkpoint(state_dir, ckpt)

    stats = {
        "new_rows": n_new,
        "alerts": n_alerts,
        "actions": n_actions,
        "batch": batch_id,
        "last_source_snapshot": latest,
    }
    new_sigs.unpersist()
    alerts.unpersist()
    return stats
