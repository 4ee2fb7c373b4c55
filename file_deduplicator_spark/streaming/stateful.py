"""Custom stateful streaming dedup via ``applyInPandasWithState``.

The third watch-mode tier. The engine already has:

* snapshot-incremental batches (streaming/watch.py) — the production
  design for Iceberg sources, state = parquet band indexes;
* a Structured Streaming ``foreachBatch`` wrapper (streaming/stream.py)
  that reuses the same matching logic per micro-batch.

Both re-join each micro-batch against on-disk state. This module keeps
the duplicate-tracking state INSIDE Spark's streaming state store
instead, with full modality parity to the reference's watch loop
(main.go:1846-1886 checks the digest map AND the perceptual-hash map
per arrival) plus the transcript modality the north rule adds:

* audio — SimHash bands (the same Manku block-subset tables as the
  batch LSH, so batch and stream agree on candidate topology), verified
  at Hamming ≤ threshold;
* exact — digest buckets (two independent 64-bit hashes ≈ a 128-bit
  exact check, no string digests in state);
* text — transcript MinHash bands, verified via the 32-byte nibble
  FOLD of the signature (a provable lower bound on slot mismatches —
  conservative vs the batch agreement verify, never misses a pair the
  batch would keep).

The stream is grouped by ``(band, shard)`` where shard = bh mod
2^shard_bits and each row carries its exact bucket id: the
``applyInPandasWithState`` operator holds the shard's seen
(clip_id, sig, bh) rows and emits a verified alert the moment a new
arrival lands within threshold of a stored SAME-BUCKET row —
per-arrival alert semantics, the reference's watch design
(main.go:1874-1886), with no per-batch rescan of persisted state.

Scale shape: sharding bounds the state-store KEY COUNT at
n_tables * 2^shard_bits regardless of corpus size (the round-4 drain
wrote 3.2M singleton bucket keys and the per-group python +
state-store overhead dominated at ~1,040 clips/s — SCALING.json
round4_stateful_tier_drain_200k), while per-TRUE-bucket state is
CAPPED at ``max_per_bucket`` rows (the same cap the batch LSH applies
to bucket expansion, operators/lsh.py), so a hot bucket cannot grow
state without bound. Matching inside a shard is a blocked xor matrix +
SWAR popcount per Arrow chunk over the shard pool (stored rows + the
batch's arrivals in arrival order up to ``batch_pool_cap`` —
position-based, so results don't depend on how Arrow chunks the batch,
and memory stays bounded), masked by exact-bucket equality, with a
per-arrival match cap — no per-row Python in the hot loop.
Resumability comes from Spark's own state-store checkpoint: stop the
query, add files, restart with the same checkpointLocation and the
bucket state is restored (pytest-pinned in
tests/test_stateful_stream.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.functions.minhash_sql import simhash_bands_col
from file_deduplicator_spark.streaming.stream import CLIPS_SCHEMA

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("new_id", T.StringType()),
        T.StructField("matched_id", T.StringType()),
        T.StructField("hamming", T.IntegerType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bh", T.LongType()),
        T.StructField("kind", T.StringType()),
    ]
)

# sigs is the row-major flattening of an (n, stride) int64 matrix — stride
# is 1 for audio/digest rows and num_perm/16 for the text nibble-fold; bhs
# holds each row's EXACT bucket id (the group key is the SHARD, see
# make_bucket_tracker).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.StringType())),
        T.StructField("sigs", T.ArrayType(T.LongType())),
        T.StructField("bhs", T.ArrayType(T.LongType())),
    ]
)

# STATE-FORMAT VERSION NOTE (round-5 break): the 'bhs' field and the
# (band, shard) group key replaced the round-4 (band, bh) keying. A
# checkpointLocation written by the pre-round-5 module CANNOT be resumed
# with this code — state rows/keys no longer match; discard the old
# checkpoint and rebuild state (bind STATE_FORMAT_VERSION into the
# checkpoint path, as stream callers do with SIG_KERNEL_VERSION).
STATE_FORMAT_VERSION = 2

# band-id encoding for the three modalities sharing one stateful operator
# (one applyInPandasWithState per query; the modality rides in the key):
#   band >= 0          audio SimHash tables (Manku block-subset family)
#   band == BAND_EXACT digest exact-match (the reference's hash-map check,
#                      main.go:1846-1856)
#   band <= BAND_TEXT0 transcript MinHash tables (band = BAND_TEXT0 - i)
BAND_EXACT = -1
BAND_TEXT0 = -2


def band_kind(band: int) -> str:
    if band >= 0:
        return "similar_audio"
    if band == BAND_EXACT:
        return "exact"
    return "similar_text"

def popcount_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount on uint64 (numpy<2 has no bitwise_count)."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int32)


_POOL_ROW_BLOCK = 256  # rows per xor-matrix block: bounds peak memory


_NIBBLE_LSB = np.uint64(0x1111111111111111)


def _row_distances(blk: np.ndarray, cand: np.ndarray, text: bool) -> np.ndarray:
    """(r, m) distance matrix between row blocks of (x, stride) uint64 sigs.

    Audio/digest (stride 1): 64-bit Hamming via SWAR popcount. Text
    (stride = num_perm/16 nibble-fold longs): PROVABLE MinHash slot
    mismatches — per long, OR the xor's nibble bits onto each nibble's
    LSB, popcount, sum across longs (the numpy twin of
    minhash_sql.fold_mismatch_col, so stream and batch pre-filters agree
    bit-for-bit)."""
    d = blk[:, None, :] ^ cand[None, :, :]
    if text:
        one, two, three = np.uint64(1), np.uint64(2), np.uint64(3)
        d = (d | (d >> one) | (d >> two) | (d >> three)) & _NIBBLE_LSB
    r, m, s = d.shape
    out = popcount_u64(d.reshape(-1)).reshape(r, m, s)
    return out.sum(axis=2, dtype=np.int32)


def _sig_matrix(col: pd.Series) -> np.ndarray:
    """sig column → (n, stride) uint64 matrix. Accepts scalar longs
    (stride 1 — the unit-test / single-modality shape) or array values
    (the unioned multi-modality stream)."""
    if len(col) and isinstance(col.iloc[0], (list, tuple, np.ndarray)):
        return np.stack([np.asarray(v, dtype=np.int64) for v in col]).view(np.uint64)
    return col.to_numpy(dtype=np.int64).view(np.uint64)[:, None]


def make_bucket_tracker(threshold: int, max_per_bucket: int,
                        ttl_minutes: float | None = None,
                        batch_pool_cap: int = 4096,
                        max_matches_per_arrival: int = 8,
                        text_max_mismatch: int = 32):
    """Build the per-(band, shard) stateful function.

    The group key is (band, SHARD) where shard = bh mod 2^shard_bits (see
    stateful_alerts); each row carries its EXACT bucket id ``bh`` and only
    equal-``bh`` rows may match, so sharding changes the state-store KEY
    COUNT, never the match topology. Rows without a ``bh`` column (the
    pre-shard unit tests and any single-bucket caller) treat the key's
    second element as their bucket id — the original per-(band,bh)
    behavior. Why shard: an availableNow drain of 200k clips wrote 3.2M
    singleton (band,bh) state keys, and the per-GROUP python + state-store
    cost dominated the whole tier (~1,040 clips/s, SCALING.json
    round4_stateful_tier_drain_200k); sharding amortizes both by ~rows-
    per-shard while the bh equality mask keeps results identical.

    State: per TRUE bucket (bh), the first ``max_per_bucket`` (clip_id,
    sig) arrivals, pooled per shard. Emit: (new, stored) and in-batch
    (new, earlier-new) same-``bh`` pairs whose distance passes the
    modality's verify — 64-bit Hamming ≤ ``threshold`` for audio bands,
    equality (Hamming 0) for the digest band, provable MinHash slot
    mismatches ≤ ``text_max_mismatch`` for text bands (conservative vs
    the batch agreement verify: the nibble fold lower-bounds true
    mismatches, so no pair the batch would keep is ever dropped).
    "Earlier" means a smaller arrival position within the pool bounded by
    ``batch_pool_cap`` (memory bound for hot shards), keeping at most
    ``max_matches_per_arrival`` matches per arrival per band (earliest
    pool positions win; 0 = uncapped). Same-id pairs never emit and never
    consume cap slots. A pair colliding in k bands alerts up to k times
    (at-least-once alert semantics, same as the reference's per-event
    reporter; the batch path's edge distinct is the exactly-once variant).

    ``ttl_minutes``: with the ProcessingTimeTimeout conf, a SHARD whose
    TTL expired without new arrivals (in any of its buckets) is dropped
    from the state store — at 10^12 clips total state would otherwise
    grow with distinct-bucket count forever; TTL turns it into a sliding
    recent-arrivals window (alerts then only cover pairs within the TTL
    horizon — the tradeoff every windowed streaming dedup makes). TTL is
    meant for CONTINUOUS triggers: an availableNow drain with pending
    timeouts keeps running (empty) micro-batches until every registered
    timeout has fired — measured: a 5-minute TTL held a drain alive for
    ~300 extra batches — so batch-style drains should pass
    ttl_minutes=None (fractions are accepted for tests)."""

    def _empty():
        return pd.DataFrame(
            {"new_id": [], "matched_id": [],
             "hamming": pd.array([], dtype="int32"),
             "band": pd.array([], dtype="int32"),
             "bh": pd.array([], dtype="int64"),
             "kind": pd.Series([], dtype="object")}
        )

    def track(
        key: Tuple[int, int],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_minutes is not None and state.hasTimedOut:
            state.remove()
            yield _empty()
            return
        band = int(key[0])
        text = band <= BAND_TEXT0
        thr = (threshold if band >= 0
               else (0 if band == BAND_EXACT else text_max_mismatch))
        kind = band_kind(band)
        pool_ids: list = []
        pool_sigs: np.ndarray | None = None
        pool_bhs = np.zeros(0, dtype=np.int64)
        if state.exists:
            ids_t, sigs_t, bhs_t = state.get
            pool_ids = list(ids_t)
            pool_bhs = np.array(bhs_t, dtype=np.int64)
            stride = (len(sigs_t) // len(ids_t)) if ids_t else 1
            pool_sigs = (np.array(sigs_t, dtype=np.int64)
                         .view(np.uint64).reshape(len(ids_t), stride))
        cap_pool = max(batch_pool_cap, max_per_bucket)
        out_new, out_old, out_d, out_bh = [], [], [], []
        # The match pool = stored state + this micro-batch's arrivals IN
        # ARRIVAL ORDER, truncated at cap_pool — position-based, so
        # results are independent of how Arrow chunks the batch, and
        # memory stays bounded for hot shards (a 100k-row batch must not
        # allocate a 100k x 100k matrix). Rows beyond cap_pool still
        # alert AGAINST the pool; pairs among two over-cap rows are
        # dropped (the documented bound, same spirit as the batch LSH
        # bucket cap). Only the first max_per_bucket rows PER BUCKET
        # persist to state.
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            new_ids = pdf["clip_id"].tolist()
            new_sigs = _sig_matrix(pdf["sig"])
            if "bh" in pdf.columns:
                new_bhs = pdf["bh"].to_numpy(dtype=np.int64)
            else:
                new_bhs = np.full(len(new_ids), int(key[1]), dtype=np.int64)
            if pool_sigs is None:
                pool_sigs = np.zeros((0, new_sigs.shape[1]), dtype=np.uint64)
            n, m0 = new_sigs.shape[0], pool_sigs.shape[0]
            # would-be pool position of chunk row i is m0 + i; eligible
            # match columns for row i = pool positions < min(m0+i,
            # cap_pool). Matrix computed in row blocks: peak memory
            # _POOL_ROW_BLOCK x cap_pool x 8 B x stride (~8 MB/long at
            # defaults).
            appendable = max(0, min(cap_pool, m0 + n) - m0)
            cand_sigs = np.concatenate([pool_sigs, new_sigs[:appendable]])
            cand_ids = pool_ids + new_ids[:appendable]
            cand_bhs = np.concatenate([pool_bhs, new_bhs[:appendable]])
            # pool positions per id, for the same-id self-mask below
            # (pool <= cap_pool rows, so this dict is small and per-chunk)
            pos_by_id: dict = {}
            for i, cid in enumerate(cand_ids):
                pos_by_id.setdefault(cid, []).append(i)
            for b in range(0, n, _POOL_ROW_BLOCK):
                blk = new_sigs[b:b + _POOL_ROW_BLOCK]
                rows = blk.shape[0]
                lim = np.minimum(m0 + b + np.arange(rows), cand_sigs.shape[0])
                width = int(lim.max()) if rows else 0
                if width == 0:
                    continue
                d = _row_distances(blk, cand_sigs[:width], text)
                hit = (d <= thr) & (
                    np.arange(width)[None, :] < lim[:, None]
                )
                # sharding: only same-true-bucket pairs are candidates
                hit &= new_bhs[b:b + rows, None] == cand_bhs[None, :width]
                # same-id self-mask BEFORE the cap: a re-arriving clip_id
                # matches its stored copy at distance 0, and that hit
                # would otherwise consume cap slots the emit filter then
                # discards — starving real "a duplicates b" alerts. Ids
                # with pool copies are rare, so this loop usually no-ops.
                for r in range(rows):
                    ps = pos_by_id.get(new_ids[b + r])
                    if ps is not None:
                        hit[r, [p for p in ps if p < width]] = False
                # per-arrival match cap: an arrival needs "you duplicate
                # X" (the reference's per-file alert, main.go:1874-1886),
                # not every member of a degenerate bucket — 1000
                # identical clips would otherwise emit ~500k alerts per
                # band (measured 8.9M alert rows on the 200k fixture).
                # Keep the first k matches by pool position.
                if max_matches_per_arrival > 0:
                    hit &= np.cumsum(hit, axis=1) <= max_matches_per_arrival
                hit_r, hit_c = np.nonzero(hit)
                for r, c in zip(hit_r, hit_c):
                    out_new.append(new_ids[b + r])
                    out_old.append(cand_ids[c])
                    out_d.append(int(d[r, c]))
                    out_bh.append(int(new_bhs[b + r]))
            pool_ids = cand_ids
            pool_sigs = cand_sigs
            pool_bhs = cand_bhs
        if pool_sigs is None:
            pool_sigs = np.zeros((0, 1), dtype=np.uint64)
        # persistence cap PER TRUE BUCKET: first max_per_bucket arrivals of
        # each bh survive (arrival order is pool order). Bounded python
        # loop: pool <= cap_pool rows.
        seen: dict = {}
        keep = []
        for i, bhv in enumerate(pool_bhs.tolist()):
            c = seen.get(bhv, 0)
            if c < max_per_bucket:
                keep.append(i)
                seen[bhv] = c + 1
        keep_ids = [pool_ids[i] for i in keep]
        keep_sigs = pool_sigs[keep]
        keep_bhs = pool_bhs[keep]
        state.update((
            keep_ids,
            [int(s) for s in keep_sigs.view(np.int64).ravel()],
            [int(v) for v in keep_bhs],
        ))
        if ttl_minutes is not None:
            state.setTimeoutDuration(int(ttl_minutes * 60_000))
        yield pd.DataFrame(
            {
                "new_id": out_new,
                "matched_id": out_old,
                "hamming": pd.array(out_d, dtype="int32"),
                "band": pd.array([band] * len(out_new), dtype="int32"),
                "bh": pd.array(out_bh, dtype="int64"),
                "kind": [kind] * len(out_new),
            }
        )

    return track


DEFAULT_MODALITIES = ("audio", "exact", "text")


def banded_signatures(df: DataFrame, cfg: DedupConfig,
                      modalities: tuple = DEFAULT_MODALITIES) -> DataFrame:
    """clips → (clip_id, sig:array<long>, band, bh), one keyspace per
    modality (see the band-id encoding at the top of this module).

    One payload pass: plans.pipeline.with_signatures computes digest +
    audio SimHash + transcript MinHash in a single Arrow stage (bytes
    crosses to Python once), then each modality derives its band rows
    from the slim columns:

    * audio — the SAME Manku block-subset table family as the batch LSH
      (stream and batch agree on candidate topology), sig = [sim_sig];
    * exact — the reference watch's digest hash-map check
      (main.go:1846-1856): bh = xxhash64(digest), sig = a second,
      distinct 64-bit hash of the digest (same function, extra literal
      column — correlated with bh, not independent), so a match requires
      two agreeing 64-bit values; the practical false-positive odds are
      still far below any corpus-scale concern, and no string digest has
      to sit in state;
    * text — the batch minhash band family for candidates, sig = the
      nibble FOLD of the full signature (num_perm/16 longs — 32 B vs the
      512 B full signature; minhash_sql.minhash_fold_col), verified in
      the tracker as provable-slot-mismatch count. Degenerate all-empty
      transcripts are excluded (same guard as watch/batch).
    """
    from file_deduplicator_spark.functions.minhash_sql import (
        EMPTY_SLOT,
        minhash_bands_col,
        minhash_fold_col,
    )
    from file_deduplicator_spark.plans.pipeline import with_signatures

    if not modalities:
        raise ValueError("modalities must name at least one match kind")
    sigs = with_signatures(df, cfg).select(
        "clip_id", "digest", "sim_sig", "minhash_sig")
    parts = []
    if "audio" in modalities:
        bands = simhash_bands_col(
            F.col("sim_sig"), cfg.simhash_bands, cfg.simhash_rotations,
            cfg.simhash_key_blocks, cfg.simhash_design,
        )
        parts.append(
            sigs.filter(F.col("sim_sig").isNotNull())
            .select("clip_id", F.array("sim_sig").alias("sig"),
                    F.explode(bands).alias("e"))
            .select("clip_id", "sig", F.col("e.band").alias("band"),
                    F.col("e.bh").alias("bh"))
        )
    if "exact" in modalities:
        parts.append(
            sigs.filter(F.col("digest").isNotNull())
            .select(
                "clip_id",
                F.array(F.xxhash64("digest", F.lit(1))).alias("sig"),
                F.lit(BAND_EXACT).alias("band"),
                F.xxhash64("digest").alias("bh"),
            )
        )
    if "text" in modalities:
        mh_bands = minhash_bands_col(
            F.col("minhash_sig"), cfg.minhash_bands, cfg.minhash_rows)
        parts.append(
            sigs.filter(
                F.col("minhash_sig").isNotNull()
                & (F.element_at(F.col("minhash_sig"), 1) != F.lit(EMPTY_SLOT))
            )
            .select("clip_id",
                    minhash_fold_col(F.col("minhash_sig"), cfg.num_perm)
                    .alias("sig"),
                    F.explode(mh_bands).alias("e"))
            .select("clip_id", "sig",
                    (F.lit(BAND_TEXT0) - F.col("e.band")).alias("band"),
                    F.col("e.bh").alias("bh"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def stateful_alerts(df: DataFrame, cfg: DedupConfig,
                    max_per_bucket: int = 64,
                    ttl_minutes: float | None = None,
                    max_matches_per_arrival: int = 8,
                    modalities: tuple = DEFAULT_MODALITIES,
                    shard_bits: int = 12,
                    batch_pool_cap: int = 4096) -> DataFrame:
    """The stateful operator itself (works on a streaming DataFrame).
    ``ttl_minutes=None`` keeps bucket state forever (exact semantics);
    a value bounds total state to the TTL horizon (see make_bucket_tracker).
    Audio verifies at cfg.effective_threshold (strictness-scaled, H11) —
    the same gate batch and watch use; text at the fold bound of
    cfg.jaccard_threshold (conservative vs the batch agreement verify).

    ``shard_bits``: state is grouped by (band, bh mod 2^shard_bits), the
    exact bh rides per row and gates matching, so the state-store key
    count is bounded by n_tables * 2^shard_bits instead of growing with
    the corpus (the round-4 drain cost driver — see make_bucket_tracker).
    """
    tracker = make_bucket_tracker(
        cfg.effective_threshold, max_per_bucket, ttl_minutes,
        batch_pool_cap=batch_pool_cap,
        max_matches_per_arrival=max_matches_per_arrival,
        text_max_mismatch=int((1.0 - cfg.jaccard_threshold) * cfg.num_perm),
    )
    mask = (1 << shard_bits) - 1
    return (
        banded_signatures(df, cfg, modalities)
        .withColumn("shard", F.col("bh").bitwiseAND(F.lit(mask)))
        .groupBy("band", "shard")
        .applyInPandasWithState(
            tracker,
            outputStructType=ALERT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if ttl_minutes is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )


def start_stateful_watch(
    spark: SparkSession,
    input_dir: str | Path,
    out_dir: str | Path,
    cfg: DedupConfig = DedupConfig(),
    schema: T.StructType = CLIPS_SCHEMA,
    max_per_bucket: int = 64,
    ttl_minutes: float | None = None,
    max_matches_per_arrival: int = 8,
    modalities: tuple = DEFAULT_MODALITIES,
    shard_bits: int = 12,
    batch_pool_cap: int = 4096,
):
    """File-source stream → stateful alerts → parquet sink.

    ``max_matches_per_arrival`` passes through to the bucket tracker
    (0 = uncapped: every qualifying pair, the pre-cap contract).

    ``input_dir`` is watched for NEW parquet part-files landing directly
    in it (Spark's file source does not descend into non-partition
    subdirectories). ``out_dir`` holds alerts/ and _checkpoint/ (Spark
    state store + offsets — restarting with the same out_dir resumes
    bucket state).

    Trigger: availableNow (deterministic drain, terminates) WITHOUT a
    TTL; with ``ttl_minutes`` the query runs CONTINUOUSLY (1 s
    micro-batches) because processing-time timeouts never let an
    availableNow drain terminate — Spark keeps scheduling no-data
    batches while a stateful operator holds timeout registrations
    (measured: a 3 s TTL still spun past 120 s). The caller stops a
    continuous query. Returns the StreamingQuery."""
    out_dir = Path(out_dir)
    stream = spark.readStream.schema(schema).parquet(str(input_dir))
    alerts = stateful_alerts(
        stream, cfg, max_per_bucket, ttl_minutes,
        max_matches_per_arrival=max_matches_per_arrival,
        modalities=modalities, shard_bits=shard_bits,
        batch_pool_cap=batch_pool_cap,
    )
    writer = (
        alerts.writeStream.format("parquet")
        .option("path", str(out_dir / "alerts"))
        .option("checkpointLocation", str(out_dir / "_checkpoint"))
        .outputMode("append")
    )
    if ttl_minutes is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 second")
    return writer.start()
