"""LSH candidate generation — the scale-safe replacement for the reference's
O(n^2) greedy pairwise scan (``findPerceptualDuplicates`` main.go:868-902).

Topology (SURVEY §7.1 step 4):

    rows ──► band table (posexplode of band hashes)
         ──► hot-bucket cap (count per bucket; quarantine oversized)
         ──► salted self-equi-join on (band, bh)  [id_a < id_b]
         ──► distinct candidate pairs
         ──► verify (Hamming ≤ t / signature agreement ≥ s)

Scale notes, explicitly (north_rule: "partitioning / shuffle / skew handled
explicitly"):

* The self-join shuffles once on (band, bh) — the natural key. AQE skew-join
  splits oversized shuffle partitions, but NOT the quadratic pair blow-up
  inside one bucket; that's what ``bucket_cap`` is for: buckets above the cap
  are counted, logged to the metrics table, and excluded from pairing
  (their members are, by construction, near-identical — exact dedup already
  clusters byte-identical ones, and a capped sample keeps the rest linked).
* Dedup of candidate pairs BEFORE the verify stage: a pair can collide in
  many bands; verifying once is the big constant-factor win.
* Exact duplicates should be removed before near-dup pairing (quarantine —
  SURVEY §7.3 "skew"): pass one representative per digest into the LSH stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from file_deduplicator_spark.config import DedupConfig


def band_table(df: DataFrame, bands_col, id_col: str = "clip_id") -> DataFrame:
    """(id, band, bh) — one row per (row, band). ``bands_col`` is an
    array<struct<band,bh>> Column (minhash_bands_col / simhash_bands_col)."""
    return df.select(
        F.col(id_col).alias("id"), F.explode(bands_col).alias("e")
    ).select("id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))


def capped_buckets(band_df: DataFrame, cap: int) -> tuple[DataFrame, DataFrame]:
    """Split the band table into (within-cap rows, oversized-bucket stats).

    For capped buckets we keep a deterministic sample of ``cap`` members
    (lowest ids) rather than dropping the bucket entirely — the sampled
    members still link the bucket into clusters, bounding pair count at
    cap^2 per bucket while preserving recall for the sampled rows.
    """
    from pyspark.sql import Window

    # count and rank share ONE window spec (same partition+order) so Spark
    # computes both in a single shuffle+sort pass
    w_rank = Window.partitionBy("band", "bh").orderBy("id")
    w_all = w_rank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = band_df.withColumn("bucket_n", F.count(F.lit(1)).over(w_all)).withColumn(
        "rnk", F.row_number().over(w_rank)
    )
    kept = ranked.filter(F.col("rnk") <= cap).drop("rnk")
    oversized = (
        ranked.filter(F.col("bucket_n") > cap)
        .groupBy("band", "bh")
        .agg(F.max("bucket_n").alias("bucket_n"))
    )
    return kept, oversized


def candidate_pairs(band_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Distinct (id_a < id_b) candidate pairs from the banded self-join.

    Buckets are capped first (skew guard). The join key (band, bh) is high-
    cardinality by construction, so the shuffle is well-spread; AQE handles
    residual skew. Output is de-duplicated across bands before verification.
    """
    kept, _ = capped_buckets(band_df, cfg.bucket_cap)
    left = kept.select(F.col("band"), F.col("bh"), F.col("id").alias("id_a"))
    right = kept.select(F.col("band"), F.col("bh"), F.col("id").alias("id_b"))
    pairs = (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs


def bucket_skew_metrics(band_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Metrics-table row source: bucket-size histogram + capped-bucket count
    (run-observability requirement of the north rule)."""
    sizes = band_df.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.max("n").alias("max_bucket"),
        F.expr("percentile_approx(n, 0.99)").alias("p99_bucket"),
        F.sum(F.when(F.col("n") > cfg.bucket_cap, 1).otherwise(0)).alias("capped_buckets"),
    )


def verify_pairs_hamming(
    pairs: DataFrame,
    sigs: DataFrame,
    threshold: int,
    id_col: str = "clip_id",
    sig_col: str = "sim_sig",
) -> DataFrame:
    """Verify stage for 64-bit signatures: keep pairs with
    bit_count(a XOR b) <= threshold (ref isSimilarImage perceptual.go:401-404;
    packed-int64 form of hammingDistance perceptual.go:385-397).

    ``sigs`` is the (id, sig) projection — two broadcast-or-shuffle hash
    joins to attach both sides, then a pure-JVM popcount filter.
    """
    a = sigs.select(F.col(id_col).alias("id_a"), F.col(sig_col).alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col(sig_col).alias("sig_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= F.lit(threshold))
        .select("id_a", "id_b", "hamming")
    )


def verify_pairs_minhash(
    pairs: DataFrame,
    sigs: DataFrame,
    min_agreement: float,
    id_col: str = "clip_id",
    sig_col: str = "minhash_sig",
) -> DataFrame:
    """Verify stage for MinHash signatures: slot-agreement fraction (unbiased
    Jaccard estimator) >= min_agreement. Avoids re-shingling inside the join."""
    from file_deduplicator_spark.functions.minhash_sql import sig_agreement_col

    a = sigs.select(F.col(id_col).alias("id_a"), F.col(sig_col).alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col(sig_col).alias("sig_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("agreement", sig_agreement_col(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("agreement") >= F.lit(min_agreement))
        .select("id_a", "id_b", "agreement")
    )
