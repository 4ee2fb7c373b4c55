"""Contained-transcript detection: winnowed-fingerprint candidates +
suffix-array verification (north_star requirement; no reference analog —
the reference only matches whole-content digests and whole-image hashes).

Why not MinHash: containment of a short transcript A inside a long B has
Jaccard |A|/|B| → 0, so symmetric MinHash misses it by design.

Candidate generation (JVM-side, winnowing — Schleimer et al., MOSS 2003):
over the k-word shingle hash sequence, select the minimum hash of every
``window`` consecutive shingles. GUARANTEE: any shared contiguous run of
≥ window + k - 1 words shares at least one selected fingerprint, so recall
for ≥ min_words overlaps is 1.0 at window = min_words - k + 1... we use
window ≤ containment_min_words - shingle_k + 1.

Verification (Python, per container): build the suffix array of the
container transcript ONCE, binary-search each candidate needle
(functions/suffix.py). Grouped by container id via applyInPandas — each
group is one container + all its candidate needles; skew-bounded by the
per-fingerprint bucket cap.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.functions.minhash_sql import words_col


def winnowed_fingerprints_col(hashes: Column, window: int) -> Column:
    """array<long> of winnowed fingerprints (distinct window-min values) over
    a PRE-MATERIALIZED shingle-hash array column.

    ``hashes`` MUST be a plain column reference (use ``withColumn`` first),
    not an inline expression: HOF lambdas re-evaluate embedded subexpressions
    per element, so an inline shingle pipeline here would rebuild the whole
    hash array once per window position — quadratic per row."""
    n = F.size(hashes)
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(n - F.lit(window), F.lit(0))),
        lambda i: F.array_min(F.slice(hashes, i + F.lit(1), F.lit(window))),
    )
    return F.when(n <= 0, F.array().cast("array<long>")).otherwise(F.array_distinct(wins))


def containment_candidates(
    df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "clip_id",
    text_col: str = "transcript",
) -> DataFrame:
    """(id_a=needle, id_b=container) candidate pairs: share a winnowed
    fingerprint AND needle is strictly shorter (in words); needle must have
    ≥ containment_min_words words. Per-fingerprint buckets capped."""
    window = max(2, cfg.containment_min_words - cfg.shingle_k + 1)
    # words → shingles → hashes materialized stage-by-stage: each HOF input
    # is a plain column reference, never an inline pipeline (HOF lambdas
    # re-evaluate embedded subexpressions per element — the old inline
    # shingle_hashes_col form re-split the text once per shingle; warm
    # containment_docs at sf0.1 measured 6.1s → 2.4s with this change)
    from file_deduplicator_spark.functions.minhash_sql import shingles_from_words

    base = (
        df.select(F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("_ws"))
        .select(
            "id",
            F.size(F.col("_ws")).alias("n_words"),
            shingles_from_words(F.col("_ws"), cfg.shingle_k).alias("_sh"),
        )
        .select(
            "id",
            "n_words",
            F.transform(
                F.col("_sh"),
                lambda s: F.xxhash64(s).bitwiseAND(F.lit(0x7FFFFFFF)),
            ).alias("_h"),
        )
        .select(
            "id",
            "n_words",
            F.explode(winnowed_fingerprints_col(F.col("_h"), window)).alias("fp"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("id")
    base = base.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= cfg.bucket_cap
    ).drop("_rn")

    # base feeds both join sides (needles + containers) WITHOUT a persist —
    # measured deliberately (5 warm runs each at sf0.1): persisting the
    # exploded fingerprint relation was NET NEGATIVE (median 3.24s vs 2.96s)
    # because the window cap already hash-partitions base by fp, the join
    # consumes that same distribution on both sides, and the subtree is
    # map-side-cheap (scan + explode) — the cache write/read costs more than
    # the replay. Contrast textops.ngram_jaccard_pairs, where the shared
    # subtree carries TWO extra shuffles (frequency join + collect_list) and
    # the persist measured 2x faster.
    needles = base.filter(F.col("n_words") >= cfg.containment_min_words).select(
        F.col("fp"), F.col("id").alias("id_a"), F.col("n_words").alias("wa")
    )
    containers = base.select(F.col("fp"), F.col("id").alias("id_b"), F.col("n_words").alias("wb"))
    return (
        needles.join(containers, "fp")
        .filter((F.col("id_a") != F.col("id_b")) & (F.col("wa") < F.col("wb")))
        .select("id_a", "id_b")
        .distinct()
    )


def verify_containment(
    candidates: DataFrame,
    df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "clip_id",
    text_col: str = "transcript",
) -> DataFrame:
    """Suffix-array verify: keep (id_a, id_b) where transcript_a occurs
    word-aligned inside transcript_b. One SA build per container group."""
    id_type = dict(df.dtypes)[id_col]
    texts_a = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("text_a"))
    texts_b = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("text_b"))
    joined = candidates.join(texts_a, "id_a").join(texts_b, "id_b")

    def verify_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from file_deduplicator_spark.functions.suffix import suffix_array, word_contains

        out = []
        # group = one container (id_b); build its SA once
        container = pdf["text_b"].iloc[0]
        c = (" " + " ".join(container.lower().split()) + " ").encode("utf-8")
        sa = suffix_array(c)
        for id_a, id_b, text_a in zip(pdf["id_a"], pdf["id_b"], pdf["text_a"]):
            if word_contains(container, text_a, sa=sa):
                out.append((id_a, id_b))
        return pd.DataFrame(out, columns=["id_a", "id_b"])

    return joined.groupBy("id_b").applyInPandas(
        verify_group, schema=f"id_a {id_type}, id_b {id_type}"
    )


def containment_edges(df: DataFrame, cfg: DedupConfig, id_col: str = "clip_id",
                      text_col: str = "transcript") -> DataFrame:
    cands = containment_candidates(df, cfg, id_col, text_col)
    return verify_containment(cands, df, cfg, id_col, text_col)
