"""The flagship end-to-end dedup pipeline over a clips table.

Relational form (SURVEY §1.3, generalizing main.go:307-520):

    scan(clips) → filter(size, codec) → project(+digest, +sim_sig, +minhash)
    → exact clusters (digest)                                   [A1]
    → near-dup candidates (SimHash bands ∪ MinHash bands) → verify  [A2→LSH]
    → connected components over (exact ∪ verified-near ∪ containment) edges
    → keeper selection per cluster                              [W1]
    → report / action plan / metrics                            [S3-S7]

Scale shape: one wide stage computes all signatures in a single pass over
``bytes`` (column-pruned to id+bytes for the Python stage); the edge list
that feeds CC is tiny relative to the input; everything downstream shuffles
on cluster_id once.

Exact-dup quarantine (SURVEY §7.3 skew): only one representative per digest
enters the near-dup stage — byte-identical rows (e.g. the hot_bucket silence
clips) can't create quadratic LSH buckets; their cluster membership is
recovered by unioning digest edges into CC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.functions.minhash_sql import (
    minhash_bands_col,
    simhash_bands_col,
    with_minhash_sig,
)
from file_deduplicator_spark.functions.udfs import audio_sig_col
from file_deduplicator_spark.operators.components import attach_clusters, connected_components
from file_deduplicator_spark.operators.exact import codec_filter, size_filter, with_digest
from file_deduplicator_spark.operators.keeper import label_keepers
from file_deduplicator_spark.operators.lsh import (
    band_table,
    candidate_pairs,
    verify_pairs_hamming,
    verify_pairs_minhash,
)
from file_deduplicator_spark.operators.report import action_plan, dedup_report


def with_signatures(df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """digest + size + sim_sig (audio SimHash, pandas UDF) + minhash_sig
    (transcript MinHash, pure Column expr) in one projection stage."""
    out = with_digest(df, cfg)
    if cfg.perceptual:
        out = out.withColumn("sim_sig", audio_sig_col(F.col("bytes"), cfg.sim_algo))
    out = with_minhash_sig(
        out, "transcript", "minhash_sig", cfg.num_perm, cfg.shingle_k, cfg.minhash_seed
    )
    return out


def exact_edges(sigs: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """Star edges digest-min-id → member (linear, not quadratic, per group)."""
    from pyspark.sql import Window

    w = Window.partitionBy("digest")
    return (
        sigs.withColumn("_root", F.min(id_col).over(w))
        .filter(F.col("_root") != F.col(id_col))
        .select(F.col("_root").alias("id_a"), F.col(id_col).alias("id_b"))
    )


def digest_representatives(sigs: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """One row per digest (min id) — the exact-dup quarantine before LSH."""
    from pyspark.sql import Window

    w = Window.partitionBy("digest").orderBy(id_col)
    return sigs.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def near_dup_edges(sigs: DataFrame, cfg: DedupConfig, id_col: str = "clip_id") -> DataFrame:
    """Verified near-duplicate pairs from both modalities.

    Audio: SimHash bands → Hamming ≤ threshold (ref threshold semantics
    main.go:147 / perceptual.go:401-404). Text: MinHash bands → slot
    agreement ≥ jaccard_threshold.
    """
    reps = digest_representatives(sigs, id_col)

    edges = None
    if cfg.perceptual:
        audio = reps.filter(F.col("sim_sig").isNotNull())
        bands_a = band_table(
            audio, simhash_bands_col(F.col("sim_sig"), cfg.simhash_bands, cfg.simhash_rotations),
            id_col,
        )
        cand_a = candidate_pairs(bands_a, cfg)
        edges = verify_pairs_hamming(
            cand_a, audio.select(id_col, "sim_sig"), cfg.effective_threshold,
            id_col=id_col, sig_col="sim_sig",
        ).select("id_a", "id_b")

    text = reps.filter(F.length(F.trim(F.col("transcript"))) > 0)
    bands_t = band_table(
        text, minhash_bands_col(F.col("minhash_sig"), cfg.minhash_bands, cfg.minhash_rows),
        id_col,
    )
    cand_t = candidate_pairs(bands_t, cfg)
    text_edges = verify_pairs_minhash(
        cand_t, text.select(id_col, "minhash_sig"), cfg.jaccard_threshold,
        id_col=id_col, sig_col="minhash_sig",
    ).select("id_a", "id_b")

    return text_edges if edges is None else edges.union(text_edges)


def dedup_pipeline(
    clips: DataFrame,
    cfg: DedupConfig = DedupConfig(),
    id_col: str = "clip_id",
    extra_edges: DataFrame | None = None,
) -> dict:
    """Run the full pipeline; returns dict of DataFrames + metrics:
    ``clustered`` (every input row + cluster_id + action), ``pairs`` (edge
    list), ``report`` (1 row), ``plan`` (action plan), ``cc_metrics``.
    """
    filtered = codec_filter(size_filter(with_digest(clips, cfg), cfg), cfg)
    # recompute signatures on the filtered set (digest already present)
    sigs = filtered
    if cfg.perceptual:
        sigs = sigs.withColumn("sim_sig", audio_sig_col(F.col("bytes"), cfg.sim_algo))
    sigs = with_minhash_sig(
        sigs, "transcript", "minhash_sig", cfg.num_perm, cfg.shingle_k, cfg.minhash_seed
    )
    sigs = sigs.persist()

    e_exact = exact_edges(sigs, id_col)
    e_near = near_dup_edges(sigs, cfg, id_col)
    all_edges = e_exact.union(e_near)
    if extra_edges is not None:
        all_edges = all_edges.union(extra_edges.select("id_a", "id_b"))
    all_edges = all_edges.distinct()

    labels, cc_metrics = connected_components(all_edges, cfg.cc_max_iters)
    clustered = attach_clusters(sigs, labels, id_col)

    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id")
    dup_rows = clustered.withColumn("group_count", F.count(F.lit(1)).over(w)).filter(
        F.col("group_count") > 1
    )
    labeled = label_keepers(dup_rows, cfg.keep_criteria, id_col=id_col)

    return {
        "signatures": sigs,
        "pairs": all_edges,
        "clustered": clustered,
        "labeled": labeled,
        "report": dedup_report(labeled),
        "plan": action_plan(labeled, id_col),
        "cc_metrics": cc_metrics,
    }
