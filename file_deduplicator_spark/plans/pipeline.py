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
from file_deduplicator_spark.operators.lsh import band_table, candidate_pairs, candidate_pairs_hamming
from file_deduplicator_spark.operators.report import action_plan, cluster_stats, dedup_report


def apply_prefilters(df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Cheap predicates BEFORE the expensive signature stage (filter-then-
    hash, ref main.go:396-441), expressed directly on ``bytes`` so Catalyst
    pushes them into the scan. Shared by the batch pipeline AND the
    watch/stream paths — the reference re-applies the same size/pattern
    checks per watch event (main.go:1683-1704, F6)."""
    pre = df
    if cfg.min_size > 0 or cfg.max_size > 0:
        size_expr = F.length(F.col("bytes")).cast("long")
        pred = size_expr >= F.lit(cfg.min_size)
        if cfg.max_size > 0:
            pred = pred & (size_expr <= F.lit(cfg.max_size))
        pre = pre.filter(pred)
    return codec_filter(pre, cfg)


def with_signatures(df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """digest + size + sim_sig (audio SimHash) + minhash_sig (transcript
    MinHash) in one projection stage.

    Default impl ('pandas'): ONE combined Arrow UDF evaluates both per-row
    kernels, so ``bytes`` crosses to Python exactly once. 'sql' keeps the
    whole plan JVM-side (pure Column exprs) at ~3x the signature-stage cost.
    """
    out = with_digest(df, cfg)
    if cfg.minhash_impl in ("arrow", "pandas") and cfg.perceptual:
        from file_deduplicator_spark.functions.udfs import (
            signatures_map_in_arrow,
            signatures_map_in_pandas,
        )

        # digest/size are computed JVM-side in the projection above; the
        # map stage then CONSUMES bytes (see udfs.py docstrings for why a
        # consuming map, not a pandas_udf projection, and why mapInArrow
        # beats mapInPandas ~5x on 25KB binary rows)
        stage = (signatures_map_in_arrow if cfg.minhash_impl == "arrow"
                 else signatures_map_in_pandas)
        return stage(out, cfg.sim_algo, cfg.num_perm, cfg.shingle_k, cfg.minhash_seed)
    if cfg.perceptual:
        out = out.withColumn("sim_sig", audio_sig_col(F.col("bytes"), cfg.sim_algo))
    else:
        out = out.withColumn("sim_sig", F.lit(None).cast("long"))
    if cfg.minhash_impl in ("arrow", "pandas"):
        from file_deduplicator_spark.functions.udfs import make_minhash_udf

        out = out.withColumn(
            "minhash_sig",
            make_minhash_udf(cfg.num_perm, cfg.shingle_k, cfg.minhash_seed)(F.col("transcript")),
        )
    else:
        out = with_minhash_sig(
            out, "transcript", "minhash_sig", cfg.num_perm, cfg.shingle_k, cfg.minhash_seed
        )
    return out


def exact_edges(sigs: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """Star edges digest-min-id → member (linear, not quadratic, per group).
    Reuses a precomputed ``digest_root`` column when present."""
    if "digest_root" in sigs.columns:
        rooted = sigs.withColumn("_root", F.col("digest_root"))
    else:
        from pyspark.sql import Window

        rooted = sigs.withColumn("_root", F.min(id_col).over(Window.partitionBy("digest")))
    return (
        rooted.filter(F.col("_root") != F.col(id_col))
        .select(F.col("_root").alias("id_a"), F.col(id_col).alias("id_b"))
    )


def digest_representatives(sigs: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """One row per digest (min id) — the exact-dup quarantine before LSH.
    Reuses a precomputed ``digest_root`` column when present."""
    if "digest_root" in sigs.columns:
        return sigs.filter(F.col(id_col) == F.col("digest_root"))
    from pyspark.sql import Window

    w = Window.partitionBy("digest").orderBy(id_col)
    return sigs.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def near_dup_edges(
    sigs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "clip_id",
    observation=None,
    caches: list | None = None,
) -> DataFrame:
    """Verified near-duplicate pairs from both modalities.

    Audio: SimHash bands → Hamming ≤ threshold (ref threshold semantics
    main.go:147 / perceptual.go:401-404), with the Hamming predicate fused
    INTO the bucket pair-expansion (lsh.candidate_pairs_hamming): the
    8-byte sim_sig rides the band table, so only true audio edges ever
    reach a shuffle. This is the round-2.5 rework — measured at 500k
    clips, the correlated envelope bits made the 24-bit table keys
    collide into 5.7M distinct candidates whose distinct+join verify
    dominated the whole pipeline, super-linearly.

    Text: MinHash bands → candidate pairs → slot agreement ≥
    jaccard_threshold via one self-join verify (the 512-byte signature is
    too fat to carry into buckets; its near-uniform 64-bit band keys keep
    candidate counts ~linear, so the join stays cheap). Empty transcripts
    never enter the text band table (degenerate all-EMPTY_SLOT signatures
    must not match each other).

    ``observation``: optional pyspark Observation for audio bucket-skew
    metrics (rides the first action; the audio family is the skew driver).
    """
    reps = digest_representatives(sigs, id_col)

    sig_star = None
    parts = []
    bands_a = None
    from pyspark import StorageLevel

    if cfg.perceptual:
        audio = reps.filter(F.col("sim_sig").isNotNull())
        # second-level quarantine: rows with IDENTICAL signatures (Hamming 0)
        # are linked by linear star edges and enter LSH as one representative
        # — near-identical corpora otherwise re-create the quadratic buckets
        # the digest quarantine just removed.
        from pyspark.sql import Window

        w_sig = Window.partitionBy("sim_sig").orderBy(id_col)
        ranked = audio.select(id_col, "sim_sig").withColumn(
            "_rn", F.row_number().over(w_sig)
        ).withColumn("_root", F.min(id_col).over(w_sig.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        sig_star = (
            ranked.filter(F.col("_rn") > 1)
            .select(F.col("_root").alias("id_a"), F.col(id_col).alias("id_b"))
        )
        sig_reps = ranked.filter(F.col("_rn") == 1).select(id_col, "sim_sig")

        # the hot-bucket-targeted skew guard reads the band table three
        # times (count pass, cold anti-join, hot semi-join) — persist so
        # the explode runs once, spilling to disk if it outgrows memory
        bands_a = band_table(
            sig_reps,
            simhash_bands_col(F.col("sim_sig"), cfg.simhash_bands,
                              cfg.simhash_rotations, cfg.simhash_key_blocks,
                              cfg.simhash_design),
            id_col,
            payload={"sig": "sim_sig"},
        ).persist(StorageLevel.MEMORY_AND_DISK)
        if caches is not None:
            caches.append(bands_a)

    text = reps.filter(F.length(F.trim(F.col("transcript"))) > 0)
    use_fold = cfg.minhash_prefilter and cfg.num_perm % 16 == 0
    if use_fold:
        # round-4: the 32-byte nibble fold rides the band table so
        # non-matching candidates are rejected INSIDE the bucket expansion
        # (provable-mismatch bound — exactly conservative, verified pair
        # set unchanged); only survivors reach the two verify joins below.
        # Measured honestly at the 200k bench fixture: banding (b=16, r=4)
        # is already precise on its bimodal transcripts — 193,548
        # candidates, all of which pass the verify — so the filter rejects
        # ~nothing THERE and costs ~4 integer ops per in-bucket pair. Its
        # value is adversarial/real corpora (boilerplate-heavy text where
        # band collisions far exceed true pairs), where every rejected
        # candidate saves two join lookups and a shuffle row.
        from file_deduplicator_spark.functions.minhash_sql import minhash_fold_col
        from file_deduplicator_spark.operators.lsh import candidate_pairs_folded

        text = text.withColumn(
            "_mh_fold", minhash_fold_col(F.col("minhash_sig"), cfg.num_perm)
        )
        bands_t = band_table(
            text,
            minhash_bands_col(F.col("minhash_sig"), cfg.minhash_bands, cfg.minhash_rows),
            id_col,
            payload={"fold": "_mh_fold"},
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        bands_t = band_table(
            text, minhash_bands_col(F.col("minhash_sig"), cfg.minhash_bands, cfg.minhash_rows),
            id_col,
        ).persist(StorageLevel.MEMORY_AND_DISK)
    if caches is not None:
        caches.append(bands_t)

    # ONE fused probe job for every band family (r06, guide §2.6): the
    # per-family probes were separate eager jobs, each paying its own
    # scheduling + cache-materialization pass; a union of the (map-side-
    # combinable) per-family max-bucket aggregates materializes BOTH band
    # caches in one job and returns both maxima in one collect. The result
    # feeds bucket_members' collect-safety rule via max_bucket, skipping
    # the per-call probes entirely.
    max_by_family: dict[str, int] = {}
    if cfg.salt_buckets > 1:
        probes = []
        if bands_a is not None:
            probes.append(
                bands_a.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("n"))
                .agg(F.max("n").alias("mx")).select(F.lit("a").alias("fam"), "mx")
            )
        probes.append(
            bands_t.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx")).select(F.lit("t").alias("fam"), "mx")
        )
        fused = probes[0]
        for extra in probes[1:]:
            fused = fused.unionByName(extra)
        for row in fused.collect():
            max_by_family[row["fam"]] = row["mx"] if row["mx"] is not None else 0

    if bands_a is not None:
        parts.append(
            candidate_pairs_hamming(
                bands_a, cfg, cfg.effective_threshold, observation=observation,
                max_bucket=max_by_family.get("a"),
            )
        )
    if use_fold:
        # Smallest agreement count k the verify stage accepts, computed with
        # the SAME double-division compare the verify uses (k/num_perm >=
        # threshold) — math.ceil(t * num_perm) overshoots when t*num_perm is
        # an exact integer (ceil(0.55*400) == 221 in IEEE double), which would
        # make the "exactly conservative" fold pre-filter drop pairs the
        # verify keeps.
        k_min = next(
            (k for k in range(cfg.num_perm + 1)
             if k / cfg.num_perm >= cfg.jaccard_threshold),
            cfg.num_perm + 1,
        )
        max_mismatch = cfg.num_perm - k_min
        pairs_t = candidate_pairs_folded(bands_t, cfg, max_mismatch,
                                         max_bucket=max_by_family.get("t"))
    else:
        pairs_t = candidate_pairs(bands_t, cfg,
                                  max_bucket=max_by_family.get("t"))

    from file_deduplicator_spark.functions.minhash_sql import sig_agreement_col

    mh = reps.select(F.col(id_col), F.col("minhash_sig"))
    a = mh.select(F.col(id_col).alias("id_a"), F.col("minhash_sig").alias("_mh_a"))
    b = mh.select(F.col(id_col).alias("id_b"), F.col("minhash_sig").alias("_mh_b"))
    parts.append(
        pairs_t.join(a, "id_a")
        .join(b, "id_b")
        .filter(sig_agreement_col(F.col("_mh_a"), F.col("_mh_b"))
                >= F.lit(cfg.jaccard_threshold))
        .select("id_a", "id_b")
    )

    verified = parts[0]
    for extra in parts[1:]:
        verified = verified.union(extra)
    # NOTE: a pair verified by BOTH modalities appears twice here; every
    # consumer applies its own single .distinct() (cc_edges and all_edges in
    # dedup_pipeline) — deduping here too would shuffle the same edge list
    # twice (measured as a 4-core pipeline regression when this function
    # distinct'd before the cc_edges distinct).
    return verified if sig_star is None else sig_star.union(verified)


def dedup_pipeline(
    clips: DataFrame,
    cfg: DedupConfig = DedupConfig(),
    id_col: str = "clip_id",
    extra_edges: DataFrame | None = None,
    precomputed_sigs: DataFrame | None = None,
) -> dict:
    """Run the full pipeline; returns dict of DataFrames + metrics:
    ``clustered`` (every input row + cluster_id + action), ``pairs`` (edge
    list), ``report`` (1 row), ``plan`` (action plan), ``cc_metrics``.

    ``precomputed_sigs`` is the resume seam (north rule: "resumable from
    checkpoint with per-partition lineage"): a frame with the
    with_signatures output columns (digest/size/sim_sig/minhash_sig, no
    payload) — typically prior-run signature rows for unchanged input
    partitions unioned with freshly computed rows for changed ones
    (jobs/run_dedup.py --resume-from). The scan/decode stage is skipped
    entirely; prefilters are assumed already applied (signatures are
    always recorded post-filter). Everything downstream — digest_root
    contraction, LSH, CC, keeper — is identical to a full run.
    """
    if precomputed_sigs is not None:
        sigs = precomputed_sigs
        if "bytes" in sigs.columns:
            sigs = sigs.drop("bytes")
    else:
        filtered = apply_prefilters(clips, cfg)
        sigs = with_signatures(filtered, cfg)
    # CRITICAL scale rule: the multi-MB payload column must never enter a
    # shuffle. Signatures are extracted in the (narrow) projection stage
    # above; everything downstream — windows over digest/cluster_id, LSH
    # band joins, CC, keeper ranking — runs on the slim columns only.
    # digest_root rides along: one window pass serves both the exact-dup
    # star contraction and representative selection.
    from pyspark.sql import Window

    w_digest = Window.partitionBy("digest")
    sigs = sigs.drop("bytes").withColumn("digest_root", F.min(id_col).over(w_digest)).persist()

    # CONTRACTION: exact-duplicate stars are resolved by the digest_root
    # column directly — they never enter the iterative CC. CC runs only on
    # edges BETWEEN digest representatives (near-dup + containment), so its
    # node count is |distinct digests that near-collided|, not |dup rows|.
    from pyspark.sql import Observation

    lsh_obs = Observation("lsh_buckets")
    caches: list = [sigs]
    e_near = near_dup_edges(sigs, cfg, id_col, observation=lsh_obs, caches=caches)
    cc_edges = e_near
    if extra_edges is not None:
        # containment/extra edges arrive at row granularity — lift to roots
        root_map = sigs.select(F.col(id_col), F.col("digest_root"))
        lifted = (
            extra_edges.select("id_a", "id_b")
            .join(root_map.withColumnRenamed(id_col, "id_a")
                  .withColumnRenamed("digest_root", "root_a"), "id_a")
            .join(root_map.withColumnRenamed(id_col, "id_b")
                  .withColumnRenamed("digest_root", "root_b"), "id_b")
            .filter(F.col("root_a") != F.col("root_b"))
            .select(F.col("root_a").alias("id_a"), F.col("root_b").alias("id_b"))
        )
        cc_edges = cc_edges.union(lifted)
    cc_edges = cc_edges.distinct()

    labels, cc_metrics = connected_components(cc_edges, cfg.cc_max_iters)
    # rows inherit the label of their digest root; roots without near-dup
    # edges keep digest_root as the cluster id
    lab = labels.select(F.col("id").alias("digest_root"), F.col("cluster_id").alias("_cc"))
    clustered = (
        sigs.join(lab, "digest_root", "left")
        .withColumn("cluster_id", F.coalesce(F.col("_cc"), F.col("digest_root")))
        .drop("_cc")
    )
    # distinct: near-dup edges can repeat across modalities (see
    # near_dup_edges note); 'pairs' is a user-facing edge list and must not
    # double-count (round-3 advice item)
    all_edges = exact_edges(sigs, id_col).union(e_near).distinct()

    from pyspark.sql import Window

    from file_deduplicator_spark.operators.keeper import keeper_order_keys

    # ONE window pass for group_count + keeper rank (r06, guide §2.4): the
    # count and the row_number share (partition, order) specs, so both
    # evaluate in a single Window operator over one sort — the old
    # count-window → filter → label_keepers chain sorted the clustered
    # table twice. Equivalent by construction: the filter drops WHOLE
    # clusters (group_count is per-cluster), so ranking before or after
    # the filter yields identical rn within every surviving cluster.
    keys = keeper_order_keys(cfg.keep_criteria, id_col=id_col)
    w_ord = Window.partitionBy("cluster_id").orderBy(*keys)
    w_cnt = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    labeled = (
        clustered.withColumn("group_count", F.count(F.lit(1)).over(w_cnt))
        .withColumn("rn", F.row_number().over(w_ord))
        .filter(F.col("group_count") > 1)
        .withColumn(
            "action",
            F.when(F.col("rn") == 1, F.lit("KEEP")).otherwise(F.lit("DELETE")),
        )
    )

    return {
        "signatures": sigs,
        "pairs": all_edges,
        "clustered": clustered,
        "labeled": labeled,
        "report": dedup_report(labeled),
        # per-group rollup incl. the reference's similarity display field
        # (main.go:889-893; exact groups = 100.0)
        "clusters": cluster_stats(labeled, sim_threshold=cfg.effective_threshold),
        "plan": action_plan(labeled, id_col),
        "cc_metrics": cc_metrics,
        # bucket-skew metrics (buckets, max_bucket, capped_buckets,
        # capped_dropped_rows) — populated once any returned DataFrame is
        # acted on; read with lsh_observation.get (north rule: skew metrics
        # surfaced, silent caps logged)
        "lsh_observation": lsh_obs,
        # persisted frames backing the result — pass to release_pipeline()
        # when the returned DataFrames are no longer needed
        "caches": caches,
    }


def collect_run_metrics(result: dict) -> dict:
    """Flat run-metrics dict (CC convergence + LSH bucket-skew observation)
    ready for sinks.append_metrics — the reference's Statistics analog
    (main.go:46-59, 1507-1565). Call AFTER at least one action has executed
    on the result (the observation rides the first action)."""
    out: dict = {}
    cc = result.get("cc_metrics") or {}
    for k in ("iterations", "changed_last", "edges", "edges_sym"):
        v = cc.get(k)
        if isinstance(v, (int, float)):
            out[f"cc_{k}"] = v
    out["cc_converged"] = 1.0 if cc.get("converged") else 0.0
    obs = result.get("lsh_observation")
    if obs is not None:
        try:
            for k, v in obs.get.items():
                if v is not None:
                    out[f"lsh_{k}"] = v
        except Exception:
            pass  # no action has run yet — caller gets CC metrics only
    return out


def release_pipeline(result: dict) -> None:
    """Unpersist every cached frame a dedup_pipeline result holds."""
    for df in result.get("caches", []):
        try:
            df.unpersist()
        except Exception:
            pass
