"""Finer warm decomposition: signature stage vs digest window vs LSH parts."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.session import get_spark

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))

import bench

bench.warm_pipeline(spark)

clips = spark.read.parquet("/root/repo/.cache/clips_n200000_s42/clips.parquet")
cfg = DedupConfig()

from pyspark import StorageLevel
from pyspark.sql import Window

from file_deduplicator_spark.functions.minhash_sql import (
    minhash_bands_col,
    minhash_fold_col,
    simhash_bands_col,
)
from file_deduplicator_spark.operators.lsh import (
    band_table,
    candidate_pairs_folded,
    candidate_pairs_hamming,
)
from file_deduplicator_spark.plans.pipeline import (
    apply_prefilters,
    digest_representatives,
    with_signatures,
)


def tick(name, t0):
    d = round(time.perf_counter() - t0, 2)
    print(f"  {name}: {d}", flush=True)


for run in range(2):
    print(f"--- run {run}", flush=True)
    t_all = time.perf_counter()

    # A1: decode only (no digest window) — noop sink
    t0 = time.perf_counter()
    raw_sigs = with_signatures(apply_prefilters(clips, cfg), cfg).drop("bytes")
    raw_sigs.write.format("noop").mode("overwrite").save()
    tick("A1_decode_noop", t0)

    # A2: decode + digest window + persist + count (the pipeline's sigs)
    t0 = time.perf_counter()
    w_digest = Window.partitionBy("digest")
    sigs = (with_signatures(apply_prefilters(clips, cfg), cfg).drop("bytes")
            .withColumn("digest_root", F.min("clip_id").over(w_digest)).persist())
    sigs.count()
    tick("A2_sigs_window_cache", t0)

    reps = digest_representatives(sigs, "clip_id")

    # B1: audio band table cache + probe-equivalent count
    t0 = time.perf_counter()
    audio = reps.filter(F.col("sim_sig").isNotNull())
    w_sig = Window.partitionBy("sim_sig").orderBy("clip_id")
    ranked = audio.select("clip_id", "sim_sig").withColumn(
        "_rn", F.row_number().over(w_sig)
    ).withColumn("_root", F.min("clip_id").over(w_sig.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
    sig_reps = ranked.filter(F.col("_rn") == 1).select("clip_id", "sim_sig")
    bands_a = band_table(
        sig_reps,
        simhash_bands_col(F.col("sim_sig"), cfg.simhash_bands,
                          cfg.simhash_rotations, cfg.simhash_key_blocks,
                          cfg.simhash_design),
        "clip_id", payload={"sig": "sim_sig"},
    ).persist(StorageLevel.MEMORY_AND_DISK)
    probe = (bands_a.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") > cfg.bucket_cap))
    probe.limit(1).take(1)
    tick("B1_audio_bands_probe", t0)

    # B2: audio fused expansion
    t0 = time.perf_counter()
    pairs_a = candidate_pairs_hamming(bands_a, cfg, cfg.effective_threshold)
    n_a = pairs_a.count()
    tick("B2_audio_expansion", t0)

    # B3: text band cache + probe
    t0 = time.perf_counter()
    text = reps.filter(F.length(F.trim(F.col("transcript"))) > 0)
    text = text.withColumn("_mh_fold", minhash_fold_col(F.col("minhash_sig"), cfg.num_perm))
    bands_t = band_table(
        text, minhash_bands_col(F.col("minhash_sig"), cfg.minhash_bands, cfg.minhash_rows),
        "clip_id", payload={"fold": "_mh_fold"},
    ).persist(StorageLevel.MEMORY_AND_DISK)
    probe_t = (bands_t.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("n"))
               .filter(F.col("n") > cfg.bucket_cap))
    probe_t.limit(1).take(1)
    tick("B3_text_bands_probe", t0)

    # B4: text folded expansion
    t0 = time.perf_counter()
    k_min = next((k for k in range(cfg.num_perm + 1)
                  if k / cfg.num_perm >= cfg.jaccard_threshold), cfg.num_perm + 1)
    pairs_t = candidate_pairs_folded(bands_t, cfg, cfg.num_perm - k_min)
    n_t = pairs_t.count()
    tick("B4_text_expansion", t0)

    # B5: text verify joins
    t0 = time.perf_counter()
    from file_deduplicator_spark.functions.minhash_sql import sig_agreement_col

    mh = reps.select(F.col("clip_id"), F.col("minhash_sig"))
    a = mh.select(F.col("clip_id").alias("id_a"), F.col("minhash_sig").alias("_mh_a"))
    b = mh.select(F.col("clip_id").alias("id_b"), F.col("minhash_sig").alias("_mh_b"))
    ver_t = (pairs_t.join(a, "id_a").join(b, "id_b")
             .filter(sig_agreement_col(F.col("_mh_a"), F.col("_mh_b"))
                     >= F.lit(cfg.jaccard_threshold))
             .select("id_a", "id_b"))
    n_v = ver_t.count()
    tick("B5_text_verify", t0)
    print(f"   pairs: audio={n_a} text_cand={n_t} text_ver={n_v}", flush=True)

    print(f"run total {round(time.perf_counter() - t_all, 2)}", flush=True)
    for df in (sigs, bands_a, bands_t):
        df.unpersist()
