"""Fine-grain warm profiling of the near-dup candidate/verify stage.

Splits near_dup_edges into its audio (SimHash fused-Hamming) and text
(MinHash bands + join verify) parts, warm (pilot pass first), so the
numbers match the bench methodology (min-over-runs ≈ steady state).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.functions.minhash_sql import (
    minhash_bands_col,
    sig_agreement_col,
    simhash_bands_col,
)
from file_deduplicator_spark.operators.lsh import (
    band_table,
    candidate_pairs,
    candidate_pairs_hamming,
)
from file_deduplicator_spark.plans.pipeline import (
    digest_representatives,
    with_signatures,
)
from file_deduplicator_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
clips = spark.read.parquet(f"/root/repo/.cache/clips_n{N}_s42/clips.parquet")
cfg = DedupConfig()

from pyspark.sql import Window

sigs = with_signatures(clips, cfg).drop("bytes")
sigs = sigs.withColumn(
    "digest_root", F.min("clip_id").over(Window.partitionBy("digest"))
).persist()
t0 = time.perf_counter()
sigs.count()
print("signatures+digest_root (cold):", round(time.perf_counter() - t0, 1))
t0 = time.perf_counter()
sigs.count()
print("signatures cached count:", round(time.perf_counter() - t0, 1))

reps = digest_representatives(sigs, "clip_id")

timings = {}


def tick(name, fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    timings[name] = round(best, 2)
    print(name, timings[name], "->", r, flush=True)
    return r


# --- audio: identical-sig quarantine + fused hamming ---
w_sig = Window.partitionBy("sim_sig").orderBy("clip_id")
audio = reps.filter(F.col("sim_sig").isNotNull())
ranked = audio.select("clip_id", "sim_sig").withColumn(
    "_rn", F.row_number().over(w_sig)
)
sig_reps = ranked.filter(F.col("_rn") == 1).select("clip_id", "sim_sig")

bands_a = band_table(
    sig_reps,
    simhash_bands_col(F.col("sim_sig"), cfg.simhash_bands, cfg.simhash_rotations,
                      cfg.simhash_key_blocks, cfg.simhash_design),
    "clip_id",
    payload={"sig": "sim_sig"},
).persist(StorageLevel.MEMORY_AND_DISK)
tick("audio_band_table_build", lambda: bands_a.count())
tick("audio_fused_pairs", lambda: candidate_pairs_hamming(
    bands_a, cfg, cfg.effective_threshold).count())

# --- text: minhash bands, candidates, verify joins ---
text = reps.filter(F.length(F.trim(F.col("transcript"))) > 0)
bands_t = band_table(
    text, minhash_bands_col(F.col("minhash_sig"), cfg.minhash_bands, cfg.minhash_rows),
    "clip_id",
).persist(StorageLevel.MEMORY_AND_DISK)
tick("text_band_table_build", lambda: bands_t.count())
pairs_t = candidate_pairs(bands_t, cfg)
tick("text_candidate_pairs", lambda: pairs_t.count())

mh = reps.select(F.col("clip_id"), F.col("minhash_sig"))
a = mh.select(F.col("clip_id").alias("id_a"), F.col("minhash_sig").alias("_mh_a"))
b = mh.select(F.col("clip_id").alias("id_b"), F.col("minhash_sig").alias("_mh_b"))
verified = (
    pairs_t.join(a, "id_a").join(b, "id_b")
    .filter(sig_agreement_col(F.col("_mh_a"), F.col("_mh_b")) >= F.lit(cfg.jaccard_threshold))
    .select("id_a", "id_b")
)
tick("text_candidates_plus_verify_joins", lambda: verified.count())

print(timings)
bands_a.unpersist()
bands_t.unpersist()
sigs.unpersist()
