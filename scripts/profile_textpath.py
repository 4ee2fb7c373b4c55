"""Repeated warm timing of JUST the text LSH path (B4 expansion + B5 verify)
at 200k, with bandwidth probes. Usage: python scripts/profile_textpath.py [reps]"""

import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import Window
from pyspark.sql import functions as F

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.session import get_spark

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))

from file_deduplicator_spark.functions.minhash_sql import (
    minhash_bands_col,
    minhash_fold_col,
    sig_agreement_col,
)
from file_deduplicator_spark.operators.lsh import band_table, candidate_pairs_folded
from file_deduplicator_spark.plans.pipeline import (
    apply_prefilters,
    digest_representatives,
    with_signatures,
)

clips = spark.read.parquet("/root/repo/.cache/clips_n200000_s42/clips.parquet")
cfg = DedupConfig()

w_digest = Window.partitionBy("digest")
sigs = (with_signatures(apply_prefilters(clips, cfg), cfg).drop("bytes")
        .withColumn("digest_root", F.min("clip_id").over(w_digest)).persist())
sigs.count()
reps_df = digest_representatives(sigs, "clip_id")
text = reps_df.filter(F.length(F.trim(F.col("transcript"))) > 0)
text = text.withColumn("_mh_fold", minhash_fold_col(F.col("minhash_sig"), cfg.num_perm))
bands_t = band_table(
    text, minhash_bands_col(F.col("minhash_sig"), cfg.minhash_bands, cfg.minhash_rows),
    "clip_id", payload={"fold": "_mh_fold"},
).persist(StorageLevel.MEMORY_AND_DISK)
bands_t.count()

k_min = next((k for k in range(cfg.num_perm + 1)
              if k / cfg.num_perm >= cfg.jaccard_threshold), cfg.num_perm + 1)


def bw():
    try:
        out = subprocess.run([sys.executable, "/root/repo/scripts/membw_probe.py", "8", "1"],
                             capture_output=True, text=True, timeout=60).stdout
        return float(out.strip().split()[-2])
    except Exception:
        return None


for rep in range(REPS):
    print(f"bw={bw()}", flush=True)
    t0 = time.perf_counter()
    pairs_t = candidate_pairs_folded(bands_t, cfg, cfg.num_perm - k_min)
    pairs_t = pairs_t.persist()
    n_t = pairs_t.count()
    t1 = time.perf_counter()
    mh = reps_df.select(F.col("clip_id"), F.col("minhash_sig"))
    a = mh.select(F.col("clip_id").alias("id_a"), F.col("minhash_sig").alias("_mh_a"))
    b = mh.select(F.col("clip_id").alias("id_b"), F.col("minhash_sig").alias("_mh_b"))
    ver = (pairs_t.join(a, "id_a").join(b, "id_b")
           .filter(sig_agreement_col(F.col("_mh_a"), F.col("_mh_b"))
                   >= F.lit(cfg.jaccard_threshold))
           .select("id_a", "id_b"))
    n_v = ver.count()
    t2 = time.perf_counter()
    pairs_t.unpersist()
    print(f"rep{rep}: B4_expansion={t1-t0:.2f} B5_verify={t2-t1:.2f} "
          f"cand={n_t} ver={n_v}", flush=True)
