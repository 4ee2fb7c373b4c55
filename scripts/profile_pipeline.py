"""Phase-level profiling of the clips dedup pipeline on cached bench clips."""

import sys, time, os

sys.path.insert(0, "/root/repo")

from file_deduplicator_spark.session import get_spark
from file_deduplicator_spark.config import DedupConfig
from pyspark.sql import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
clips = spark.read.parquet(f"/root/repo/.cache/clips_n{N}_s42/clips.parquet")
cfg = DedupConfig()

from file_deduplicator_spark.functions.udfs import audio_sig_col
from file_deduplicator_spark.functions.minhash_sql import (
    minhash_bands_col, simhash_bands_col, with_minhash_sig)
from file_deduplicator_spark.operators.exact import with_digest, size_filter, codec_filter
from file_deduplicator_spark.plans.pipeline import (
    exact_edges, digest_representatives, near_dup_edges)
from file_deduplicator_spark.operators.lsh import band_table, candidate_pairs, \
    verify_pairs_hamming, verify_pairs_minhash
from file_deduplicator_spark.operators.components import connected_components, attach_clusters
from file_deduplicator_spark.operators.keeper import label_keepers
from file_deduplicator_spark.operators.report import dedup_report

t = {}
def tick(name, fn):
    t0 = time.perf_counter()
    r = fn()
    t[name] = round(time.perf_counter() - t0, 1)
    print(name, t[name], flush=True)
    return r

from file_deduplicator_spark.plans.pipeline import with_signatures
sigs = with_signatures(clips, cfg).drop("bytes").persist()
tick("1_signatures", lambda: sigs.count())

e_exact = exact_edges(sigs)
tick("2_exact_edges", lambda: e_exact.count())

reps = digest_representatives(sigs).persist()
tick("3_reps", lambda: reps.count())

ver_a = near_dup_edges(sigs, cfg).persist()
tick("4_near_edges_all", lambda: ver_a.count())

all_edges = e_exact.union(ver_a.select("id_a", "id_b")).distinct()
labels, met = None, None
def run_cc():
    global labels, met
    labels, met = connected_components(all_edges, cfg.cc_max_iters)
    return labels.count()
tick("8_cc", run_cc)
print("cc metrics:", met)

clustered = attach_clusters(sigs, labels)
from pyspark.sql import Window
w = Window.partitionBy("cluster_id")
dup_rows = clustered.withColumn("group_count", F.count(F.lit(1)).over(w)).filter(F.col("group_count") > 1)
labeled = label_keepers(dup_rows, cfg.keep_criteria)
tick("9_keeper_report", lambda: dedup_report(labeled).collect())
tick("10_clustered_count", lambda: clustered.count())

print("TOTAL", round(sum(t.values()), 1))
print(t)
