"""Warm phase-level timing of the REAL dedup_pipeline at 200k (bench fixture).

Mirrors bench.py methodology (warmup pass first), then times each eager
phase of dedup_pipeline + the two bench actions, twice. Phases:

  A  construction (probe jobs: sigs cache + band caches + 2 probes)
  B  connected_components (edge checkpoint + driver UF)   [inside A, split
     by calling near_dup_edges/CC manually in the same order]
  C  report.collect()
  D  clustered.count()
"""

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

from pyspark.sql import Observation, Window

from file_deduplicator_spark.operators.components import connected_components
from file_deduplicator_spark.operators.keeper import label_keepers
from file_deduplicator_spark.operators.report import dedup_report
from file_deduplicator_spark.plans.pipeline import (
    apply_prefilters,
    exact_edges,
    near_dup_edges,
    with_signatures,
)

for run in range(2):
    t = {}

    def tick(name, t0):
        t[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {t[name]}", flush=True)

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    filtered = apply_prefilters(clips, cfg)
    sigs = with_signatures(filtered, cfg)
    w_digest = Window.partitionBy("digest")
    sigs = sigs.drop("bytes").withColumn(
        "digest_root", F.min("clip_id").over(w_digest)).persist()
    sigs.count()  # materialize the cache explicitly so phase A is clean
    tick("A_sigs_cache", t0)

    t0 = time.perf_counter()
    lsh_obs = Observation(f"lsh_{run}")
    caches = [sigs]
    e_near = near_dup_edges(sigs, cfg, "clip_id", observation=lsh_obs,
                            caches=caches)
    tick("B_probes_bands", t0)  # eager probe jobs inside near_dup_edges

    t0 = time.perf_counter()
    cc_edges = e_near.distinct()
    labels, cc_metrics = connected_components(cc_edges, cfg.cc_max_iters)
    tick("C_cc", t0)
    print("   cc:", cc_metrics, flush=True)

    t0 = time.perf_counter()
    lab = labels.select(F.col("id").alias("digest_root"),
                        F.col("cluster_id").alias("_cc"))
    clustered = (
        sigs.join(lab, "digest_root", "left")
        .withColumn("cluster_id", F.coalesce(F.col("_cc"), F.col("digest_root")))
        .drop("_cc")
    )
    w = Window.partitionBy("cluster_id")
    dup_rows = clustered.withColumn(
        "group_count", F.count(F.lit(1)).over(w)).filter(F.col("group_count") > 1)
    labeled = label_keepers(dup_rows, cfg.keep_criteria, id_col="clip_id")
    dedup_report(labeled).collect()
    tick("D_report", t0)

    t0 = time.perf_counter()
    clustered.count()
    tick("E_clustered_count", t0)
    print(f"RUN {run} TOTAL {round(time.perf_counter() - t_all, 2)}", flush=True)
    for df in caches:
        df.unpersist()
