"""SparkSession construction tuned for the dedup workload.

Local-mode testing uses ``local[N]``; the same conf (minus master) applies to
a real cluster via spark-submit. Key decisions for the 100 TB target:

* AQE on (coalesce + skew join) — runtime re-planning for the LSH band join,
  whose bucket-size distribution is data-dependent.
* Arrow batches capped so multi-MB ``bytes`` rows can't OOM an executor
  (SURVEY.md §7.3 "binary payloads through Arrow").
* UTC session timezone so DuckDB oracle comparisons are stable.
* ANSI mode off: the MinHash affine hashing is written overflow-free anyway,
  but third-party exprs shouldn't abort the 12-hour job on a corner row.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "file_deduplicator_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
