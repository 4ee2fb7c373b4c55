"""Similarity search over embedding columns (task brief: ANN as a
first-class component).

* ``cosine_topk``        — exact brute-force top-k vs a query vector; the
  correctness baseline. Dot product via ``F.zip_with`` + ``F.aggregate`` —
  JVM-side, no UDF, no Python.
* ``lsh_bucketed_topk``  — the scale path: random-hyperplane LSH (SimHash
  for vectors) buckets candidates so only a fraction of the table is scored;
  recall measured against the brute-force baseline in tests.
* ``knn_self_join``      — all-pairs top-k within LSH buckets (near-dup by
  embedding-cosine — the embedding near-dup dedup op).

Scale note: brute-force is O(n·d) per query — fine for one query over 10^8
rows/executor-fleet, wrong for query *sets*; the bucketed variant turns it
into a hash join on (plane-sign bucket) with per-bucket caps.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector. Deterministic
    tie-break on id. Cosine cast to double and rounded for oracle parity."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_col(v, q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim))


def lsh_bucket_col(vec: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane signature: bit i = (v · plane_i) > 0 packed to a
    long — pure Column expressions (one dot product per plane)."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(vec.cast("array<double>"), plane) > 0,
                   F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only rows whose hyperplane bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe LSH)."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(query_vec, p)) > 0:
            qsig |= 1 << i
    bucketed = df.withColumn("_bkt", lsh_bucket_col(F.col(vec_col), planes))
    probed = bucketed.filter(
        F.bit_count(F.col("_bkt").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    )
    return cosine_topk(probed.drop("_bkt"), query_vec, k, id_col, vec_col)


def knn_self_join(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    bucket_cap: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket by hyperplane signature,
    pair within bucket (capped), keep cosine ≥ threshold."""
    dim_row = df.select(F.size(vec_col)).first()
    planes = hyperplanes(int(dim_row[0]), n_planes, seed)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bkt"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("bkt").orderBy("id")
    b = b.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= bucket_cap).drop("_rn")
    left = b.select("bkt", F.col("id").alias("id_a"), F.col("v").alias("va"))
    right = b.select("bkt", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        left.join(right, "bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_col(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )
