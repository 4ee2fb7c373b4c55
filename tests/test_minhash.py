"""JVM-side MinHash must equal the numpy oracle exactly, and behave like a
Jaccard estimator."""

import numpy as np
from pyspark.sql import functions as F

from file_deduplicator_spark.functions.minhash_sql import (
    minhash_sig_col,
    shingles_col,
    sig_agreement_col,
)
from file_deduplicator_spark.functions.text import (
    jaccard,
    minhash_from_hashes,
    minhash_params,
    shingles,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "completely different words appear in this sentence here",
    "",
    "one",
    "重复 数据 删除 引擎 测试 样本 句子",
    "  multiple   spaces\tand\ttabs  here ",
]


def test_shingles_parity(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "i int, t string")
    got = {
        r.i: r.s
        for r in df.select("i", shingles_col(F.col("t"), 3).alias("s")).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == shingles(t, 3), f"text {i!r}"


def test_minhash_jvm_matches_numpy_oracle(spark):
    """Same base hash (xxhash64 & 0x7FFFFFFF) + same affine params ⇒ identical
    signatures between the Column expression and the numpy kernel."""
    k, num_perm, seed = 3, 64, 42
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "i int, t string")
    jvm_sigs = {
        r.i: r.sig
        for r in df.select(
            "i", minhash_sig_col(F.col("t"), num_perm, k, seed).alias("sig")
        ).collect()
    }
    # base hashes via Spark's own xxhash64 (the ground truth for parity)
    base = (
        df.select(
            "i",
            F.transform(
                shingles_col(F.col("t"), k),
                lambda s: F.xxhash64(s).bitwiseAND(F.lit(0x7FFFFFFF)),
            ).alias("h"),
        ).collect()
    )
    a, b = minhash_params(num_perm, seed)
    for r in base:
        want = minhash_from_hashes(np.array(r.h, dtype=np.int64), a, b)
        assert list(want) == list(jvm_sigs[r.i]), f"text {r.i}"


def test_agreement_estimates_jaccard(spark):
    df = spark.createDataFrame([(0, TEXTS[0]), (1, TEXTS[1])], "i int, t string")
    sigs = df.select("i", minhash_sig_col(F.col("t"), 64, 3, 42).alias("sig"))
    a = sigs.filter("i=0").select(F.col("sig").alias("sa"))
    b = sigs.filter("i=1").select(F.col("sig").alias("sb"))
    est = a.crossJoin(b).select(sig_agreement_col(F.col("sa"), F.col("sb")).alias("e")).first().e
    true_j = jaccard(TEXTS[0], TEXTS[1], 3)
    assert abs(est - true_j) < 0.25  # 64 perms → se ≈ 0.06; generous bound
    # identical texts → agreement 1.0
    est_same = a.crossJoin(a.withColumnRenamed("sa", "sb")).select(
        sig_agreement_col(F.col("sa"), F.col("sb")).alias("e")
    ).first().e
    assert est_same == 1.0
