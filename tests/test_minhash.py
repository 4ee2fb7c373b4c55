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


# ---------------------------------------------------------------------------
# round-4: in-bucket fold pre-filter (minhash_fold_col / fold_mismatch_col)
# ---------------------------------------------------------------------------


def _fold_py(sig, slots_per_long=16):
    out = []
    for j in range(len(sig) // slots_per_long):
        acc = 0
        for s in sig[j * slots_per_long:(j + 1) * slots_per_long]:
            acc = ((acc << 4) | (s & 15)) & 0xFFFFFFFFFFFFFFFF
        out.append(acc - (1 << 64) if acc >= (1 << 63) else acc)
    return out


def test_fold_matches_python_and_is_conservative(spark):
    """fold_mismatch is a LOWER bound on the true slot-mismatch count
    (soundness of the exactly-conservative pre-filter), and the JVM fold
    equals the Python recomputation."""
    from file_deduplicator_spark.functions.minhash_sql import (
        fold_mismatch_col,
        minhash_fold_col,
    )

    rng = np.random.RandomState(99)
    num_perm = 64
    pairs = []
    for i in range(40):
        a = rng.randint(0, 1 << 61, size=num_perm).astype("int64")
        b = a.copy()
        flip = rng.rand(num_perm) < rng.choice([0.05, 0.3, 0.7, 1.0])
        b[flip] = rng.randint(0, 1 << 61, size=int(flip.sum()))
        pairs.append((i, a.tolist(), b.tolist()))
    df = spark.createDataFrame(
        pairs, "i int, sa array<long>, sb array<long>"
    ).select(
        "i", "sa", "sb",
        minhash_fold_col(F.col("sa"), num_perm).alias("fa"),
        minhash_fold_col(F.col("sb"), num_perm).alias("fb"),
    )
    rows = df.select(
        "i", "sa", "sb", "fa",
        fold_mismatch_col(F.col("fa"), F.col("fb")).alias("provable"),
    ).collect()
    assert len(rows) == 40
    for r in rows:
        true_mm = sum(1 for x, y in zip(pairs[r.i][1], pairs[r.i][2]) if x != y)
        assert r.fa == _fold_py(pairs[r.i][1]), "JVM fold != python fold"
        assert 0 <= r.provable <= true_mm, (
            f"pre-filter not conservative: provable {r.provable} > true {true_mm}"
        )
        # power check: with 4 bits/slot ~15/16 of mismatches are provable;
        # allow generous slack but catch a broken (always-0) fold
        if true_mm >= 16:
            assert r.provable >= true_mm // 4


def test_prefilter_preserves_verified_pair_set(spark, clips_df):
    """Pipeline-level: near-dup edges with the fold pre-filter ON equal the
    edges with it OFF, row for row (the round-4 'same verified pair set'
    gate)."""
    from file_deduplicator_spark.config import DedupConfig
    from file_deduplicator_spark.plans.pipeline import near_dup_edges, with_signatures
    from pyspark.sql import Window

    base = DedupConfig()
    sigs = with_signatures(clips_df, base).drop("bytes").withColumn(
        "digest_root", F.min("clip_id").over(Window.partitionBy("digest"))
    ).persist()
    try:
        on = near_dup_edges(sigs, DedupConfig(minhash_prefilter=True)).distinct()
        off = near_dup_edges(sigs, DedupConfig(minhash_prefilter=False)).distinct()
        assert on.exceptAll(off).count() == 0
        assert off.exceptAll(on).count() == 0
        assert on.count() > 0
    finally:
        sigs.unpersist()
