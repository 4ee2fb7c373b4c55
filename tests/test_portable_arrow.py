"""r06: the Arrow-stage portable SimHash/MinHash twins must be value-
identical to the Column-expression forms (which the DuckDB oracle pins).
Corner rows cover NULL text, empty text, whitespace-only, < k words,
multi-space/tab/newline separators, and non-ASCII tokens."""

from __future__ import annotations

import pytest

from file_deduplicator_spark.functions.portable import (
    with_portable_minhash,
    with_portable_minhash_arrow,
    with_portable_simhash,
    with_portable_simhash_arrow,
)

CORNER_ROWS = [
    (1, None),
    (2, ""),
    (3, "   "),
    (4, "one"),
    (5, "one two"),
    (6, "a b c d  e\tf\ng"),
    (7, "Привет мир 重复数据 🎧 test five six"),
    (8, "the the the the the"),
]


@pytest.fixture(scope="module")
def corner(spark):
    return spark.createDataFrame(CORNER_ROWS, "doc_id int, text string")


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_simhash_arrow_identical(spark, corner):
    a = with_portable_simhash(corner, "text", "hi", "lo")
    b = with_portable_simhash_arrow(corner, "text", "hi", "lo")
    assert _rows(a, ["doc_id", "hi", "lo"]) == _rows(b, ["doc_id", "hi", "lo"])


def test_minhash_arrow_identical(spark, corner):
    a = with_portable_minhash(corner, "text", "sig")
    b = with_portable_minhash_arrow(corner, "text", "sig")
    assert _rows(a, ["doc_id", "sig"]) == _rows(b, ["doc_id", "sig"])


def test_minhash_arrow_identical_nondefault_params(spark, corner):
    a = with_portable_minhash(corner, "text", "sig", num_perm=8, k=2, seed=7)
    b = with_portable_minhash_arrow(corner, "text", "sig", num_perm=8, k=2, seed=7)
    assert _rows(a, ["doc_id", "sig"]) == _rows(b, ["doc_id", "sig"])
