"""Suffix-array kernel + containment operator tests."""

import numpy as np

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.functions.suffix import sa_contains, suffix_array, word_contains
from file_deduplicator_spark.operators.containment import containment_edges


def test_suffix_array_correct():
    s = b"banana"
    sa = suffix_array(s)
    suffixes = sorted(range(len(s)), key=lambda i: s[i:])
    assert list(sa) == suffixes


def test_suffix_array_random():
    rng = np.random.RandomState(0)
    for _ in range(10):
        s = bytes(rng.randint(97, 100, size=rng.randint(1, 200)).astype(np.uint8))
        sa = suffix_array(s)
        assert list(sa) == sorted(range(len(s)), key=lambda i: s[i:])


def test_sa_contains():
    s = b" the quick brown fox "
    sa = suffix_array(s)
    assert sa_contains(s, sa, b"quick brown")
    assert sa_contains(s, sa, b" the ")
    assert not sa_contains(s, sa, b"quack")
    assert not sa_contains(s, sa, b"fox and more")


def test_word_contains_boundaries():
    assert word_contains("the quick brown fox", "quick brown")
    assert not word_contains("the quicker brown fox", "quick")  # word-aligned
    assert word_contains("a b c", "a b c")
    assert not word_contains("a b", "a b c")


def test_containment_edges_on_clips(spark, clips_df, clips_fixture):
    cfg = DedupConfig()
    edges = containment_edges(clips_df, cfg).toPandas()
    got = {(min(a, b), max(a, b)) for a, b in zip(edges.id_a, edges.id_b)}
    exp = clips_fixture.expected_pairs.query("kind == 'contained'")
    want = {(a, b) for a, b in zip(exp.clip_id_a, exp.clip_id_b)}
    missed = want - got
    assert not missed, f"missed containment pairs: {missed}"
    # precision: needle must really be contained (operator is verify-exact,
    # so any extra pair found is genuinely contained text; spot-check a few)
    tx = dict(zip(clips_fixture.clips.clip_id, clips_fixture.clips.transcript))
    for a, b in list(got)[:20]:
        ta, tb = tx[a], tx[b]
        needle, container = (ta, tb) if len(ta.split()) < len(tb.split()) else (tb, ta)
        assert word_contains(container, needle)
