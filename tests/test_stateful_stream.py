"""applyInPandasWithState watch tier: per-bucket state, restart resume.

Pins the three claims streaming/stateful.py makes:

* a near-dup arrival alerts against a clip seen in an EARLIER batch with
  no rescan of prior data (state lives in Spark's state store);
* stopping the query and restarting with the same checkpointLocation
  restores bucket state (alerts still fire against pre-restart clips);
* the per-bucket cap bounds state growth.
"""

from __future__ import annotations

import numpy as np
import pytest

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.functions.audio import wav_encode
from file_deduplicator_spark.streaming.stateful import (
    popcount_u64,
    start_stateful_watch,
    stateful_alerts,
)


def _clip(seed: int, gain: float = 0.6, n: int = 24000, sr: int = 16000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * (220 + 17 * seed) * t) + rng.normal(0, 0.05, n)
    x = x / np.max(np.abs(x)) * gain
    return wav_encode(x, sr)


def _rows(*items):
    return [
        (cid, bytearray(buf), 16000, 1500, "pcm_s16le", f"transcript {cid}")
        for cid, buf in items
    ]


CLIPS_DDL = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
             "codec string, transcript string")


def test_popcount_u64_matches_bin():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**63, size=256, dtype=np.int64).view(np.uint64)
    want = np.array([bin(int(v)).count("1") for v in vals])
    assert np.array_equal(popcount_u64(vals), want)


@pytest.fixture()
def dirs(tmp_path):
    inp = tmp_path / "in"
    out = tmp_path / "out"
    inp.mkdir()
    return inp, out


def _drain(spark, inp, out):
    q = start_stateful_watch(spark, inp, out)
    q.awaitTermination()
    try:
        return spark.read.parquet(str(out / "alerts"))
    except Exception:
        return None


def test_stateful_alerts_across_batches_and_restart(spark, dirs):
    inp, out = dirs
    cfg = DedupConfig()
    base = _clip(1)
    dup = _clip(1, gain=0.42)     # gain edit → signature-invariant near-dup
    other = _clip(5)              # unrelated

    # batch 1: base + unrelated → no alerts expected between them.
    # Batches land as part-files in the watched dir itself (the file
    # source does not descend into non-partition subdirectories).
    spark.createDataFrame(_rows(("a", base), ("x", other)), CLIPS_DDL) \
        .coalesce(1).write.mode("append").parquet(str(inp))
    alerts = _drain(spark, inp, out)
    pairs1 = (
        set()
        if alerts is None
        else {(r.new_id, r.matched_id) for r in alerts.collect()}
    )
    assert ("a", "x") not in pairs1 and ("x", "a") not in pairs1

    # batch 2, SAME query lineage but a fresh start() — state must come
    # back from the checkpoint for 'b' to match 'a' without rescanning b1
    spark.createDataFrame(_rows(("b", dup)), CLIPS_DDL) \
        .coalesce(1).write.mode("append").parquet(str(inp))
    alerts = _drain(spark, inp, out)
    assert alerts is not None
    got = {(r.new_id, r.matched_id) for r in alerts.collect()}
    assert ("b", "a") in got, f"restart lost bucket state: {got}"
    # hamming recorded and within config threshold
    row = alerts.filter("new_id = 'b' and matched_id = 'a'").first()
    assert 0 <= row.hamming <= cfg.sim_threshold


def test_stateful_in_batch_pairs_and_cap(spark, dirs):
    inp, out = dirs
    base = _clip(2)
    spark.createDataFrame(
        _rows(("p", base), ("q", _clip(2, gain=0.3))), CLIPS_DDL
    ).coalesce(1).write.mode("append").parquet(str(inp))
    alerts = _drain(spark, inp, out)
    got = {(r.new_id, r.matched_id) for r in alerts.collect()}
    # in-batch pair fires exactly in new→earlier direction
    assert ("q", "p") in got
    assert ("p", "q") not in got


def test_bucket_cap_bounds_state(spark):
    # unit-level: drive the tracker directly with a bucket of 5, cap 3
    import pandas as pd

    from file_deduplicator_spark.streaming.stateful import make_bucket_tracker

    class FakeState:
        exists = False

        def __init__(self):
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    track = make_bucket_tracker(threshold=64, max_per_bucket=3)
    st = FakeState()
    pdf = pd.DataFrame({"clip_id": list("abcde"), "sig": [1, 2, 3, 4, 5]})
    out = list(track((0, 0), iter([pdf]), st))
    ids, sigs, bhs = st.get
    assert len(ids) == 3 and len(sigs) == 3 and len(bhs) == 3  # cap enforced
    # all 5 still matched against earlier in-batch members (threshold 64)
    assert len(out[0]) == 4 + 3 + 2 + 1


def test_ttl_timeout_branch_drops_state():
    import pandas as pd

    from file_deduplicator_spark.streaming.stateful import make_bucket_tracker

    class FakeState:
        exists = True
        hasTimedOut = True
        removed = False
        timeout_ms = None

        @property
        def get(self):
            return (["a"], [1])

        def remove(self):
            self.removed = True

        def update(self, v):
            raise AssertionError("timed-out bucket must not update")

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    track = make_bucket_tracker(threshold=10, max_per_bucket=4, ttl_minutes=30)
    st = FakeState()
    out = list(track((0, 0), iter([]), st))
    assert st.removed and len(out[0]) == 0


def test_ttl_sets_timeout_duration():
    import pandas as pd

    from file_deduplicator_spark.streaming.stateful import make_bucket_tracker

    class FakeState:
        exists = False
        hasTimedOut = False
        timeout_ms = None

        def update(self, v):
            self._v = v
            self.exists = True

        @property
        def get(self):
            return self._v

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    track = make_bucket_tracker(threshold=10, max_per_bucket=4, ttl_minutes=30)
    st = FakeState()
    pdf = pd.DataFrame({"clip_id": ["a"], "sig": [7]})
    list(track((0, 0), iter([pdf]), st))
    assert st.timeout_ms == 30 * 60_000


def test_ttl_expiry_drops_bucket_state_continuous(spark, dirs):
    """Continuous-trigger TTL: after the TTL horizon, a near-dup of an
    expired clip must NOT alert, while an in-batch control pair must —
    proving the batch was processed and the miss is state expiry, not
    lag. Margins are generous (20 s sleep vs a 3 s TTL) to stay
    deterministic on a loaded host."""
    import time

    inp, out = dirs
    q = start_stateful_watch(spark, inp, out, ttl_minutes=0.05)  # 3 s TTL
    try:
        spark.createDataFrame(_rows(("a", _clip(1))), CLIPS_DDL) \
            .coalesce(1).write.mode("append").parquet(str(inp))
        time.sleep(20)  # >> TTL: bucket state for 'a' expires and drops
        spark.createDataFrame(
            _rows(("b", _clip(1, 0.42)), ("c", _clip(9)), ("d", _clip(9, 0.5))),
            CLIPS_DDL,
        ).coalesce(1).write.mode("append").parquet(str(inp))
        deadline = time.time() + 90
        pairs = set()
        while time.time() < deadline:
            try:
                df = spark.read.parquet(str(out / "alerts"))
                pairs = {
                    (r.new_id, r.matched_id)
                    for r in df.select("new_id", "matched_id").distinct().collect()
                }
            except Exception:
                pairs = set()
            if ("d", "c") in pairs:
                break
            time.sleep(3)
    finally:
        q.stop()
    assert ("d", "c") in pairs, "control pair never alerted — stream stalled"
    assert ("b", "a") not in pairs, "expired bucket state still matched"


def test_cross_chunk_matching_independent_of_arrow_chunking():
    """A row arriving in a later Arrow chunk must match an over-cap row of
    an earlier chunk of the SAME micro-batch (the pool spans the whole
    batch; only the first max_per_bucket rows persist)."""
    import pandas as pd

    from file_deduplicator_spark.streaming.stateful import make_bucket_tracker

    class FakeState:
        exists = False

        def update(self, v):
            self._v = v
            self.exists = True

        @property
        def get(self):
            return self._v

    track = make_bucket_tracker(threshold=0, max_per_bucket=2)
    st = FakeState()
    chunk1 = pd.DataFrame({"clip_id": ["a", "b", "c"], "sig": [1, 2, 3]})
    chunk2 = pd.DataFrame({"clip_id": ["c2"], "sig": [3]})  # dup of over-cap 'c'
    out = pd.concat(list(track((0, 0), iter([chunk1, chunk2]), st)))
    pairs = set(zip(out.new_id, out.matched_id))
    assert ("c2", "c") in pairs  # 'c' was beyond the cap but same-batch
    ids, sigs, _bhs = st.get
    assert ids == ["a", "b"] and len(sigs) == 2  # cap still enforced


def test_batch_pool_cap_bounds_matching_memory():
    """Over-cap rows still alert AGAINST the pool; pairs among two
    over-cap rows are dropped (the documented hot-bucket bound)."""
    import pandas as pd

    from file_deduplicator_spark.streaming.stateful import make_bucket_tracker

    class FakeState:
        exists = False

        def update(self, v):
            self._v = v
            self.exists = True

        @property
        def get(self):
            return self._v

    track = make_bucket_tracker(threshold=0, max_per_bucket=2,
                                batch_pool_cap=3)
    st = FakeState()
    # rows: a,b,c in pool (cap 3); d,e beyond the pool. sig 7 everywhere →
    # every eligible pair matches at distance 0.
    pdf = pd.DataFrame({"clip_id": list("abcde"), "sig": [7] * 5})
    out = pd.concat(list(track((0, 0), iter([pdf]), st)))
    pairs = set(zip(out.new_id, out.matched_id))
    # in-pool triangle
    assert {("b", "a"), ("c", "a"), ("c", "b")} <= pairs
    # over-cap rows match the pool...
    assert {("d", "a"), ("d", "b"), ("d", "c"),
            ("e", "a"), ("e", "b"), ("e", "c")} <= pairs
    # ...but not each other
    assert ("e", "d") not in pairs
    ids, _, _ = st.get
    assert ids == ["a", "b"]  # persisted cap still max_per_bucket


def test_max_matches_per_arrival_caps_degenerate_buckets():
    import pandas as pd

    from file_deduplicator_spark.streaming.stateful import make_bucket_tracker

    class FakeState:
        exists = False

        def update(self, v):
            self._v = v
            self.exists = True

        @property
        def get(self):
            return self._v

    track = make_bucket_tracker(threshold=0, max_per_bucket=64,
                                max_matches_per_arrival=2)
    st = FakeState()
    pdf = pd.DataFrame({"clip_id": [f"c{i}" for i in range(20)],
                        "sig": [7] * 20})
    out = pd.concat(list(track((0, 0), iter([pdf]), st)))
    per_row = out.groupby("new_id").size()
    assert per_row.max() == 2  # capped
    # earliest pool members are the reported matches
    assert set(out.query("new_id == 'c5'").matched_id) == {"c0", "c1"}


def test_self_match_does_not_consume_cap_slots():
    """A re-arriving clip_id (stored copy at distance 0) must not starve
    real duplicate alerts out of the per-arrival cap (round-4 review)."""
    import pandas as pd

    from file_deduplicator_spark.streaming.stateful import make_bucket_tracker

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self._v = v
            self.exists = True

        @property
        def get(self):
            return self._v

    track = make_bucket_tracker(threshold=0, max_per_bucket=64,
                                max_matches_per_arrival=1)
    st = FakeState()
    # batch 1: 'a' then a true duplicate 'b' (same sig)
    pdf1 = pd.DataFrame({"clip_id": ["a", "b"], "sig": [7, 7]})
    pd.concat(list(track((0, 0), iter([pdf1]), st)))
    # batch 2: 'a' re-lands; its stored self sits at pool position 0.
    # With cap=1 the single slot must go to 'b', not the discarded self.
    pdf2 = pd.DataFrame({"clip_id": ["a"], "sig": [7]})
    out = pd.concat(list(track((0, 0), iter([pdf2]), st)))
    assert list(out.new_id) == ["a"] and list(out.matched_id) == ["b"]


def test_modality_parity_text_and_exact_alerts(spark, dirs):
    """Round-4 directive: tier 3 must reach the reference watch's modality
    parity (digest map AND perceptual map per arrival, main.go:1846-1886)
    plus the transcript modality. A text-only near-dup arrival and an
    exact-dup arrival must EACH alert — including an exact dup of an
    UNDECODABLE payload (digest still matches when no signature exists)."""
    inp, out = dirs
    base = _clip(3)
    rows = [
        ("t1", bytearray(base), 16000, 1500, "pcm_s16le",
         "the quick brown fox jumps over the lazy dog again and again"),
        ("junk1", bytearray(b"\x00not-audio\x01" * 10), 16000, 0, "bin", ""),
    ]
    spark.createDataFrame(rows, CLIPS_DDL).coalesce(1) \
        .write.mode("append").parquet(str(inp))
    _drain(spark, inp, out)

    rows2 = [
        # different audio, near-identical transcript → text-only near-dup
        ("t2", bytearray(_clip(11)), 16000, 1500, "pcm_s16le",
         "the quick brown fox jumps over the lazy dog again and again ok"),
        # byte-identical undecodable payload → exact dup, no signatures
        ("junk2", bytearray(b"\x00not-audio\x01" * 10), 16000, 0, "bin", ""),
    ]
    spark.createDataFrame(rows2, CLIPS_DDL).coalesce(1) \
        .write.mode("append").parquet(str(inp))
    alerts = _drain(spark, inp, out)
    got = {(r.new_id, r.matched_id, r.kind) for r in alerts.collect()}
    assert ("t2", "t1", "similar_text") in got, got
    assert ("junk2", "junk1", "exact") in got, got
    # the exact alert reports distance 0
    row = alerts.filter("new_id = 'junk2' and kind = 'exact'").first()
    assert row.hamming == 0


def test_shard_colocation_does_not_cross_match():
    """Two DIFFERENT buckets hashed into the same shard must never match
    each other, even at distance 0 (the bh mask, not the group key, is
    the match gate)."""
    import pandas as pd

    from file_deduplicator_spark.streaming.stateful import make_bucket_tracker

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self._v = v
            self.exists = True

        @property
        def get(self):
            return self._v

    track = make_bucket_tracker(threshold=64, max_per_bucket=8)
    st = FakeState()
    pdf = pd.DataFrame({
        "clip_id": ["a", "b", "c"],
        "sig": [7, 7, 7],
        "bh": [100, 200, 100],  # a and c share a bucket; b is co-sharded only
    })
    out = pd.concat(list(track((0, 0), iter([pdf]), st)))
    pairs = set(zip(out.new_id, out.matched_id))
    assert pairs == {("c", "a")}
    # per-bucket persistence cap applies per bh, not per shard
    track2 = make_bucket_tracker(threshold=0, max_per_bucket=1)
    st2 = FakeState()
    pdf2 = pd.DataFrame({
        "clip_id": ["a", "b", "c", "d"],
        "sig": [1, 2, 3, 4],
        "bh": [100, 100, 200, 200],
    })
    list(track2((0, 0), iter([pdf2]), st2))
    ids, _, bhs = st2.get
    assert ids == ["a", "c"] and list(bhs) == [100, 200]


def test_text_fold_verify_matches_batch_bound():
    """The tracker's text distance must equal fold_mismatch_col's provable
    mismatch count (stream and batch pre-filters agree bit-for-bit)."""
    import numpy as np

    from file_deduplicator_spark.functions.text import minhash_params
    from file_deduplicator_spark.streaming.stateful import _row_distances

    rng = np.random.default_rng(7)
    num_perm = 64
    a = rng.integers(0, 16, num_perm)  # nibble values
    b = a.copy()
    flip = rng.choice(num_perm, 10, replace=False)
    b[flip] = (b[flip] + 1 + rng.integers(0, 14, 10)) % 16  # guaranteed differ

    def fold(nibbles):
        out = []
        for j in range(num_perm // 16):
            acc = 0
            for v in nibbles[j * 16:(j + 1) * 16]:
                acc = (acc << 4) | int(v)
            out.append(np.int64(np.uint64(acc).astype(np.int64)))
        return np.array(out, dtype=np.int64)

    fa = fold(a).view(np.uint64)[None, :]
    fb = fold(b).view(np.uint64)[None, :]
    d = _row_distances(fa, fb, text=True)
    assert d[0, 0] == 10  # every flipped nibble provably mismatches here
    assert _row_distances(fa, fa, text=True)[0, 0] == 0
