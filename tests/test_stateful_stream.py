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
    ids, sigs = st.get
    assert len(ids) == 3 and len(sigs) == 3  # cap enforced
    # all 5 still matched against earlier in-batch members (threshold 64)
    assert len(out[0]) == 4 + 3 + 2 + 1
