"""Incremental ("watch mode") dedup tests: snapshot source, state bootstrap,
new-arrival-is-victim, exact + similar matching, resumable checkpoints.

Mirrors reference semantics: initialScan (main.go:1757-1826), processNewFiles
(main.go:1829-1921), new-file-is-victim (SURVEY §2.7 note)."""

import numpy as np
import pytest
from pyspark.sql import types as T

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.datagen import _synth_pcm
from file_deduplicator_spark.functions.audio import wav_encode
from file_deduplicator_spark.sources import snapshots as snap
from file_deduplicator_spark.streaming.watch import process_new_snapshots, read_checkpoint

CLIP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("transcript", T.StringType()),
    ]
)


def _row(cid, pcm, sr, txt):
    return (cid, bytearray(wav_encode(pcm, sr)), sr, int(len(pcm) / sr * 1000), "wav", txt)


@pytest.fixture()
def watch_env(spark, tmp_path):
    rng = np.random.RandomState(7)
    base = _synth_pcm(rng, 16000, 600)
    other = _synth_pcm(rng, 16000, 500)
    third = _synth_pcm(rng, 16000, 700)
    src = tmp_path / "clips_table"
    state = tmp_path / "state"

    batch0 = spark.createDataFrame(
        [
            _row("clip_a", base, 16000, "the quick brown fox jumps over the lazy dog today"),
            _row("clip_b", other, 16000, "совершенно другие слова здесь"),
        ],
        CLIP_SCHEMA,
    )
    snap.append_snapshot(batch0, src)
    return {"src": src, "state": state, "base": base, "other": other, "third": third}


def test_bootstrap_then_exact_match(spark, watch_env):
    cfg = DedupConfig()
    env = watch_env
    s0 = process_new_snapshots(spark, env["src"], env["state"], cfg)
    assert s0["new_rows"] == 2 and s0["alerts"] == 0

    # idempotent no-op when nothing new
    s_noop = process_new_snapshots(spark, env["src"], env["state"], cfg)
    assert s_noop["new_rows"] == 0

    # new arrival byte-identical to clip_a → exact alert, new id is victim
    batch1 = spark.createDataFrame(
        [_row("clip_c", env["base"], 16000,
              "the quick brown fox jumps over the lazy dog today")],
        CLIP_SCHEMA,
    )
    snap.append_snapshot(batch1, env["src"])
    s1 = process_new_snapshots(spark, env["src"], env["state"], cfg)
    assert s1["new_rows"] == 1 and s1["alerts"] >= 1

    alerts = spark.read.parquet(str(env["state"] / "alerts")).toPandas()
    exact = alerts.query("match_kind == 'exact'")
    assert list(exact.new_id) == ["clip_c"]          # the NEW file is the victim
    assert list(exact.matched_id) == ["clip_a"]      # keeper = pre-existing


def test_similar_audio_and_text_match(spark, watch_env):
    cfg = DedupConfig()
    env = watch_env
    process_new_snapshots(spark, env["src"], env["state"], cfg)

    # +2 dB gain copy of clip_a, same transcript → similar_audio + similar_text
    g = 10 ** (2.0 / 20.0)
    batch = spark.createDataFrame(
        [_row("clip_d", np.clip(env["base"] * g, -1, 1), 16000,
              "the quick brown fox jumps over the lazy dog today")],
        CLIP_SCHEMA,
    )
    snap.append_snapshot(batch, env["src"])
    s = process_new_snapshots(spark, env["src"], env["state"], cfg)
    assert s["alerts"] >= 1
    alerts = spark.read.parquet(str(env["state"] / "alerts")).toPandas()
    kinds = set(alerts.match_kind)
    assert "similar_audio" in kinds
    assert "similar_text" in kinds
    assert set(alerts.new_id) == {"clip_d"}
    assert set(alerts.matched_id) == {"clip_a"}


def test_checkpoint_resume(spark, watch_env):
    cfg = DedupConfig()
    env = watch_env
    process_new_snapshots(spark, env["src"], env["state"], cfg)
    ck = read_checkpoint(env["state"])
    assert ck["last_source_snapshot"] == 0 and ck["batches"] == 1

    snap.append_snapshot(
        spark.createDataFrame([_row("clip_e", env["third"], 16000, "novel words")], CLIP_SCHEMA),
        env["src"],
    )
    snap.append_snapshot(
        spark.createDataFrame([_row("clip_f", env["third"], 16000, "novel words")], CLIP_SCHEMA),
        env["src"],
    )
    # one batch consumes BOTH pending snapshots; clip_f dups clip_e within batch
    s = process_new_snapshots(spark, env["src"], env["state"], cfg)
    assert s["new_rows"] == 2
    ck2 = read_checkpoint(env["state"])
    assert ck2["last_source_snapshot"] == 2 and ck2["batches"] == 2
    alerts = spark.read.parquet(str(env["state"] / "alerts")).toPandas()
    ex = alerts.query("match_kind == 'exact'")
    assert ("clip_f" in set(ex.new_id)) and ("clip_e" in set(ex.matched_id))


def test_watch_filters_new_arrivals(spark, watch_env):
    """F6 (ref main.go:1683-1704): out-of-policy arrivals are dropped by the
    same size/codec filters the batch path applies."""
    cfg = DedupConfig(codec_filter=("wav",))
    env = watch_env
    process_new_snapshots(spark, env["src"], env["state"], cfg)

    batch = spark.createDataFrame(
        [
            # byte-identical to clip_a but codec out of policy → must NOT alert
            ("clip_x", bytearray(wav_encode(env["base"], 16000)), 16000, 600,
             "flac", "the quick brown fox jumps over the lazy dog today"),
        ],
        CLIP_SCHEMA,
    )
    snap.append_snapshot(batch, env["src"])
    s = process_new_snapshots(spark, env["src"], env["state"], cfg)
    assert s["new_rows"] == 0 and s["alerts"] == 0


def test_watch_auto_clean_actions(spark, watch_env):
    """T5 handleAutoClean (ref main.go:1952-1984): alerted arrivals get an
    action row (new arrival = victim); no silent deletes."""
    cfg = DedupConfig(watch_auto_clean=True, watch_clean_action="move",
                      watch_move_to="/qz")
    env = watch_env
    process_new_snapshots(spark, env["src"], env["state"], cfg)

    snap.append_snapshot(
        spark.createDataFrame(
            [_row("clip_c", env["base"], 16000,
                  "the quick brown fox jumps over the lazy dog today")],
            CLIP_SCHEMA,
        ),
        env["src"],
    )
    s = process_new_snapshots(spark, env["src"], env["state"], cfg)
    assert s["alerts"] >= 1 and s["actions"] == 1
    actions = spark.read.parquet(str(env["state"] / "actions")).toPandas()
    assert list(actions.clip_id) == ["clip_c"]
    assert list(actions.keeper_id) == ["clip_a"]
    assert list(actions.action) == ["move"]
    assert list(actions.target) == ["/qz/clip_c"]


def test_watch_replay_is_idempotent(spark, watch_env):
    """Crash between state append and checkpoint write: the replayed batch
    must not duplicate state rows nor self-match its own rows."""
    import json

    cfg = DedupConfig()
    env = watch_env
    process_new_snapshots(spark, env["src"], env["state"], cfg)

    snap.append_snapshot(
        spark.createDataFrame(
            [_row("clip_c", env["base"], 16000,
                  "the quick brown fox jumps over the lazy dog today")],
            CLIP_SCHEMA,
        ),
        env["src"],
    )
    s1 = process_new_snapshots(spark, env["src"], env["state"], cfg)
    state_rows = snap.read_table(spark, env["state"] / "signatures").count()

    # simulate the crash: rewind the engine checkpoint to before the batch
    ckpt_path = env["state"] / "_checkpoint.json"
    ck = json.loads(ckpt_path.read_text())
    ck["last_source_snapshot"] -= 1
    ck["batches"] -= 1
    ckpt_path.write_text(json.dumps(ck))

    s2 = process_new_snapshots(spark, env["src"], env["state"], cfg)
    # state not re-appended; alerts identical to the first run (no clip_c →
    # clip_c self-match rows)
    assert snap.read_table(spark, env["state"] / "signatures").count() == state_rows
    assert s2["alerts"] == s1["alerts"]
    alerts = spark.read.parquet(str(env["state"] / "alerts")).toPandas()
    assert not ((alerts.new_id == alerts.matched_id).any())


def test_watch_empty_transcripts_never_text_match(spark, watch_env):
    """Two unrelated silent/blank-transcript clips share the degenerate
    all-EMPTY_SLOT MinHash signature — they must NOT raise similar_text."""
    cfg = DedupConfig()
    env = watch_env
    process_new_snapshots(spark, env["src"], env["state"], cfg)

    snap.append_snapshot(
        spark.createDataFrame(
            [
                _row("clip_s1", env["third"], 16000, "   "),
                _row("clip_s2", env["other"] * 0.5, 16000, ""),
            ],
            CLIP_SCHEMA,
        ),
        env["src"],
    )
    s = process_new_snapshots(spark, env["src"], env["state"], cfg)
    alerts_dir = env["state"] / "alerts"
    if alerts_dir.exists():
        alerts = spark.read.parquet(str(alerts_dir)).toPandas()
        assert "similar_text" not in set(
            alerts.query("new_id in ('clip_s1','clip_s2')").match_kind
        )


def test_pruned_state_matches_full_scan(spark, watch_env, tmp_path):
    """T4 scale path: the bucket-pruned index matcher must produce exactly
    the alerts of the full-state-scan matcher, and its state reads must be
    partition-pruned (batch cost ∝ batch size, not state size)."""
    env = watch_env
    g = 10 ** (2.0 / 20.0)
    batch = [
        _row("clip_c", env["base"], 16000,
             "the quick brown fox jumps over the lazy dog today"),          # exact dup
        _row("clip_d", np.clip(env["base"] * g, -1, 1), 16000,
             "the quick brown fox jumps over the lazy dog today"),          # near dup
        _row("clip_e", env["third"], 16000, "entirely novel content here"),  # unique
    ]

    results = {}
    for mode in (True, False):
        cfg = DedupConfig(watch_pruned_state=mode)
        state = tmp_path / f"state_{mode}"
        process_new_snapshots(spark, env["src"], state, cfg)
        src2 = tmp_path / f"src_{mode}"
        # same source content, separate table so each mode consumes it once
        import shutil

        shutil.copytree(env["src"], src2)
        snap.append_snapshot(spark.createDataFrame(batch, CLIP_SCHEMA), src2)
        # re-point checkpoint at the copied source by re-running bootstrap-free
        s = process_new_snapshots(spark, src2, state, cfg)
        alerts = spark.read.parquet(str(state / "alerts")).toPandas()
        results[mode] = set(
            map(tuple, alerts[["new_id", "matched_id", "match_kind"]].values)
        )
    assert results[True] == results[False]
    assert ("clip_c", "clip_a", "exact") in results[True]

    # pruned mode: the state band read must carry a partition filter on pbkt
    from file_deduplicator_spark.config import DedupConfig as DC
    from file_deduplicator_spark.streaming.watch import _match_new_pruned, compute_signatures

    cfg = DC()
    new_sigs = compute_signatures(
        spark.createDataFrame([batch[0]], CLIP_SCHEMA), cfg
    )
    plan = _match_new_pruned(
        spark, new_sigs, tmp_path / "state_True", cfg
    )._jdf.queryExecution().executedPlan().toString()
    assert "pbkt" in plan and "PartitionFilters" in plan


def test_snapshot_table_roundtrip(spark, tmp_path):
    d = tmp_path / "t"
    df = spark.range(5).withColumnRenamed("id", "x")
    sid = snap.append_snapshot(df, d)
    assert sid == 0
    sid2 = snap.append_snapshot(spark.range(5, 8).withColumnRenamed("id", "x"), d)
    assert sid2 == 1
    assert snap.read_table(spark, d).count() == 8
    inc, latest = snap.read_incremental(spark, d, 0)
    assert inc.count() == 3 and latest == 1
    none_df, latest2 = snap.read_incremental(spark, d, 1)
    assert none_df is None and latest2 == 1


def test_watch_image_arrival_matches_persisted_image_state(spark, tmp_path):
    """Round-4 directive 8: the watch perceptual channel serves images too —
    a near-dup PPM arrival must be flagged against persisted image
    signatures (the reference's watch mode checks pHash matches per
    arrival, main.go:1874-1886)."""
    from file_deduplicator_spark.functions.image import ppm_encode

    rng = np.random.RandomState(55)
    img = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)
    # mild brightness shift — a near-dup, not byte-identical (different
    # digest, Hamming-close perceptual signature)
    near = np.clip(img.astype(np.int16) + 6, 0, 255).astype(np.uint8)
    far = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)

    src = tmp_path / "media_table"
    state = tmp_path / "state"
    cfg = DedupConfig()

    def irow(mid, arr, txt):
        return (mid, bytearray(ppm_encode(arr)), 0, 0, "ppm", txt)

    snap.append_snapshot(
        spark.createDataFrame(
            [irow("img_a", img, "a sunny hillside photo"),
             irow("img_b", far, "unrelated picture entirely")],
            CLIP_SCHEMA,
        ),
        src,
    )
    s0 = process_new_snapshots(spark, src, state, cfg)
    assert s0["new_rows"] == 2 and s0["alerts"] == 0

    # image signatures really persisted (not nulls from decode failure)
    sig_state = snap.read_table(spark, state / "signatures").toPandas()
    assert sig_state.sim_sig.notna().all()

    snap.append_snapshot(
        spark.createDataFrame([irow("img_c", near, "completely new caption")], CLIP_SCHEMA),
        src,
    )
    s1 = process_new_snapshots(spark, src, state, cfg)
    assert s1["alerts"] >= 1
    alerts = spark.read.parquet(str(state / "alerts")).toPandas()
    sim = alerts.query("match_kind == 'similar_audio'")  # the shared
    # perceptual channel — kind name kept for state compatibility
    assert list(sim.new_id) == ["img_c"]
    assert list(sim.matched_id) == ["img_a"]


def test_watch_kernel_guard_defaults_v1_when_state_without_checkpoint(spark, tmp_path):
    """Round-3 advice: signature state on disk WITHOUT a checkpoint marker
    (crash between index append and checkpoint write) must be treated as
    kernel v1, not current — the guard must trip."""
    from file_deduplicator_spark.functions.audio import SIG_KERNEL_VERSION

    src = tmp_path / "src_table"
    state = tmp_path / "state"
    rng = np.random.RandomState(3)
    snap.append_snapshot(
        spark.createDataFrame(
            [_row("c1", _synth_pcm(rng, 16000, 300), 16000, "hello world sample")],
            CLIP_SCHEMA,
        ),
        src,
    )
    cfg = DedupConfig()
    process_new_snapshots(spark, src, state, cfg)
    # simulate the crash: state artifacts persist, checkpoint lost
    (state / "_checkpoint.json").unlink()
    if SIG_KERNEL_VERSION != 1:
        with pytest.raises(ValueError, match="signature kernel"):
            process_new_snapshots(spark, src, state, cfg)


def test_watch_image_arrival_matches_persisted_image(spark, tmp_path):
    """Round-4 directive 8: the image modality rides the watch/incremental
    path. The sniffing signature dispatch (udfs.media_sig_from_bytes) gives
    image payloads a 64-bit perceptual hash through the SAME sim_sig column
    and band-indexed state the audio channel uses — the reference's watch
    mode checks pHash matches per arrival the same way (main.go:1874-1886).
    A BMP re-encode of a persisted PPM decodes to identical pixels →
    identical dHash (Hamming 0) → band join flags it; an unrelated noise
    image (dHash distance 30 from the gradient) must NOT alert."""
    from file_deduplicator_spark.functions.image import bmp_encode, ppm_encode

    n = 200
    x = np.arange(n)[None, :].repeat(n, axis=0)
    y = np.arange(n)[:, None].repeat(n, axis=1)
    grad = np.stack(
        [(x * 255) // n, (y * 255) // n, ((x + y) * 255) // (2 * n)], axis=2
    ).astype(np.uint8)
    noise = np.random.RandomState(3).randint(0, 256, (n, n, 3)).astype(np.uint8)

    src = tmp_path / "clips_table"
    state = tmp_path / "state"
    cfg = DedupConfig()

    def img_row(cid, payload, codec, txt):
        return (cid, bytearray(payload), 0, 0, codec, txt)

    # mixed-modality bootstrap: one image + one audio clip in the same state
    rng = np.random.RandomState(5)
    snap.append_snapshot(
        spark.createDataFrame(
            [img_row("img_grad", ppm_encode(grad), "ppm", "a colorful gradient"),
             _row("aud_a", _synth_pcm(rng, 16000, 500), 16000, "spoken words here")],
            CLIP_SCHEMA,
        ),
        src,
    )
    s0 = process_new_snapshots(spark, src, state, cfg)
    assert s0["new_rows"] == 2 and s0["alerts"] == 0

    # arrivals: a lossless BMP re-encode of the stored PPM (near-dup) and an
    # unrelated noise image (must not match anything)
    snap.append_snapshot(
        spark.createDataFrame(
            [img_row("img_dup", bmp_encode(grad), "bmp", "different words entirely"),
             img_row("img_noise", ppm_encode(noise), "ppm", "third transcript text")],
            CLIP_SCHEMA,
        ),
        src,
    )
    s1 = process_new_snapshots(spark, src, state, cfg)
    assert s1["new_rows"] == 2 and s1["alerts"] >= 1
    alerts = spark.read.parquet(str(state / "alerts")).toPandas()
    sim = alerts.query("match_kind == 'similar_audio'")  # shared sig channel
    assert ("img_dup", "img_grad") in set(zip(sim.new_id, sim.matched_id))
    assert "img_noise" not in set(alerts.new_id)
    assert not ((alerts.new_id == "img_dup") & (alerts.matched_id == "aud_a")).any()


def test_watch_flac_transcode_arrival_matches_persisted_wav(spark, tmp_path):
    """A FLAC transcode arriving after its WAV sibling was ingested must be
    flagged against the persisted state: lossless decode reproduces the
    exact int16 samples, so the new arrival's signature equals the stored
    one (Hamming 0) and the band join finds it — no re-decode of state."""
    from file_deduplicator_spark.functions.audio import wav_decode
    from file_deduplicator_spark.functions.flac import flac_encode

    rng = np.random.RandomState(11)
    pcm = _synth_pcm(rng, 16000, 600)
    other = _synth_pcm(rng, 16000, 500)

    src = tmp_path / "clips_table"
    state = tmp_path / "state"
    cfg = DedupConfig()

    wav = wav_encode(pcm, 16000)
    snap.append_snapshot(
        spark.createDataFrame(
            [("w_orig", bytearray(wav), 16000, 600, "wav", "original spoken words"),
             _row("w_other", other, 16000, "unrelated second clip text")],
            CLIP_SCHEMA,
        ),
        src,
    )
    s0 = process_new_snapshots(spark, src, state, cfg)
    assert s0["new_rows"] == 2 and s0["alerts"] == 0

    # transcode the EXACT stored samples (what a real WAV->FLAC job does)
    s16 = np.round(wav_decode(wav)[0] * 32767.0).astype(np.int16)
    fl = flac_encode(s16, 16000)
    snap.append_snapshot(
        spark.createDataFrame(
            [("f_dup", bytearray(fl), 16000, 600, "flac", "different transcript text")],
            CLIP_SCHEMA,
        ),
        src,
    )
    s1 = process_new_snapshots(spark, src, state, cfg)
    assert s1["alerts"] >= 1
    alerts = spark.read.parquet(str(state / "alerts")).toPandas()
    sim = alerts.query("match_kind == 'similar_audio'")
    assert ("f_dup", "w_orig") in set(zip(sim.new_id, sim.matched_id))


def test_watch_aiff_and_adpcm_arrivals_match_persisted_wav(spark, tmp_path):
    """Round-4 codecs ride the same signature dispatch, so the watch tier
    flags them with no new code: a lossless AIFF transcode matches at
    Hamming 0; an IMA-ADPCM transcode lands within the threshold."""
    from file_deduplicator_spark.functions.audio import wav_decode
    from file_deduplicator_spark.functions.pcm_codecs import (
        adpcm_encode_bytes,
        aiff_encode_s16,
    )

    rng = np.random.RandomState(12)
    pcm = _synth_pcm(rng, 16000, 600)
    other = _synth_pcm(rng, 16000, 500)

    src = tmp_path / "clips_table"
    state = tmp_path / "state"
    cfg = DedupConfig()

    wav = wav_encode(pcm, 16000)
    snap.append_snapshot(
        spark.createDataFrame(
            [("w_orig", bytearray(wav), 16000, 600, "wav", "original spoken words"),
             _row("w_other", other, 16000, "unrelated second clip text")],
            CLIP_SCHEMA,
        ),
        src,
    )
    s0 = process_new_snapshots(spark, src, state, cfg)
    assert s0["alerts"] == 0

    dec = wav_decode(wav)[0]
    s16 = np.round(dec * 32767.0).astype(np.int16)
    arrivals = [
        ("aiff_dup", aiff_encode_s16(s16, 16000), "aiff"),
        ("adpcm_dup", adpcm_encode_bytes(dec, 16000), "adpcm_ima_wav"),
    ]
    snap.append_snapshot(
        spark.createDataFrame(
            [(cid, bytearray(buf), 16000, 600, codec, f"text of {cid}")
             for cid, buf, codec in arrivals],
            CLIP_SCHEMA,
        ),
        src,
    )
    s1 = process_new_snapshots(spark, src, state, cfg)
    assert s1["alerts"] >= 2
    alerts = spark.read.parquet(str(state / "alerts")).toPandas()
    sim = set(zip(alerts.new_id, alerts.matched_id))
    assert ("aiff_dup", "w_orig") in sim
    assert ("adpcm_dup", "w_orig") in sim
