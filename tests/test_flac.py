"""FLAC codec + cross-codec (WAV↔FLAC) dedup tests.

The engine-level claim under test: a lossless transcode pair — identical
PCM, different codec — must produce the IDENTICAL 64-bit perceptual
signature (FLAC 16-bit decode is integer-exact, so the fused int16 kernel
sees the same samples) and therefore verify as a near-dup at Hamming
distance 0 through the shared LSH channel, batch and watch alike.
"""

from __future__ import annotations

import numpy as np
import pytest

from file_deduplicator_spark.functions import flac as FL
from file_deduplicator_spark.functions.audio import (
    audio_decode,
    snr_db,
    wav_decode,
    wav_encode,
)
from file_deduplicator_spark.functions.udfs import media_sig_from_bytes


def _tone(n=20000, sr=8000, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    return (np.sin(2 * np.pi * 440 * t) * 12000
            + rng.normal(0, 300, n)).astype(np.int16)


# ---------------------------------------------------------------------------
# codec roundtrips (every encoder mode drives a distinct decode path)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["verbatim", "fixed", "constant"])
def test_mono_roundtrip_exact(mode):
    x = _tone() if mode != "constant" else np.full(5000, -321, np.int16)
    buf = FL.flac_encode(x, 8000, mode=mode)
    dec, sr, bps = FL.flac_decode(buf)
    assert (sr, bps) == (8000, 16)
    assert np.array_equal(dec, x)


@pytest.mark.parametrize("stereo_mode", ["independent", "mid_side"])
def test_stereo_roundtrip_exact(stereo_mode):
    mono = _tone()
    st = np.stack([mono, (mono.astype(np.int32) // 3).astype(np.int16)], axis=1)
    buf = FL.flac_encode(st, 16000, stereo_mode=stereo_mode)
    dec, sr, bps = FL.flac_decode(buf)
    assert sr == 16000
    assert np.array_equal(dec, st)


def test_nonstandard_blocksize_and_partial_tail():
    # 1000 is not in the block-size code table -> 16-bit end-of-header size;
    # 2500 % 1000 != 0 -> last frame is partial (also 16-bit coded)
    x = _tone(2500)
    buf = FL.flac_encode(x, 8000, block_size=1000)
    dec, _, _ = FL.flac_decode(buf)
    assert np.array_equal(dec, x)


def test_uncommon_sample_rate_uses_header_tail():
    x = _tone(4000, sr=11025)
    buf = FL.flac_encode(x, 11025)  # 11025 not in the 4-bit sr table
    dec, sr, _ = FL.flac_decode(buf)
    assert sr == 11025
    assert np.array_equal(dec, x)


def test_crc_corruption_detected():
    buf = bytearray(FL.flac_encode(_tone(4096), 8000))
    info = FL.flac_parse_streaminfo(bytes(buf))
    buf[info["frames_offset"] + 60] ^= 0x40  # flip a bit inside frame data
    with pytest.raises(ValueError):
        FL.flac_decode(bytes(buf))


def test_fixed_predictor_matches_naive_recurrence():
    # order-m fixed predictor per the spec's recurrences, sample at a time
    preds = {
        0: lambda h: 0,
        1: lambda h: h[-1],
        2: lambda h: 2 * h[-1] - h[-2],
        3: lambda h: 3 * h[-1] - 3 * h[-2] + h[-3],
        4: lambda h: 4 * h[-1] - 6 * h[-2] + 4 * h[-3] - h[-4],
    }
    rng = np.random.default_rng(3)
    x = rng.integers(-1000, 1000, 64).astype(np.int64)
    for order, pred in preds.items():
        resid = np.array(
            [x[i] - pred(x[:i]) for i in range(order, x.size)], dtype=np.int64
        )
        rec = FL._undo_fixed(order, x[:order], resid)
        assert np.array_equal(rec, x), f"order {order}"


def test_lpc_subframe_decodes():
    """Hand-craft a frame with an LPC subframe (the test encoder only emits
    fixed predictors) so the general-LPC decode path is exercised."""
    x = _tone(192)  # block size code 1
    order, shift = 2, 5
    coefs = [52, -21]  # pred = (52*x[i-1] - 21*x[i-2]) >> 5

    bw = FL._BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(1, 4)            # block size 192
    bw.write(4, 4)            # 8000 Hz
    bw.write(0, 4)            # mono
    bw.write(4, 3)            # 16-bit
    bw.write(0, 1)
    bw.write(0, 8)            # frame number 0
    hdr = bytes(bw.out)
    bw.write(FL.crc8(hdr), 8)

    bw.write(0, 1)
    bw.write(32 + order - 1, 6)  # LPC, order 2
    bw.write(0, 1)
    xx = x.astype(np.int64)
    for v in xx[:order]:
        bw.write(int(v) & 0xFFFF, 16)
    bw.write(14, 4)           # precision 15 bits
    bw.write(shift, 5)
    for c in coefs:
        bw.write(c & 0x7FFF, 15)
    resid = np.array(
        [int(xx[i]) - ((52 * int(xx[i - 1]) - 21 * int(xx[i - 2])) >> shift)
         for i in range(order, xx.size)], dtype=np.int64)
    bw.write(0, 2)            # rice method 0
    bw.write(0, 4)            # partition order 0
    k = FL._rice_k(resid)
    bw.write(k, 4)
    for v in (resid << 1) ^ (resid >> 63):
        bw.write_unary(int(v) >> k)
        bw.write(int(v) & ((1 << k) - 1), k)
    bw.align()
    body = bytes(bw.out)
    bw.write(FL.crc16(body), 16)

    # minimal container: magic + STREAMINFO + the crafted frame
    container = FL.flac_encode(x[:0].reshape(0), 8000)  # header only
    info = FL.flac_parse_streaminfo(container)
    head = bytearray(container[: info["frames_offset"]])
    # patch total_samples (bits 108..144 of STREAMINFO body at offset 8)
    si = bytearray(head[8:8 + 34])
    total = 192
    acc = int.from_bytes(si, "big")
    acc &= ~(((1 << 36) - 1) << (34 * 8 - 108 - 36))
    acc |= total << (34 * 8 - 108 - 36)
    head[8:8 + 34] = acc.to_bytes(34, "big")
    dec, sr, _ = FL.flac_decode(bytes(head) + bw.bytes())
    assert np.array_equal(dec, x)


def test_rice_escape_partition_decodes():
    """Escape code (k=15) = raw fixed-width residuals — craft one frame."""
    x = np.array([5, -3, 100, -100] * 48, dtype=np.int16)  # 192 samples
    bw = FL._BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(1, 4)
    bw.write(4, 4)
    bw.write(0, 4)
    bw.write(4, 3)
    bw.write(0, 1)
    bw.write(0, 8)
    bw.write(FL.crc8(bytes(bw.out)), 8)
    bw.write(0, 1)
    bw.write(8, 6)            # FIXED order 0 -> residual = samples
    bw.write(0, 1)
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(15, 4)           # escape
    bw.write(9, 5)            # raw 9-bit signed residuals
    for v in x.astype(np.int64):
        bw.write(int(v) & 0x1FF, 9)
    bw.align()
    bw.write(FL.crc16(bytes(bw.out)), 16)

    container = FL.flac_encode(x, 8000)  # same STREAMINFO shape
    info = FL.flac_parse_streaminfo(container)
    dec, _, _ = FL.flac_decode(container[: info["frames_offset"]] + bw.bytes())
    assert np.array_equal(dec, x)


# ---------------------------------------------------------------------------
# the dedup-engine claims
# ---------------------------------------------------------------------------


def test_wav_flac_transcode_identical_signature():
    s16 = _tone()
    pcm = s16.astype(np.float64) / 32767.0
    wav = wav_encode(pcm, 8000)
    # encode the EXACT samples wav_encode stored, not the float input
    stored = wav_decode(wav)[0]
    s16_stored = np.round(stored * 32767.0).astype(np.int16)
    fl = FL.flac_encode(s16_stored, 8000)
    for algo in ("dhash", "ahash", "phash"):
        assert media_sig_from_bytes(wav, algo) == media_sig_from_bytes(fl, algo), algo


def test_audio_decode_flac_snr_invariant():
    s16 = _tone()
    pcm, sr = audio_decode(FL.flac_encode(s16, 8000))
    assert sr == 8000
    ref = s16.astype(np.float32) / np.float32(32767.0)
    assert np.allclose(pcm, ref)           # lossless: exact
    assert snr_db(ref, pcm) == float("inf") or snr_db(ref, pcm) >= 30.0


def test_flac_near_dup_pair_through_pipeline(spark):
    """A WAV clip and its FLAC transcode must land in one cluster via the
    real Spark pipeline (signature stage -> LSH -> verify -> CC)."""
    import datetime as dt

    from file_deduplicator_spark.config import DedupConfig
    from file_deduplicator_spark.plans.pipeline import dedup_pipeline

    s16 = _tone()
    wav = wav_encode(s16.astype(np.float64) / 32767.0, 8000)
    s16_stored = np.round(wav_decode(wav)[0] * 32767.0).astype(np.int16)
    fl = FL.flac_encode(s16_stored, 8000)
    other = _tone(seed=99)
    wav2 = wav_encode(other.astype(np.float64) / 32767.0, 8000)
    ts = dt.datetime(2026, 1, 1)
    rows = [
        ("c_wav", bytearray(wav), 8000, 2500, "wav", "the quick brown fox", ts, "t"),
        ("c_flac", bytearray(fl), 8000, 2500, "flac", "completely different words here", ts, "t"),
        ("c_other", bytearray(wav2), 8000, 2500, "wav", "unrelated third clip", ts, "t"),
    ]
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
        "transcript string, mtime timestamp, scenario string",
    )
    res = dedup_pipeline(df, DedupConfig())
    clusters = {
        r["clip_id"]: r["cluster_id"] for r in res["labeled"].collect()
    }
    assert clusters.get("c_wav") == clusters.get("c_flac")
    assert clusters.get("c_other") != clusters.get("c_wav")
