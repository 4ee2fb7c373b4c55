"""A-law / IMA ADPCM / AIFF codec tests + cross-codec dedup invariants.

Engine-level claims under test (mirrors tests/test_flac.py):

* lossless container transcode (WAV↔AIFF) → IDENTICAL 64-bit signature;
* lossy-companding transcode (A-law, IMA ADPCM) → SNR ≥ 30 dB (the
  BASELINE.json per-row invariant) and a signature within the near-dup
  Hamming threshold of the PCM original;
* the vectorized across-blocks ADPCM decoder is bit-identical to the
  naive per-sample recurrence.
"""

from __future__ import annotations

import numpy as np
import pytest

from file_deduplicator_spark.functions import pcm_codecs as PC
from file_deduplicator_spark.functions.audio import (
    audio_decode,
    hamming64,
    sig_from_wav_bytes,
    snr_db,
    wav_decode,
    wav_encode,
)
from file_deduplicator_spark.functions.udfs import media_sig_from_bytes


def _tone(n=20000, sr=16000, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * 440 * t) * 0.55 + np.sin(2 * np.pi * 97 * t) * 0.2
    return (x + rng.normal(0, 0.01, n)).clip(-1, 1)


# --- A-law ------------------------------------------------------------------

def test_alaw_lut_bijective_with_encoder():
    # encode(decode(b)) == b for every byte — the classic G.711 property
    got = PC.alaw_encode(PC.ALAW_LUT)
    assert np.array_equal(got, np.arange(256, dtype=np.uint8))


def test_alaw_decode_value_range_and_sign():
    vals = PC.ALAW_LUT.astype(np.int32)
    assert vals.max() == 32256 and vals.min() == -32256
    assert not np.any(vals == 0)  # A-law has no exact zero level


def test_alaw_wav_snr_invariant_and_signature():
    pcm = _tone()
    wav = wav_encode(pcm, 16000)
    al = PC.alaw_encode_bytes(pcm, 16000)
    dec, sr = wav_decode(al)
    assert sr == 16000
    assert snr_db(pcm, dec) >= 30.0
    # transcode lands within the near-dup Hamming threshold
    d = hamming64(sig_from_wav_bytes(wav), sig_from_wav_bytes(al))
    assert d <= 10
    # dispatch path agrees with the direct path
    assert media_sig_from_bytes(al) == sig_from_wav_bytes(al)


# --- IMA ADPCM ---------------------------------------------------------------

def _naive_ima_decode(data: bytes, block_align: int) -> np.ndarray:
    """Per-sample scalar reference recurrence (spec form)."""
    out = []
    pos = 0
    while pos + 4 <= len(data):
        block = data[pos:pos + block_align]
        pos += block_align
        pred = int.from_bytes(block[:2], "little", signed=True)
        index = min(max(block[2], 0), 88)
        out.append(pred)
        nibs = []
        for b in block[4:]:
            nibs += [b & 0x0F, b >> 4]
        for nib in nibs:
            step = int(PC._IMA_STEP_TABLE[index])
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            pred = pred - diff if nib & 8 else pred + diff
            pred = min(max(pred, -32768), 32767)
            index = min(max(index + int(PC._IMA_INDEX_TABLE[nib]), 0), 88)
            out.append(pred)
    return np.asarray(out, dtype=np.int16)


def test_adpcm_vectorized_matches_naive_recurrence():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=256 * 5, dtype=np.uint8).tobytes()
    got = PC.adpcm_ima_decode(data, 256)
    want = _naive_ima_decode(data, 256)
    assert np.array_equal(got, want)


def test_adpcm_roundtrip_snr_and_signature():
    pcm = _tone()
    wav = wav_encode(pcm, 16000)
    ad = PC.adpcm_encode_bytes(pcm, 16000)
    dec, sr = wav_decode(ad)
    assert sr == 16000
    # ADPCM pads the tail to whole nibble-pairs; compare the real span
    assert snr_db(pcm, dec[: pcm.size]) >= 30.0
    d = hamming64(sig_from_wav_bytes(wav), sig_from_wav_bytes(ad))
    assert d <= 10


def test_adpcm_partial_final_block():
    pcm = _tone(n=700)  # << one 256-byte block's 505 samples per block
    ad = PC.adpcm_encode_bytes(pcm, 8000)
    dec, _ = wav_decode(ad)
    # 700 samples = block of 505 + partial block padded to a nibble pair;
    # the fact chunk (dwSampleLength=700) must trim the pad nibble so the
    # decode is EXACTLY the encoded length — transcode signatures stay
    # pinned instead of drifting by borderline bits
    assert dec.size == 700
    assert snr_db(pcm, dec) >= 30.0


def test_adpcm_truncated_header_raises():
    with pytest.raises(ValueError):
        PC.adpcm_ima_decode(b"\x00\x01\x02", 256)


# --- AIFF ---------------------------------------------------------------------

@pytest.mark.parametrize("rate", [8000, 11025, 16000, 44100, 48000])
def test_f80_roundtrip(rate):
    assert PC._f80_decode(PC._f80_encode(rate)) == rate


def test_aiff_roundtrip_exact_and_crosscodec_signature_identity():
    pcm = _tone()
    s16 = np.round(np.clip(pcm, -1, 1) * 32767.0).astype(np.int16)
    wav = wav_encode(pcm, 16000)
    aif = PC.aiff_encode(pcm, 16000)
    got, sr = PC.aiff_decode_s16(aif)
    assert sr == 16000
    assert np.array_equal(got, s16)  # lossless container
    # identical int16 → IDENTICAL signature through the shared kernel
    assert media_sig_from_bytes(aif) == media_sig_from_bytes(wav)
    for algo in ("ahash", "phash"):
        assert media_sig_from_bytes(aif, algo) == media_sig_from_bytes(wav, algo)


def test_aiff_audio_decode_sniff_and_snr():
    pcm = _tone()
    dec, sr = audio_decode(PC.aiff_encode(pcm, 16000))
    assert sr == 16000
    assert snr_db(pcm, dec) >= 30.0


def test_aiff_unsupported_layout_raises():
    import struct

    comm = struct.pack(">hIh", 2, 4, 16) + PC._f80_encode(8000)  # stereo
    ssnd = struct.pack(">II", 0, 0) + b"\x00" * 16
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    buf = b"FORM" + struct.pack(">I", len(body)) + body
    with pytest.raises(ValueError):
        PC.aiff_decode_s16(buf)


def test_sig_rejects_unknown_wav_format():
    import struct

    # fmt 0x55 (MP3-in-WAV) is not supported — must raise, not misdecode
    data = b"\x00" * 64
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 0x55, 1, 8000, 32000, 4, 32,
        b"data", len(data),
    )
    with pytest.raises(ValueError):
        sig_from_wav_bytes(hdr + data)


# --- MS ADPCM -----------------------------------------------------------------

def _naive_ms_decode(data: bytes, block_align: int) -> np.ndarray:
    """Per-sample scalar reference recurrence (spec form, mono)."""
    import struct as st

    out = []
    pos = 0
    while pos + 7 <= len(data):
        block = data[pos:pos + block_align]
        pos += block_align
        pi = min(block[0], 6)
        delta, s1, s2 = st.unpack_from("<hhh", block, 1)
        delta = max(delta, 16)
        c1, c2 = int(PC._MS_COEF1[pi]), int(PC._MS_COEF2[pi])
        out += [s2, s1]
        nibs = []
        for b in block[7:]:
            nibs += [b >> 4, b & 0x0F]
        for nib in nibs:
            signed = nib - 16 if nib >= 8 else nib
            pred = (s1 * c1 + s2 * c2) >> 8
            pred += signed * delta
            pred = min(max(pred, -32768), 32767)
            out.append(pred)
            s2, s1 = s1, pred
            delta = max((int(PC._MS_ADAPT[nib]) * delta) >> 8, 16)
            delta = min(delta, PC._MS_DELTA_CEIL)  # same guard as vectorized
    return np.asarray(out, dtype=np.int16)


def test_ms_adpcm_vectorized_matches_naive_recurrence():
    rng = np.random.default_rng(17)
    data = rng.integers(0, 256, size=256 * 5, dtype=np.uint8).tobytes()
    got = PC.adpcm_ms_decode(data, 256)
    want = _naive_ms_decode(data, 256)
    assert np.array_equal(got, want)


def test_ms_adpcm_roundtrip_snr_and_signature():
    pcm = _tone()
    wav = wav_encode(pcm, 16000)
    ms = PC.adpcm_ms_encode_bytes(pcm, 16000)
    dec, sr = wav_decode(ms)
    assert sr == 16000
    assert snr_db(pcm, dec[: pcm.size]) >= 30.0
    d = hamming64(sig_from_wav_bytes(wav), sig_from_wav_bytes(ms))
    assert d <= 10
    assert media_sig_from_bytes(ms) == sig_from_wav_bytes(ms)


def test_ms_adpcm_partial_final_block():
    pcm = _tone(n=700)
    ms = PC.adpcm_ms_encode_bytes(pcm, 8000)
    dec, _ = wav_decode(ms)
    # fact-chunk trim: exact length, see the IMA sibling test
    assert dec.size == 700
    assert snr_db(pcm, dec) >= 30.0


def test_ms_adpcm_truncated_header_raises():
    with pytest.raises(ValueError):
        PC.adpcm_ms_decode(b"\x00\x01\x02\x03", 256)


# --- PCM bit depths + IEEE float WAV -------------------------------------------

def _wav_raw(fmt_code: int, bits: int, data: bytes, sr: int = 16000) -> bytes:
    import struct

    ba = max(1, bits // 8)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, fmt_code, 1, sr, sr * ba, ba, bits,
        b"data", len(data),
    )
    return hdr + data


def test_pcm_24_and_32_bit_signature_identical_to_16():
    pcm = _tone()
    s16 = np.round(np.clip(pcm, -1, 1) * 32767.0).astype(np.int16)
    wav16 = wav_encode(pcm, 16000)
    # 24-bit master whose top 16 bits ARE s16 (low byte = 0)
    i24 = s16.astype(np.int32) << 8
    b24 = np.zeros((s16.size, 3), dtype=np.uint8)
    b24[:, 0] = i24 & 0xFF
    b24[:, 1] = (i24 >> 8) & 0xFF
    b24[:, 2] = (i24 >> 16) & 0xFF
    wav24 = _wav_raw(1, 24, b24.tobytes())
    # 32-bit master, top 16 bits = s16
    wav32 = _wav_raw(1, 32, (s16.astype(np.int32) << 16).astype("<i4").tobytes())
    assert sig_from_wav_bytes(wav24) == sig_from_wav_bytes(wav16)
    assert sig_from_wav_bytes(wav32) == sig_from_wav_bytes(wav16)
    # materializing decode agrees too
    dec24, _ = wav_decode(wav24)
    assert snr_db(pcm, dec24) >= 30.0


def test_pcm_8_bit_decodes_and_signature_close():
    pcm = _tone()
    s16 = np.round(np.clip(pcm, -1, 1) * 32767.0).astype(np.int16)
    u8 = ((s16.astype(np.int32) >> 8) + 128).astype(np.uint8)
    wav8 = _wav_raw(1, 8, u8.tobytes())
    dec, _ = wav_decode(wav8)
    assert snr_db(pcm, dec) >= 30.0  # 8-bit ≈ 48 dB on a full-scale tone
    d = hamming64(sig_from_wav_bytes(wav_encode(pcm, 16000)),
                  sig_from_wav_bytes(wav8))
    assert d <= 10


def test_float_wav_decodes_and_signature_close():
    pcm = _tone()
    s16 = np.round(np.clip(pcm, -1, 1) * 32767.0).astype(np.int16)
    f32 = (s16.astype(np.float32) / np.float32(32767.0)).astype("<f4")
    wav_f32 = _wav_raw(3, 32, f32.tobytes())
    wav_f64 = _wav_raw(3, 64, f32.astype("<f8").tobytes())
    dec, _ = wav_decode(wav_f32)
    assert snr_db(pcm, dec) >= 30.0
    ref = sig_from_wav_bytes(wav_encode(pcm, 16000))
    assert hamming64(ref, sig_from_wav_bytes(wav_f32)) <= 10
    assert hamming64(ref, sig_from_wav_bytes(wav_f64)) <= 10
    assert media_sig_from_bytes(wav_f32) == sig_from_wav_bytes(wav_f32)


def test_unsupported_depths_raise():
    with pytest.raises(ValueError):
        sig_from_wav_bytes(_wav_raw(1, 12, b"\x00" * 24))
    with pytest.raises(ValueError):
        sig_from_wav_bytes(_wav_raw(3, 16, b"\x00" * 24))


def test_aiff_wide_depths_signature_identical():
    import struct

    pcm = _tone()
    s16 = np.round(np.clip(pcm, -1, 1) * 32767.0).astype(np.int16)
    ref = media_sig_from_bytes(PC.aiff_encode(pcm, 16000))

    def aiff_raw(bits, data, frames):
        comm = struct.pack(">hIh", 1, frames, bits) + PC._f80_encode(16000)
        ssnd = struct.pack(">II", 0, 0) + data
        body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
                + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
        if len(ssnd) % 2:
            body += b"\x00"
        return b"FORM" + struct.pack(">I", len(body)) + body

    # 24-bit big-endian master whose high 16 bits ARE s16
    b24 = np.zeros((s16.size, 3), dtype=np.uint8)
    i24 = s16.astype(np.int32) << 8
    b24[:, 0] = (i24 >> 16) & 0xFF
    b24[:, 1] = (i24 >> 8) & 0xFF
    b24[:, 2] = i24 & 0xFF
    a24 = aiff_raw(24, b24.tobytes(), s16.size)
    a32 = aiff_raw(32, (s16.astype(np.int32) << 16).astype(">i4").tobytes(), s16.size)
    assert media_sig_from_bytes(a24) == ref
    assert media_sig_from_bytes(a32) == ref
    # 8-bit signed: close, not identical
    i8 = (s16.astype(np.int32) >> 8).astype(np.int8)
    a8 = aiff_raw(8, i8.tobytes(), s16.size)
    assert hamming64(ref, media_sig_from_bytes(a8)) <= 10


def test_adpcm_header_only_final_block_roundtrips():
    # IMA: 506 samples = full block (505) + header-only block (1 sample)
    pcm = _tone(n=506)
    dec, _ = wav_decode(PC.adpcm_encode_bytes(pcm, 8000))
    assert dec.size == 506
    # MS: 502 samples = full block (500) + header-only block (2 samples)
    pcm = _tone(n=502)
    dec, _ = wav_decode(PC.adpcm_ms_encode_bytes(pcm, 8000))
    assert dec.size == 502


def test_legacy_14_byte_fmt_chunk_parses():
    import struct

    # WAVEFORMAT without wBitsPerSample (14-byte fmt body) — µ-law
    pcm = _tone(n=4000)
    from file_deduplicator_spark.functions.audio import ulaw_encode_bytes

    full = ulaw_encode_bytes(pcm, 8000)
    # rebuild with a truncated fmt chunk
    data = full[44:]
    fmt14 = struct.pack("<HHIIH", 7, 1, 8000, 8000, 1)
    buf = (b"RIFF" + struct.pack("<I", 4 + 8 + 14 + 8 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 14) + fmt14
           + b"data" + struct.pack("<I", len(data)) + data)
    assert sig_from_wav_bytes(buf) == sig_from_wav_bytes(full)


def test_short_fmt_chunk_raises_valueerror_not_structerror():
    import struct

    buf = (b"RIFF" + struct.pack("<I", 4 + 8 + 6 + 8) + b"WAVE"
           + b"fmt " + struct.pack("<I", 6) + b"\x01\x00\x01\x00\x40\x1f"
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        sig_from_wav_bytes(buf)
