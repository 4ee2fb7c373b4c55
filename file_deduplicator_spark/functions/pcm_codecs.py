"""A-law (G.711), IMA ADPCM (fmt 0x11), MS ADPCM (fmt 2), AIFF — dependency-free.

Why these: the north-star input is an audio+transcript corpus whose
``codec`` column spans the containers/codings a real archive accumulates.
The engine already decodes WAV s16le, µ-law, FLAC and raw-PCM mp4; this
module adds the remaining classic telephony/archive codings so a
transcoded copy of the same recording still lands in the same near-dup
cluster (the audio analog of the reference's "same image, different
format" registry, perceptual.go:4-14):

* **A-law** — G.711's other companding law (WAV format tag 6). Decode is
  a 256-entry integer LUT (derived from the public-domain Sun g711.c
  arithmetic), so the output is EXACT int16 and the signature rides the
  fused ``envelope_s16`` kernel with no float PCM materialization.
* **IMA ADPCM** — WAV format tag 0x11 (DVI/IMA, 4 bits/sample in
  independent blocks). Blocks are decoded VECTORIZED ACROSS BLOCKS: the
  per-sample recurrence loops over positions-within-block (~2·block_align
  iterations) while every numpy op spans all blocks — the shape that
  scales when a 100 TB corpus feeds thousands of blocks per Arrow batch.
* **MS ADPCM** — WAV format tag 2 (7 fixed predictor pairs + adaptive
  delta), same across-blocks vectorization; decoder bit-identical to the
  naive spec recurrence (pytest-pinned, incl. an anti-overflow delta
  ceiling both paths share).
* **AIFF** — the big-endian PCM container (FORM/AIFF, COMM's 80-bit
  extended-float sample rate). Lossless, so a WAV↔AIFF transcode pair
  produces bit-identical int16 samples → the IDENTICAL 64-bit signature
  (same guarantee the FLAC path pins, functions/flac.py).

Encoders here are test-grade (exact-roundtrip/SNR fixtures), mirroring
the flac.py / webp.py pattern.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# A-law (G.711) — integer-exact, after the public-domain Sun g711.c
# ---------------------------------------------------------------------------

_SEG_AEND = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def _alaw_expand_scalar(aval: int) -> int:
    aval ^= 0x55
    t = (aval & 0x0F) << 4
    seg = (aval & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (aval & 0x80) else -t


# 256-entry LUT: decode is a single fancy-index, output exact int16
ALAW_LUT = np.array([_alaw_expand_scalar(a) for a in range(256)], dtype=np.int16)


def alaw_decode_s16(u8: np.ndarray) -> np.ndarray:
    """A-law bytes → exact int16 samples (one LUT gather, no float)."""
    return ALAW_LUT[np.asarray(u8, dtype=np.uint8)]


def alaw_encode(s16: np.ndarray) -> np.ndarray:
    """int16 → A-law bytes (vectorized linear2alaw). Bijective with the
    LUT: ``alaw_encode(ALAW_LUT) == arange(256)`` (pytest-pinned)."""
    pcm = np.asarray(s16, dtype=np.int32) >> 3  # arithmetic shift, 13-bit
    neg = pcm < 0
    mask = np.where(neg, np.int32(0x55), np.int32(0xD5))
    mag = np.where(neg, -pcm - 1, pcm)
    np.maximum(mag, 0, out=mag)
    seg = np.searchsorted(_SEG_AEND, mag, side="left").astype(np.int32)
    # in-range values (seg<8): low nibble from the magnitude; seg>=8 saturates
    shift = np.where(seg < 2, 1, seg)
    aval = (seg << 4) | ((mag >> shift) & 0x0F)
    aval = np.where(seg >= 8, np.int32(0x7F), aval)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def alaw_encode_bytes(pcm: np.ndarray, sr_hz: int) -> bytes:
    """Encode float PCM in [-1,1] to a RIFF/WAV A-law (format 6) payload."""
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    s16 = np.round(x * 32767.0).astype(np.int16)
    data = alaw_encode(s16).tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 6, 1, sr_hz, sr_hz, 1, 8,
        b"data", len(data),
    )
    return hdr + data


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV format 0x11, mono) — vectorized across blocks
# ---------------------------------------------------------------------------

_IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)
_IMA_STEP_TABLE = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32
)


def _ima_step(pred: np.ndarray, index: np.ndarray, nib: np.ndarray):
    """One IMA update across a vector of independent blocks. The diff
    formula is the bit-test form every IMA decoder specifies (equivalent
    to ((2·nib+1)·step)>>3 with truncation applied per term)."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    diff = diff + np.where(nib & 1, step >> 2, 0)
    diff = diff + np.where(nib & 2, step >> 1, 0)
    diff = diff + np.where(nib & 4, step, 0)
    pred = np.where(nib & 8, pred - diff, pred + diff)
    np.clip(pred, -32768, 32767, out=pred)
    index = np.clip(index + _IMA_INDEX_TABLE[nib], 0, 88)
    return pred, index


def _ima_decode_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n_blocks, block_align) uint8 → (n_blocks, samples_per_block) int16.

    The sample loop runs 2·(block_align−4) times; every op inside spans
    all blocks at once (blocks are independent by construction — that is
    WHY the format splits into blocks, and why it maps onto a vectorized
    batch decode here and a per-Arrow-batch decode in the UDF stage)."""
    n_blocks, block_align = blocks.shape
    pred = blocks[:, :2].copy().view("<i2")[:, 0].astype(np.int32)
    index = np.clip(blocks[:, 2].astype(np.int32), 0, 88)
    body = blocks[:, 4:]
    nsteps = body.shape[1] * 2
    nibs = np.empty((n_blocks, nsteps), dtype=np.int32)
    nibs[:, 0::2] = body & 0x0F  # low nibble first (IMA/WAV order)
    nibs[:, 1::2] = body >> 4
    out = np.empty((n_blocks, nsteps + 1), dtype=np.int16)
    out[:, 0] = pred
    for j in range(nsteps):
        pred, index = _ima_step(pred, index, nibs[:, j])
        out[:, j + 1] = pred
    return out


def adpcm_ima_decode(data, block_align: int) -> np.ndarray:
    """IMA ADPCM data chunk → exact int16 samples (mono).

    Full blocks decode in one vectorized pass; a trailing partial block
    (the final block of a stream whose length isn't a block multiple)
    decodes zero-padded and is trimmed to its real nibble count."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if block_align < 8:
        raise ValueError(f"ima adpcm block_align {block_align} too small")
    n_full = raw.size // block_align
    rem = raw.size - n_full * block_align
    parts = []
    if n_full:
        parts.append(
            _ima_decode_blocks(raw[: n_full * block_align].reshape(n_full, block_align)).reshape(-1)
        )
    if rem:
        if rem < 4:
            raise ValueError("truncated ima adpcm block header")
        # rem == 4 is a legitimate header-only final block: 1 stored sample
        pad = np.zeros(block_align, dtype=np.uint8)
        pad[:rem] = raw[n_full * block_align:]
        dec = _ima_decode_blocks(pad[None, :])
        parts.append(dec[0, : (rem - 4) * 2 + 1])
    if not parts:
        return np.zeros(0, dtype=np.int16)
    return np.concatenate(parts)


def adpcm_ima_encode(s16: np.ndarray, block_align: int = 256) -> bytes:
    """Test-grade IMA encoder (mono). Sample 0 of each block is stored
    verbatim in the header; the quantizer mirrors the decoder update so
    encoder/decoder state stays in lockstep (standard IMA design)."""
    x = np.asarray(s16, dtype=np.int64)
    spb = (block_align - 4) * 2 + 1
    out = bytearray()
    # seed the step index from the signal's slew rate instead of 0 —
    # otherwise short clips spend their whole length in the adaptation
    # attack and miss the 30 dB invariant (the index still adapts per
    # sample afterwards; the decoder reads it from each block header)
    if x.size > 1:
        slew = max(1, int(np.mean(np.abs(np.diff(x[: min(x.size, spb)])))))
        index = int(min(np.searchsorted(_IMA_STEP_TABLE, slew), 88))
    else:
        index = 0
    for start in range(0, x.size, spb):
        chunk = x[start:start + spb]
        pred = int(chunk[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibs = []
        for s in chunk[1:]:
            step = int(_IMA_STEP_TABLE[index])
            delta = int(s) - pred
            nib = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            p, i = _ima_step(np.array([pred], dtype=np.int32),
                             np.array([index], dtype=np.int32),
                             np.array([nib], dtype=np.int32))
            pred, index = int(p[0]), int(i[0])
            nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)  # pad nibble (only possible on the final block)
        packed = np.asarray(nibs, dtype=np.uint8)
        out += (packed[0::2] | (packed[1::2] << 4)).tobytes()
    return bytes(out)


def adpcm_encode_bytes(pcm: np.ndarray, sr_hz: int, block_align: int = 256) -> bytes:
    """Encode float PCM in [-1,1] to a RIFF/WAV IMA-ADPCM (format 0x11)
    payload, with the fact chunk a compliant writer emits."""
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    s16 = np.round(x * 32767.0).astype(np.int16)
    data = adpcm_ima_encode(s16, block_align)
    spb = (block_align - 4) * 2 + 1
    byte_rate = (sr_hz * block_align + spb - 1) // spb
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, sr_hz, byte_rate, block_align, 4, 2, spb)
    fact = struct.pack("<I", s16.size)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# AIFF (FORM/AIFF, big-endian PCM) — lossless container
# ---------------------------------------------------------------------------

def _f80_encode(rate: int) -> bytes:
    """Positive int → 80-bit IEEE 754 extended (AIFF COMM sampleRate)."""
    if rate <= 0:
        return bytes(10)
    exp = rate.bit_length() - 1
    mant = rate << (63 - exp)
    return struct.pack(">H", exp + 16383) + mant.to_bytes(8, "big")


def _f80_decode(b: bytes) -> int:
    sign = b[0] >> 7
    exp = ((b[0] & 0x7F) << 8) | b[1]
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0 and mant == 0:
        return 0
    val = mant * 2.0 ** (exp - 16383 - 63)
    return int(round(-val if sign else val))


def aiff_encode(pcm: np.ndarray, sr_hz: int) -> bytes:
    """Encode float PCM in [-1,1] to a minimal AIFF (16-bit mono)."""
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    s16 = np.round(x * 32767.0).astype(">i2")
    return aiff_encode_s16(s16, sr_hz)


def aiff_encode_s16(s16: np.ndarray, sr_hz: int = 16000) -> bytes:
    data = np.asarray(s16).astype(">i2").tobytes()
    comm = struct.pack(">hIh", 1, len(data) // 2, 16) + _f80_encode(sr_hz)
    ssnd = struct.pack(">II", 0, 0) + data
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    if len(ssnd) % 2:
        body += b"\x00"
    return b"FORM" + struct.pack(">I", len(body)) + body


def is_aiff(buf) -> bool:
    return len(buf) >= 12 and bytes(buf[:4]) == b"FORM" and bytes(buf[8:12]) == b"AIFF"


def aiff_decode_s16(buf) -> tuple[np.ndarray, int]:
    """AIFF → (exact int16 samples native-endian, sr_hz). Mono, sample
    widths 8 (signed, unlike WAV)/16/24/32 big-endian — wider depths
    reduce to their top 16 bits, matching the WAV pcm_to_s16 contract;
    anything else raises ValueError (caller → null signature, the
    degradation contract of main.go:666-674)."""
    if not is_aiff(buf):
        raise ValueError("not a FORM/AIFF buffer")
    pos, n = 12, len(buf)
    channels = bits = None
    sr = 0
    frames = 0
    data = None
    while pos + 8 <= n:
        cid = bytes(buf[pos:pos + 4])
        (clen,) = struct.unpack_from(">I", buf, pos + 4)
        body = buf[pos + 8:pos + 8 + clen]
        if cid == b"COMM":
            channels, frames, bits = struct.unpack_from(">hIh", body, 0)
            sr = _f80_decode(bytes(body[8:18]))
        elif cid == b"SSND":
            (offset,) = struct.unpack_from(">I", body, 0)
            data = body[8 + offset:]
        pos += 8 + clen + (clen & 1)
    if channels is None or data is None:
        raise ValueError("missing COMM/SSND chunk")
    if channels != 1:
        raise ValueError(f"unsupported aiff channel count {channels}")
    if bits == 16:
        s16 = np.frombuffer(data, dtype=">i2", count=min(frames, len(data) // 2))
        return s16.astype(np.int16), int(sr)
    if bits == 8:  # AIFF 8-bit is SIGNED (WAV's is unsigned+128)
        i8 = np.frombuffer(data, dtype=np.int8, count=min(frames, len(data)))
        return (i8.astype(np.int16) << 8), int(sr)
    if bits == 24:
        n = min(frames, len(data) // 3)
        raw = np.frombuffer(data, dtype=np.uint8, count=n * 3).reshape(n, 3)
        # big-endian: the FIRST two bytes are the high 16 bits
        return raw[:, 0:2].copy().view(">i2")[:, 0].astype(np.int16), int(sr)
    if bits == 32:
        i32 = np.frombuffer(data, dtype=">i4", count=min(frames, len(data) // 4))
        return (i32.astype(np.int32) >> 16).astype(np.int16), int(sr)
    raise ValueError(f"unsupported aiff layout ch={channels} bits={bits}")


# ---------------------------------------------------------------------------
# MS ADPCM (WAV format 0x02, mono) — vectorized across blocks
# ---------------------------------------------------------------------------

_MS_COEF1 = np.array([256, 512, 0, 192, 240, 460, 392], dtype=np.int64)
_MS_COEF2 = np.array([0, -256, 0, 64, 0, -208, -232], dtype=np.int64)
_MS_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230],
    dtype=np.int64,
)
_MS_DELTA_CEIL = 1 << 24  # see the anti-overflow note in _ms_decode_blocks


def _ms_decode_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n_blocks, block_align) uint8 → (n_blocks, samples) int16.

    Header (mono): predictor idx u8, idelta i16le, sample1 i16le,
    sample2 i16le; sample2 is the OLDER of the two seed samples and is
    emitted first. Nibbles are HIGH-first (opposite of IMA). Same
    vectorization shape as _ima_decode_blocks: the recurrence loops over
    positions, every op spans all blocks."""
    n_blocks, block_align = blocks.shape
    pred_idx = np.clip(blocks[:, 0].astype(np.int64), 0, 6)
    hdr = blocks[:, 1:7].copy().view("<i2").astype(np.int64)  # (n, 3)
    delta, s1, s2 = hdr[:, 0], hdr[:, 1], hdr[:, 2]
    c1, c2 = _MS_COEF1[pred_idx], _MS_COEF2[pred_idx]
    body = blocks[:, 7:]
    nsteps = body.shape[1] * 2
    nibs = np.empty((n_blocks, nsteps), dtype=np.int64)
    nibs[:, 0::2] = body >> 4          # high nibble first
    nibs[:, 1::2] = body & 0x0F
    signed = np.where(nibs >= 8, nibs - 16, nibs)  # two's-complement 4-bit
    out = np.empty((n_blocks, nsteps + 2), dtype=np.int16)
    out[:, 0] = s2
    out[:, 1] = s1
    delta = np.minimum(np.maximum(delta, 16), _MS_DELTA_CEIL)
    for j in range(nsteps):
        pred = (s1 * c1 + s2 * c2) >> 8
        pred = pred + signed[:, j] * delta
        np.clip(pred, -32768, 32767, out=pred)
        out[:, j + 2] = pred
        s2, s1 = s1, pred
        delta = np.maximum((_MS_ADAPT[nibs[:, j]] * delta) >> 8, 16)
        # anti-overflow guard (not in the spec, which leaves delta growth
        # to C int semantics): adversarial nibble streams grow delta ×3
        # per step and would wrap int64 after ~70 steps; real encoder
        # deltas stay ≤ the sample range. Ceiling far above legit values.
        np.minimum(delta, _MS_DELTA_CEIL, out=delta)
    return out


def adpcm_ms_decode(data, block_align: int) -> np.ndarray:
    """MS ADPCM data chunk → exact int16 samples (mono); trailing partial
    block decodes zero-padded and is trimmed to its real nibble count."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if block_align < 10:
        raise ValueError(f"ms adpcm block_align {block_align} too small")
    n_full = raw.size // block_align
    rem = raw.size - n_full * block_align
    parts = []
    if n_full:
        parts.append(
            _ms_decode_blocks(raw[: n_full * block_align].reshape(n_full, block_align)).reshape(-1)
        )
    if rem:
        if rem < 7:
            raise ValueError("truncated ms adpcm block header")
        # rem == 7 is a legitimate header-only final block: 2 stored samples
        pad = np.zeros(block_align, dtype=np.uint8)
        pad[:rem] = raw[n_full * block_align:]
        parts.append(_ms_decode_blocks(pad[None, :])[0, : (rem - 7) * 2 + 2])
    if not parts:
        return np.zeros(0, dtype=np.int16)
    return np.concatenate(parts)


def adpcm_ms_encode(s16: np.ndarray, block_align: int = 256) -> bytes:
    """Test-grade MS encoder (mono): per block, tries all 7 predictor
    pairs and keeps the one with least total error (what compliant
    encoders do); quantizer mirrors the decoder update."""
    x = np.asarray(s16, dtype=np.int64)
    spb = (block_align - 7) * 2 + 2
    out = bytearray()
    for start in range(0, x.size, spb):
        chunk = x[start:start + spb]
        if chunk.size < 2:
            chunk = np.concatenate([chunk, np.zeros(2 - chunk.size, dtype=np.int64)])
        best = None
        for pi in range(7):
            enc, err = _ms_encode_block(chunk, pi, block_align)
            if best is None or err < best[1]:
                best = (enc, err)
        out += best[0]
    return bytes(out)


def _ms_encode_block(chunk: np.ndarray, pi: int, block_align: int):
    c1, c2 = int(_MS_COEF1[pi]), int(_MS_COEF2[pi])
    s2, s1 = int(chunk[0]), int(chunk[1])
    rest = chunk[2:]
    # initial delta: mean |second difference| is the scale the predictor
    # residuals live at; floor 16 as the format requires
    if rest.size:
        d0 = int(np.mean(np.abs(np.diff(chunk[: min(chunk.size, 64)])))) or 16
    else:
        d0 = 16
    delta = max(16, d0 >> 2)
    hdr = struct.pack("<Bhhh", pi, delta, s1, s2)
    nibs = []
    err = 0
    for s in rest:
        pred = (s1 * c1 + s2 * c2) >> 8
        q = (int(s) - pred) // delta if delta else 0
        q = max(-8, min(7, q))
        dec = pred + q * delta
        dec = max(-32768, min(32767, dec))
        err += (int(s) - dec) ** 2
        nibs.append(q & 0x0F)
        s2, s1 = s1, dec
        delta = max(16, (int(_MS_ADAPT[q & 0x0F]) * delta) >> 8)
    if len(nibs) % 2:
        nibs.append(0)
    packed = np.asarray(nibs, dtype=np.uint8)
    body = ((packed[0::2] << 4) | packed[1::2]).tobytes()
    # only FULL blocks pad to block_align; a final partial block stays
    # short so the decoder's trim recovers the true sample count
    if chunk.size == (block_align - 7) * 2 + 2:
        body += b"\x00" * (block_align - 7 - len(body))
    return hdr + body, err


def adpcm_ms_encode_bytes(pcm: np.ndarray, sr_hz: int, block_align: int = 256) -> bytes:
    """Encode float PCM in [-1,1] to a RIFF/WAV MS-ADPCM (format 2) payload."""
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    s16 = np.round(x * 32767.0).astype(np.int16)
    data = adpcm_ms_encode(s16, block_align)
    spb = (block_align - 7) * 2 + 2
    byte_rate = (sr_hz * block_align + spb - 1) // spb
    # wSamplesPerBlock + wNumCoef + the 7 standard coefficient pairs
    ext = struct.pack("<HH", spb, 7) + b"".join(
        struct.pack("<hh", int(a), int(b)) for a, b in zip(_MS_COEF1, _MS_COEF2)
    )
    fmt = struct.pack("<HHIIHHH", 2, 1, sr_hz, byte_rate, block_align, 4,
                      len(ext)) + ext
    fact = struct.pack("<I", s16.size)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
