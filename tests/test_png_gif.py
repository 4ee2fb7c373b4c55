"""PNG/GIF codec tests (round-4): roundtrips, filter/interlace/depth
coverage, LZW width growth, decode-dispatch integration, and the lazy
PNM frame sampler (decode-call counting).

The encoders under test are the repo's own minimal writers, so roundtrips
alone can't catch a shared bias; the filter-coverage and Adam7 cases
therefore build the compressed byte streams BY HAND from the spec and
check exact pixel recovery.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from file_deduplicator_spark.functions import image as im
from file_deduplicator_spark.functions.png_gif import (
    PNG_MAGIC,
    gif_decode,
    gif_encode,
    png_decode,
    png_encode,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png(w, h, depth, color, raw, extra=b"", interlace=0):
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace))
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(23, 31, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_png_all_filters_hand_built():
    """One scanline per filter type (Sub/Up/Average/Paeth), deltas computed
    from the spec's reconstruction equations run in reverse."""
    rng = np.random.RandomState(3)
    w, h = 6, 4
    pix = rng.randint(0, 256, size=(h, w * 3), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y, ft in enumerate([1, 2, 3, 4]):
        cur = pix[y]
        line = np.zeros(w * 3, dtype=np.uint8)
        for x in range(w * 3):
            left = int(cur[x - 3]) if x >= 3 else 0
            up, ul = int(prev[x]), (int(prev[x - 3]) if x >= 3 else 0)
            pred = {1: left, 2: up, 3: (left + up) >> 1, 4: paeth(left, up, ul)}[ft]
            line[x] = (int(cur[x]) - pred) & 0xFF
        raw.append(ft)
        raw += line.tobytes()
        prev = cur
    out = png_decode(_png(w, h, 8, 2, bytes(raw)))
    assert np.array_equal(out, pix.reshape(h, w, 3))


def test_png_gray_palette_rgba_16bit():
    rng = np.random.RandomState(11)
    # 8-bit grayscale replicates to 3 channels
    gray = rng.randint(0, 256, size=(9, 7), dtype=np.uint8)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(9))
    d = png_decode(_png(7, 9, 8, 0, raw))
    assert d.shape == (9, 7, 3) and np.array_equal(d[:, :, 1], gray)

    # 4-bit palette: indexes packed two per byte, MSB first, never scaled
    plte = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    pidx = rng.randint(0, 16, size=(6, 10)).astype(np.uint8)
    packed = (pidx[:, 0::2] << 4) | pidx[:, 1::2]
    raw = b"".join(b"\x00" + packed[y].tobytes() for y in range(6))
    d = png_decode(_png(10, 6, 4, 3, raw, extra=_chunk(b"PLTE", plte.tobytes())))
    assert np.array_equal(d, plte[pidx])

    # RGBA drops alpha
    rgba = rng.randint(0, 256, size=(5, 5, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(5))
    assert np.array_equal(png_decode(_png(5, 5, 8, 6, raw)), rgba[:, :, :3])

    # 16-bit RGB keeps the high byte
    r16 = rng.randint(0, 65536, size=(4, 6, 3), dtype=np.uint16)
    raw = b"".join(b"\x00" + r16[y].astype(">u2").tobytes() for y in range(4))
    assert np.array_equal(png_decode(_png(6, 4, 16, 2, raw)), (r16 >> 8).astype(np.uint8))


def test_png_adam7_interlaced():
    rng = np.random.RandomState(5)
    w = h = 9  # exercises every pass incl. the degenerate tail rows
    src = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for (x0, y0, dx, dy) in passes:
        sub = src[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            raw.append(0)
            raw += sub[y].tobytes()
    assert np.array_equal(png_decode(_png(w, h, 8, 2, bytes(raw), interlace=1)), src)


def test_png_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        png_decode(b"\x89PNG\r\n\x1a\x00garbage")
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    whole = png_encode(img)
    with pytest.raises(Exception):
        png_decode(whole[: len(whole) // 2])


def test_gif_roundtrip_small_and_256_colors():
    rng = np.random.RandomState(13)
    pal = rng.randint(0, 256, size=(17, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 17, size=(19, 23))]
    assert np.array_equal(gif_decode(gif_encode(img)), img)

    # 256 colors × 12k pixels forces LZW code-width growth to 12 bits and
    # at least one mid-stream Clear — the desync-prone paths
    pal2 = np.arange(256, dtype=np.uint8)[:, None].repeat(3, axis=1)
    img2 = pal2[rng.randint(0, 256, size=(120, 100))]
    assert np.array_equal(gif_decode(gif_encode(img2)), img2)


def test_gif_interlaced():
    """Interlaced rasters store rows in 4-pass order; build one by hand."""
    rng = np.random.RandomState(17)
    pal = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, size=(11, 5)).astype(np.uint8)
    plain = gif_encode(pal[idx])
    # rewrite the encoded stream: reorder rows into interlace order and set
    # the interlace flag in the image descriptor
    h, w = idx.shape
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    inter = gif_encode(pal[idx[order]])  # same palette: colors identical
    # image descriptor starts after 13-byte header + 3*table bytes; find 0x2C
    pos = inter.index(b"\x2C", 13)
    flags_off = pos + 9
    patched = inter[:flags_off] + bytes([inter[flags_off] | 0x40]) + inter[flags_off + 1:]
    assert np.array_equal(gif_decode(patched), pal[idx])


def test_image_decode_dispatch_png_gif():
    """image_decode sniffs PNG/GIF magics and the full perceptual chain
    produces REAL signatures (no allow_fake) for both — same hash as the
    identical pixels via PPM."""
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, size=(48, 64, 3), dtype=np.uint8)
    ref = im.image_sig_from_bytes(im.ppm_encode(img), "phash")
    assert im.image_sig_from_bytes(png_encode(img), "phash") == ref
    pal = rng.randint(0, 256, size=(256, 3), dtype=np.uint8)
    gimg = pal[rng.randint(0, 256, size=(48, 64))]
    ref_g = im.image_sig_from_bytes(im.ppm_encode(gimg), "dhash")
    assert im.image_sig_from_bytes(gif_encode(gimg), "dhash") == ref_g


def test_multimodal_decode_real_png_gif():
    from file_deduplicator_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(29)
    img = rng.randint(0, 256, size=(20, 20, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(png_encode(img)), img)  # no allow_fake
    pal = rng.randint(0, 256, size=(8, 3), dtype=np.uint8)
    gimg = pal[rng.randint(0, 8, size=(20, 20))]
    assert np.array_equal(decode_image(gif_encode(gimg)), gimg)


def test_sample_stream_frames_lazy(monkeypatch):
    """The sampler must decode ONLY the sampled frames (round-4 rework):
    header walk → offsets → n decodes, not len(stream) decodes."""
    rng = np.random.RandomState(31)
    frames = [rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8) for _ in range(20)]
    buf = im.pnm_stream_encode(frames)

    calls = {"n": 0}
    real = im.pnm_decode

    def counting(b):
        calls["n"] += 1
        return real(b)

    monkeypatch.setattr(im, "pnm_decode", counting)
    out = im.sample_stream_frames(buf, n_frames=4)
    assert calls["n"] == 4, "sampler decoded more frames than it sampled"
    idx = np.linspace(0, 19, 4).round().astype(int)
    for got, i in zip(out, idx):
        assert np.array_equal(got, frames[i])

    # fewer frames than requested: all decoded, exactly once each
    calls["n"] = 0
    short = im.pnm_stream_encode(frames[:3])
    assert len(im.sample_stream_frames(short, n_frames=4)) == 3
    assert calls["n"] == 3


def test_pnm_stream_index_offsets_and_truncation():
    frames = [np.full((4, 5, 3), i, dtype=np.uint8) for i in range(5)]
    buf = im.pnm_stream_encode(frames)
    spans = im.pnm_stream_index(buf)
    assert len(spans) == 5
    assert spans[0][0] == 0 and spans[-1][1] == len(buf)
    for (a, b), f in zip(spans, frames):
        assert np.array_equal(im.pnm_decode(buf[a:b]), f)
    # truncated tail dropped, not raised
    assert len(im.pnm_stream_index(buf[:-7])) == 4
    with pytest.raises(ValueError):
        im.pnm_stream_index(b"XX not a stream")


# ---------------------------------------------------------------------------
# Animated GIF as a video container (round-4 extension beyond the reference:
# Go's gif.Decode — and therefore the reference — reads the first frame only)
# ---------------------------------------------------------------------------


def _palette_frames(n, h=12, w=16, seed=41):
    """n frames sharing a small palette so one GCT covers the stream."""
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(13, 3), dtype=np.uint8)
    return [pal[rng.randint(0, 13, size=(h, w))] for _ in range(n)]


def test_gif_stream_full_roundtrip_and_lazy_sampling(monkeypatch):
    from file_deduplicator_spark.functions import png_gif as pg

    frames = _palette_frames(10)
    buf = pg.gif_stream_encode(frames, mode="full")

    idxrecs = pg.gif_frames_index(buf)
    assert len(idxrecs) == 10
    assert all(r["independent"] for r in idxrecs)

    calls = {"n": 0}
    real = pg._lzw_decode

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pg, "_lzw_decode", counting)
    out = pg.gif_sample_frames(buf, n_frames=4)
    assert calls["n"] == 4, "independent-frame GIF must decode only samples"
    pick = np.linspace(0, 9, 4).round().astype(int)
    for got, i in zip(out, pick):
        assert np.array_equal(got, frames[i])

    # first frame via the single-image decoder still matches
    assert np.array_equal(pg.gif_decode(buf), frames[0])


def test_gif_stream_delta_composite_exact():
    """Delta mode writes changed-bbox sub-rects; sequential compositing must
    reproduce every sampled frame exactly."""
    from file_deduplicator_spark.functions import png_gif as pg

    rng = np.random.RandomState(43)
    pal = rng.randint(0, 256, size=(9, 3), dtype=np.uint8)
    base = pal[rng.randint(0, 9, size=(15, 20))]
    frames = [base.copy()]
    for _ in range(7):
        nxt = frames[-1].copy()
        y, x = rng.randint(0, 10), rng.randint(0, 14)
        nxt[y:y + 5, x:x + 6] = pal[rng.randint(0, 9, size=(5, 6))]
        frames.append(nxt)
    buf = pg.gif_stream_encode(frames, mode="delta")

    recs = pg.gif_frames_index(buf)
    assert len(recs) == 8
    assert recs[0]["independent"] and not all(r["independent"] for r in recs[1:])

    out = pg.gif_sample_frames(buf, n_frames=4)
    pick = np.linspace(0, 7, 4).round().astype(int)
    for got, i in zip(out, pick):
        assert np.array_equal(got, frames[i])

    # sampling more frames than exist returns all, in order
    assert len(pg.gif_sample_frames(buf, n_frames=20)) == 8


def test_gif_disposal_and_transparency_hand_built():
    """Hand-built 3-frame GIF: frame 1 disposal=3 (restore previous) with a
    transparent hole, frame 2 full repaint — checks GCE parsing, transparent
    skip, and restore-previous compositing against the spec."""
    from file_deduplicator_spark.functions import png_gif as pg

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype=np.uint8)
    h = w = 4

    def lzw(indices):
        # reuse the literal-code writer via the public encoder path:
        # build a tiny stream by hand instead (2-bit codes, width 3)
        out = bytearray()
        acc = bits = 0

        def emit(c, wd=3):
            nonlocal acc, bits
            acc |= c << bits
            bits += wd
            while bits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                bits -= 8

        emit(4)  # clear (min_code=2)
        width = [3]
        next_code = [6]
        first = [True]
        for v in indices:
            emit(int(v), width[0])
            if first[0]:
                first[0] = False
                continue
            next_code[0] += 1
            if next_code[0] == (1 << width[0]) and width[0] < 12:
                width[0] += 1
        emit(5, width[0])  # end
        if bits:
            out.append(acc & 0xFF)
        return bytes(out)

    def frame_block(ix, iy, iw, ih, indices, disposal, transparent=None):
        gce_packed = (disposal << 2) | (1 if transparent is not None else 0)
        b = bytearray(b"\x21\xF9\x04")
        b += bytes([gce_packed, 0, 0, transparent or 0, 0])
        b += b"\x2C" + struct.pack("<HHHHB", ix, iy, iw, ih, 0)
        b.append(2)  # min_code
        data = lzw(indices)
        for i in range(0, len(data), 255):
            blk = data[i:i + 255]
            b.append(len(blk))
            b += blk
        b += b"\x00"
        return bytes(b)

    f0 = np.zeros((h, w), dtype=np.uint8)          # all red
    overlay = np.array([[1, 3], [3, 2]], dtype=np.uint8)  # 3 = transparent
    f2 = np.full((h, w), 2, dtype=np.uint8)        # all blue

    buf = bytearray()
    buf += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0)
    buf += pal.tobytes()
    buf += frame_block(0, 0, w, h, f0.ravel(), disposal=1)
    buf += frame_block(1, 1, 2, 2, overlay.ravel(), disposal=3, transparent=3)
    buf += frame_block(0, 0, w, h, f2.ravel(), disposal=1)
    buf += b"\x3B"
    buf = bytes(buf)

    out = pg.gif_sample_frames(buf, n_frames=3)
    assert len(out) == 3
    # frame 0: all red
    assert np.array_equal(out[0], np.broadcast_to(pal[0], (h, w, 3)))
    # frame 1: overlay at (1,1), transparent pixels keep red underneath
    expect1 = np.broadcast_to(pal[0], (h, w, 3)).copy()
    expect1[1, 1] = pal[1]
    expect1[2, 2] = pal[2]
    assert np.array_equal(out[1], expect1)
    # frame 2: restore-previous undid the overlay, then full blue repaint
    assert np.array_equal(out[2], np.broadcast_to(pal[2], (h, w, 3)))


def test_sample_video_frames_dispatches_gif():
    from file_deduplicator_spark.functions import png_gif as pg
    from file_deduplicator_spark.operators.multimodal import sample_video_frames

    frames = _palette_frames(6, seed=47)
    buf = pg.gif_stream_encode(frames, mode="full")
    out = sample_video_frames(buf, n_frames=3)
    pick = np.linspace(0, 5, 3).round().astype(int)
    for got, i in zip(out, pick):
        assert np.array_equal(got, frames[i])
