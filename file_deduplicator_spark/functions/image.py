"""Image kernels: dependency-free PPM/PGM/BMP codecs + the reference's
perceptual-hash pipeline, vectorized in numpy.

This replaces the round-1/2 image-decode stubs with a REAL image path in the
same spirit as the hand-rolled WAV codec (functions/audio.py:54): the
container has no Pillow/libjpeg, so the engine supports the uncompressed
formats it can decode from first principles — binary PPM (P6), PGM (P5) and
24-bit BI_RGB BMP — and the full preprocessing + hash pipeline is the
reference's actual image algorithm, not the audio analog:

* ``gamma_correct``   — gamma(2.2) brightness normalization, perceptual.go:69-86
* ``hist_equalize``   — per-channel histogram equalization, perceptual.go:90-133
* ``box_blur3``       — 3x3 box blur on the COLOR image, perceptual.go:137-169
  (edge pixels average only the in-bounds neighbors, integer floor division —
  same arithmetic as the reference's int math)
* ``preprocess_image``— the gamma → histeq → blur chain, perceptual.go:44-65
* ``catmullrom_resize``— separable Catmull-Rom resampling with kernel-support
  widening when minifying (the documented behavior of
  golang.org/x/image/draw's CatmullRom scaler used at perceptual.go:303-312)
* ``grayscale_u8``    — 0.299/0.587/0.114 luminance, perceptual.go:294-299
* ``dhash_image``     — 9x8 resize, bit = left > right, perceptual.go:173-199
* ``ahash_image``     — 8x8 resize, bit = pixel >= mean,  perceptual.go:201-238
* ``phash_image``     — 32x32 resize, 2-D DCT, top-left 8x8 vs mean (DC
  excluded), perceptual.go:240-292 — one matrix triple product instead of
  the reference's O(n^4) loop (perceptual.go:346-378)
* ``compare_images``  — hash pair + distance + similarity%, perceptual.go:474-498

Hashes are packed into a signed int64 (Spark LongType) exactly like the
audio signatures; ``hash_bitstring`` renders the reference's 64-char
'0'/'1' string form for display parity.

Pure numpy — unit-testable without Spark.
"""

from __future__ import annotations

import struct

import numpy as np

from file_deduplicator_spark.functions.audio import pack_bits

# ---------------------------------------------------------------------------
# Codecs (dependency-free, uncompressed formats only)
# ---------------------------------------------------------------------------


def ppm_encode(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6, maxval 255)."""
    a = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("ppm_encode expects (H, W, 3) uint8")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def pgm_encode(img: np.ndarray) -> bytes:
    """(H, W) uint8 → binary PGM (P5, maxval 255)."""
    a = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if a.ndim != 2:
        raise ValueError("pgm_encode expects (H, W) uint8")
    h, w = a.shape
    return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()


def _pnm_header(buf: bytes, start: int = 0) -> tuple[bytes, int, int, int, int]:
    """Parse a PNM header (magic, width, height, maxval) allowing arbitrary
    whitespace and '#' comments; returns (magic, w, h, maxval, data_offset).
    ``start`` reads the header at an offset WITHOUT slicing ``buf`` (a slice
    copies the remaining stream — quadratic over a multi-frame walk); the
    returned data offset is relative to ``start``."""
    magic = buf[start:start + 2]
    pos = start + 2
    vals: list[int] = []
    n = len(buf)
    while len(vals) < 3:
        # skip whitespace / comments
        while pos < n and (buf[pos:pos + 1].isspace() or buf[pos:pos + 1] == b"#"):
            if buf[pos:pos + 1] == b"#":
                nl = buf.find(b"\n", pos)
                pos = n if nl < 0 else nl + 1
            else:
                pos += 1
        d0 = pos
        while pos < n and buf[pos:pos + 1].isdigit():
            pos += 1
        if pos == d0:
            raise ValueError("malformed PNM header")
        vals.append(int(buf[d0:pos]))
    # exactly one whitespace byte separates maxval from the raster
    return magic, vals[0], vals[1], vals[2], pos + 1 - start


def pnm_decode(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) → (H, W, 3) uint8; binary PGM (P5) → replicated to 3
    channels so every decoded image is (H, W, 3)."""
    magic, w, h, maxval, off = _pnm_header(bytes(buf))
    if maxval != 255:
        raise ValueError(f"unsupported PNM maxval {maxval}")
    if magic == b"P6":
        need = w * h * 3
        raster = np.frombuffer(buf, dtype=np.uint8, count=need, offset=off)
        return raster.reshape(h, w, 3).copy()
    if magic == b"P5":
        need = w * h
        raster = np.frombuffer(buf, dtype=np.uint8, count=need, offset=off)
        return np.repeat(raster.reshape(h, w, 1), 3, axis=2)
    raise ValueError(f"unsupported PNM magic {magic!r}")


def bmp_encode(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit BI_RGB BMP (bottom-up, row-padded)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("bmp_encode expects (H, W, 3) uint8")
    h, w = a.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    bgr = a[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    data = rows.tobytes()
    file_size = 54 + len(data)
    hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return hdr + dib + data


def bmp_decode(buf: bytes) -> np.ndarray:
    """24-bit uncompressed (BI_RGB) BMP → (H, W, 3) uint8 RGB. Handles
    bottom-up (positive height) and top-down (negative height) rasters."""
    buf = bytes(buf)
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP buffer")
    (data_off,) = struct.unpack_from("<I", buf, 10)
    (dib_size,) = struct.unpack_from("<I", buf, 14)
    if dib_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib_size}")
    w, h_signed = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    (compression,) = struct.unpack_from("<I", buf, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    need = row_bytes * h
    raster = np.frombuffer(buf, dtype=np.uint8, count=need, offset=data_off)
    rows = raster.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR → RGB
    if h_signed > 0:
        rgb = rgb[::-1]  # bottom-up → top-down
    return rgb.copy()


def pnm_stream_encode(frames: list[np.ndarray]) -> bytes:
    """Concatenated binary PPM frames — the netpbm video-stream format
    (what ffmpeg's image2pipe ppm muxer emits)."""
    return b"".join(ppm_encode(f) for f in frames)


def pnm_stream_index(buf: bytes, max_frames: int | None = None) -> list[tuple[int, int]]:
    """Walk a concatenated-PNM stream and return (start, end) byte offsets of
    each complete frame — HEADERS ONLY, no raster is touched or copied.

    Each frame is a complete P6/P5 image; frames simply follow each other
    (the netpbm stream convention). Raises ValueError on a malformed first
    frame; a trailing truncated/garbage frame is dropped rather than raised,
    the per-file-degradation contract (main.go:666-674).
    """
    buf = bytes(buf)
    spans: list[tuple[int, int]] = []
    pos, n = 0, len(buf)
    while pos < n and (max_frames is None or len(spans) < max_frames):
        head = buf[pos:pos + 2]
        if head not in (b"P6", b"P5"):
            if spans:
                break  # trailing garbage after valid frames — stop
            raise ValueError("not a PNM stream")
        try:
            magic, w, h, _maxval, off = _pnm_header(buf, pos)
            size = w * h * (3 if magic == b"P6" else 1)
            if pos + off + size > n:
                break  # truncated trailing frame
            spans.append((pos, pos + off + size))
            pos += off + size
        except ValueError:
            if spans:
                break
            raise
    if not spans:
        raise ValueError("empty PNM stream")
    return spans


def pnm_stream_decode(buf: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """Decode a concatenated-PNM stream → list of (H, W, 3) uint8 frames
    (see pnm_stream_index for the stream grammar / degradation contract)."""
    buf = bytes(buf)
    return [pnm_decode(buf[a:b]) for a, b in pnm_stream_index(buf, max_frames)]


def sample_stream_frames(buf: bytes, n_frames: int = 4) -> list[np.ndarray]:
    """Evenly sample ``n_frames`` frames from a PNM video stream.

    Lazy (round-4 rework): the header walk indexes every frame's byte span
    first — PNM headers carry exact raster sizes — and ONLY the sampled
    frames are decoded. A 4-of-N sample costs 4 decodes, not N; at 100 TB of
    video the old decode-everything pass paid N ndarray materializations
    per clip."""
    buf = bytes(buf)
    spans = pnm_stream_index(buf)
    if len(spans) > n_frames:
        idx = np.linspace(0, len(spans) - 1, n_frames).round().astype(int)
        spans = [spans[i] for i in idx]
    return [pnm_decode(buf[a:b]) for a, b in spans]


def image_decode(buf: bytes) -> np.ndarray:
    """Sniff + decode a supported image payload → (H, W, 3) uint8.

    The dispatcher analog of the reference's image.Decode registry
    (perceptual.go:407-431); unsupported/compressed formats raise ValueError
    which callers map to a null signature / ok=false row (main.go:666-674)."""
    head = bytes(buf[:8])
    if head[:2] in (b"P6", b"P5"):
        return pnm_decode(buf)
    if head[:2] == b"BM":
        return bmp_decode(buf)
    if head == b"\x89PNG\r\n\x1a\n":
        from file_deduplicator_spark.functions.png_gif import png_decode

        return png_decode(buf)
    if head[:4] == b"GIF8":
        from file_deduplicator_spark.functions.png_gif import gif_decode

        return gif_decode(buf)
    if head[:2] == b"\xff\xd8":
        from file_deduplicator_spark.functions.jpeg import jpeg_decode

        return jpeg_decode(buf)
    if head[:4] == b"RIFF" and bytes(buf[8:12]) == b"WEBP":
        from file_deduplicator_spark.functions.webp import webp_decode

        return webp_decode(buf)
    raise ValueError(
        "unsupported image format (supported: PPM/PGM/BMP/PNG/GIF/JPEG/"
        "lossless-WebP)"
    )


# ---------------------------------------------------------------------------
# Preprocessing (perceptual.go:44-169) — vectorized parity
# ---------------------------------------------------------------------------

# gamma(2.2) lookup table: uint8(pow(v/255, 1/2.2) * 255), the exact
# per-channel arithmetic of applyGammaCorrection (r/65535 with r = v*257
# is exactly v/255; the Go code truncates the float to uint8)
_GAMMA = 2.2
_GAMMA_LUT = (
    np.power(np.arange(256) / 255.0, 1.0 / _GAMMA) * 255.0
).astype(np.uint8)


def gamma_correct(img: np.ndarray) -> np.ndarray:
    """Gamma(2.2) brightness normalization (perceptual.go:69-86)."""
    return _GAMMA_LUT[np.asarray(img, dtype=np.uint8)]


def hist_equalize(img: np.ndarray) -> np.ndarray:
    """Per-channel histogram equalization (perceptual.go:90-133):
    out = uint8(cdf[v] / pixel_count * 255), truncated like the reference."""
    a = np.asarray(img, dtype=np.uint8)
    h, w, _ = a.shape
    n = h * w
    out = np.empty_like(a)
    for c in range(3):
        hist = np.bincount(a[:, :, c].reshape(-1), minlength=256)
        cdf = np.cumsum(hist)
        lut = (cdf.astype(np.float64) / n * 255.0).astype(np.uint8)
        out[:, :, c] = lut[a[:, :, c]]
    return out


def box_blur3(img: np.ndarray) -> np.ndarray:
    """3x3 box blur on the color image (perceptual.go:137-169): edge pixels
    average only in-bounds neighbors; integer floor division like Go int math."""
    a = np.asarray(img, dtype=np.int64)
    h, w, ch = a.shape
    p = np.zeros((h + 2, w + 2, ch), dtype=np.int64)
    p[1:-1, 1:-1] = a
    rs = p[:-2] + p[1:-1] + p[2:]          # vertical 3-sums  (h, w+2, ch)
    tot = rs[:, :-2] + rs[:, 1:-1] + rs[:, 2:]  # 3x3 sums     (h, w, ch)
    ones = np.zeros((h + 2, w + 2), dtype=np.int64)
    ones[1:-1, 1:-1] = 1
    cr = ones[:-2] + ones[1:-1] + ones[2:]
    cnt = (cr[:, :-2] + cr[:, 1:-1] + cr[:, 2:])[:, :, None]
    return (tot // cnt).astype(np.uint8)


def preprocess_image(
    img: np.ndarray,
    apply_gamma: bool = True,
    apply_normalization: bool = True,
    apply_blur: bool = True,
) -> np.ndarray:
    """The reference's default preprocessing chain (perceptual.go:44-65):
    gamma → histogram equalization → color blur. Flag set mirrors
    PreprocessingOptions (perceptual.go:25-40)."""
    out = np.asarray(img, dtype=np.uint8)
    if apply_gamma:
        out = gamma_correct(out)
    if apply_normalization:
        out = hist_equalize(out)
    if apply_blur:
        out = box_blur3(out)
    return out


# ---------------------------------------------------------------------------
# Catmull-Rom resize (perceptual.go:301-312) + grayscale (294-299)
# ---------------------------------------------------------------------------


def _catrom_kernel(t: np.ndarray) -> np.ndarray:
    t = np.abs(t)
    return np.where(
        t < 1.0,
        ((1.5 * t - 2.5) * t) * t + 1.0,
        np.where(t < 2.0, ((-0.5 * t + 2.5) * t - 4.0) * t + 2.0, 0.0),
    )


def _resample_matrix(src_n: int, dst_n: int) -> np.ndarray:
    """(dst_n, src_n) row-normalized Catmull-Rom weight matrix. When
    minifying the kernel support is widened by the scale factor (proper
    resampling, as x/image/draw's kernel scaler does) so every source pixel
    contributes — plain interpolation would alias."""
    scale = src_n / dst_n
    kscale = max(scale, 1.0)
    support = 2.0 * kscale
    centers = (np.arange(dst_n) + 0.5) * scale - 0.5
    lo = np.ceil(centers - support).astype(np.int64)
    n_taps = int(np.ceil(2.0 * support)) + 1
    idx = lo[:, None] + np.arange(n_taps)[None, :]
    wts = _catrom_kernel((idx - centers[:, None]) / kscale)
    idx_c = np.clip(idx, 0, src_n - 1)  # edge clamp, like the Go scaler
    mat = np.zeros((dst_n, src_n))
    np.add.at(
        mat,
        (np.repeat(np.arange(dst_n), n_taps), idx_c.reshape(-1)),
        wts.reshape(-1),
    )
    return mat / mat.sum(axis=1, keepdims=True)


def catmullrom_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """(H, W, C) → (out_h, out_w, C) float64 via separable Catmull-Rom."""
    a = np.asarray(img, dtype=np.float64)
    wy = _resample_matrix(a.shape[0], out_h)
    wx = _resample_matrix(a.shape[1], out_w)
    tmp = np.tensordot(wy, a, axes=([1], [0]))          # (out_h, W, C)
    out = np.tensordot(tmp, wx, axes=([1], [1]))        # (out_h, C, out_w)
    return np.clip(out.transpose(0, 2, 1), 0.0, 255.0)


def grayscale_u8(img: np.ndarray) -> np.ndarray:
    """Luminance 0.299 R + 0.587 G + 0.114 B, truncated to int — the exact
    formula of perceptual.go:294-299. Accepts float (post-resize) or uint8."""
    a = np.asarray(img, dtype=np.float64)
    return (0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]).astype(np.int64)


def resize_gray(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """preprocessed color → (out_h, out_w) int grayscale, the resizeImage →
    grayscale() composition the three hashes share (perceptual.go:179-186).

    Parity note: ALGORITHM-level, not bit-level — the reference grayscales
    the uint8 pixels x/image/draw's scaler emits, while this feeds the
    un-rounded float64 resize into the luminance formula (and the
    Catmull-Rom matrix is a re-derivation of the documented kernel, not a
    port of the Go scaler). The invariance suites pin behavior at the
    reference's thresholds (perceptual_test.go:198-200)."""
    return grayscale_u8(catmullrom_resize(img, out_w, out_h))


# ---------------------------------------------------------------------------
# The three perceptual hashes (packed int64, bit 0 = first reference char)
# ---------------------------------------------------------------------------


def dhash_image(img: np.ndarray, preprocessed: bool = False) -> int:
    """Difference hash (perceptual.go:171-199): 9x8 grid, bit = left > right."""
    p = img if preprocessed else preprocess_image(img)
    g = resize_gray(p, 9, 8)
    return pack_bits((g[:, :-1] > g[:, 1:]).reshape(-1))


def ahash_image(img: np.ndarray, preprocessed: bool = False) -> int:
    """Average hash (perceptual.go:201-238): 8x8 grid, bit = pixel >= mean.
    The mean is integer-truncated (total/64 in Go int math)."""
    p = img if preprocessed else preprocess_image(img)
    g = resize_gray(p, 8, 8)
    avg = int(g.sum()) // 64
    return pack_bits((g >= avg).reshape(-1))


# 32-point DCT-II basis matrix M[u, x] = cos((2x+1) u pi / 64) — the
# vectorized replacement for the reference's O(n^4) nested loop
# (perceptual.go:346-378); coefficient scaling matches theirs exactly:
# result[v][u] = (2/N) cu cv sum_xy p[y][x] M[u,x] M[v,y].
_PHASH_N = 32
_px = np.arange(_PHASH_N)
_PHASH_M = np.cos((2.0 * _px[None, :] + 1.0) * _px[:, None] * np.pi / (2.0 * _PHASH_N))
_PHASH_C = np.ones(_PHASH_N)
_PHASH_C[0] = 1.0 / np.sqrt(2.0)


def phash_image(img: np.ndarray, preprocessed: bool = False) -> int:
    """Perceptual (DCT) hash (perceptual.go:240-292): 32x32 grayscale, 2-D
    DCT, top-left 8x8 coefficients vs their mean with DC excluded."""
    p = img if preprocessed else preprocess_image(img)
    g = resize_gray(p, _PHASH_N, _PHASH_N).astype(np.float64)
    # dct[v, u] = (2/N) cu cv (M g M^T)[v, u]  with g indexed [y][x]
    dct = (2.0 / _PHASH_N) * (_PHASH_C[:, None] * _PHASH_C[None, :]) * (
        _PHASH_M @ g @ _PHASH_M.T
    )
    low = dct[:8, :8]
    avg = (low.sum() - low[0, 0]) / 63.0
    return pack_bits((low >= avg).reshape(-1))


IMAGE_SIG_FUNCS = {"dhash": dhash_image, "ahash": ahash_image, "phash": phash_image}


def image_sig_from_bytes(buf: bytes, algo: str = "dhash") -> int:
    """Decode + hash one image payload; the computePerceptualHash analog
    (perceptual.go:406-431) — unknown algo falls back to dhash like the
    reference's default branch."""
    fn = IMAGE_SIG_FUNCS.get(algo.lower(), dhash_image)
    return fn(image_decode(buf))


def hash_bitstring(sig: int) -> str:
    """int64 signature → the reference's 64-char '0'/'1' string form."""
    return format(sig & 0xFFFFFFFFFFFFFFFF, "064b")


def compare_images(buf1: bytes, buf2: bytes, algo: str = "dhash") -> dict:
    """Detailed pair comparison (CompareImages, perceptual.go:473-498):
    hashes, Hamming distance, similarity %, isSimilar at the fixed
    threshold 10 the reference hard-codes."""
    from file_deduplicator_spark.functions.audio import hamming64

    h1 = image_sig_from_bytes(buf1, algo)
    h2 = image_sig_from_bytes(buf2, algo)
    dist = hamming64(h1, h2)
    similarity = max(0.0, 100.0 - dist / 64.0 * 100.0)
    return {
        "hash1": hash_bitstring(h1),
        "hash2": hash_bitstring(h2),
        "distance": dist,
        "similarity": similarity,
        "isSimilar": 0 <= dist <= 10,
    }
