"""Dependency-free baseline JPEG codec (pure numpy + stdlib).

Extends decode parity with the reference, whose image registry is Go's
stdlib decoders — ``image/jpeg`` is registered first (perceptual.go:4-14)
and .jpg/.jpeg lead the ``isImageFile`` extension gate
(perceptual.go:434-442). With PNG/GIF (functions/png_gif.py) and this
module, only WebP remains codec-library-gated.

Scope (ITU-T T.81 baseline):
* SOI / APPn / COM / DQT (8- and 16-bit precision) / DHT / DRI / SOF0+SOF1
  / SOS / EOI marker walk;
* sequential DCT, 8-bit samples, 1-component grayscale or 3-component
  YCbCr with any integer subsampling ratio (4:4:4, 4:2:2, 4:2:0, ...);
* restart markers (byte-aligned RST0-7, DC predictors reset per interval);
* progressive (SOF2) and arithmetic coding raise ValueError — callers map
  that to a null signature / ok=false row exactly like other unsupported
  payloads (main.go:666-674).

Parity notes: entropy decode + dequantize follow the spec; the IDCT is the
exact float 8x8 basis as a matrix triple product (Go's image/jpeg uses a
scaled-integer IDCT, so pixel parity is algorithm-level, within +/-1, not
bit-level — same stance as the Catmull-Rom resampler, see image.py).
YCbCr->RGB *is* Go's integer formula (image/color/ycbcr.go YCbCrToRGB:
0x10101 luma expansion, 91881/22554/46802/116130 chroma multipliers,
shift-16 with clamp), so the color conversion is bit-identical to the
reference's.

The encoder exists for the test suite (roundtrip + subsampling + restart
coverage): Annex K quantization/Huffman tables, IJG quality scaling,
4:4:4 or 4:2:0, optional restart interval, grayscale or color.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared constants
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """Raster index of each zigzag position (T.81 Figure A.6), generated
    rather than transcribed: walk the 15 anti-diagonals, reversing the
    even ones (the first diagonal steps up-right)."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        order += [i * 8 + j for i, j in diag]
    return np.array(order)


_ZIGZAG = _zigzag()

# 8-point DCT-II basis: _DCT[k, n] = 0.5 * c(k) * cos((2n+1) k pi / 16);
# forward block transform is C @ x @ C.T, inverse is C.T @ X @ C.
_DCT = np.array(
    [
        [
            0.5 * (1 / np.sqrt(2) if k == 0 else 1.0) * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

# Annex K.1 base quantization tables (raster order).
_QUANT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]
)
_QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99]
)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval).
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _canonical_codes(bits: list[int], vals: list[int]):
    """(bits, huffval) -> [(length, code, symbol)] in canonical order
    (T.81 Annex C code assignment)."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code, vals[k]))
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    return {(ln, code): sym for ln, code, sym in _canonical_codes(bits, vals)}


def _encode_table(bits, vals):
    return {sym: (code, ln) for ln, code, sym in _canonical_codes(bits, vals)}


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over a destuffed entropy segment; the segment is
    padded with 1-bits past its end (T.81 F.2.2.5 — the spec's own
    convention for the final partial byte)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        while self.n < k:
            b = self.data[self.pos] if self.pos < len(self.data) else 0xFF
            self.pos += 1
            self.buf = (self.buf << 8) | b
            self.n += 8
        self.n -= k
        v = (self.buf >> self.n) & ((1 << k) - 1)
        self.buf &= (1 << self.n) - 1
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        self.buf = (self.buf << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            b = (self.buf >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0)  # byte stuffing
        self.buf &= (1 << self.n) - 1

    def flush(self) -> None:
        pad = (-self.n) % 8
        if pad:
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _huff_decode(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map the s raw bits of a coefficient to its signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "coefs", "positions")

    def __init__(self, cid, h, v, tq):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.coefs: list[np.ndarray] = []  # zigzag coefficient vectors
        self.positions: list[tuple[int, int]] = []  # (block_row, block_col)


def _split_scan(buf: bytes, pos: int):
    """Split entropy-coded data at ``pos`` into restart intervals with the
    0xFF00 stuffing removed. Returns (intervals, pos_of_next_marker)."""
    intervals: list[bytes] = []
    cur = bytearray()
    n = len(buf)
    while pos < n:
        b = buf[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        m = buf[pos + 1] if pos + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            intervals.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker: end of scan
            break
    intervals.append(bytes(cur))
    return intervals, pos


def jpeg_decode(buf: bytes) -> np.ndarray:
    """Decode a baseline JPEG → (H, W, 3) uint8 (grayscale replicated).

    Every malformed-payload failure mode surfaces as ValueError — the
    contract callers rely on for ok=false degradation (main.go:666-674)."""
    try:
        return _jpeg_decode(buf)
    except (IndexError, struct.error, StopIteration, OverflowError) as e:
        raise ValueError(f"corrupt JPEG: {type(e).__name__}") from e


def _jpeg_decode(buf: bytes) -> np.ndarray:
    buf = bytes(buf)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    comps: list[_Component] = []
    H = W = 0
    dri = 0
    n = len(buf)
    while pos < n:
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            continue
        (seglen,) = struct.unpack(">H", buf[pos:pos + 2])
        seg = buf[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                table = np.zeros(64, dtype=np.int32)
                table[_ZIGZAG] = vals  # DQT stores zigzag order
                qt[tq] = table
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                (ac_tables if tc else dc_tables)[th] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            prec, H, W, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG sample precision {prec}")
            comps = [
                _Component(seg[6 + 3 * i], seg[7 + 3 * i] >> 4,
                           seg[7 + 3 * i] & 15, seg[8 + 3 * i])
                for i in range(nc)
            ]
        elif marker == 0xC2:
            raise ValueError("progressive JPEG not supported (baseline only)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG coding process (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            order = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c.cid == cid)
                comp.td, comp.ta = tt >> 4, tt & 15
                order.append(comp)
            intervals, pos = _split_scan(buf, pos + seglen)
            _decode_scan(order, intervals, dc_tables, ac_tables, dri, H, W)
            continue  # pos already past the entropy data
        # APPn / COM / others: skipped
        pos += seglen
    if not comps or not comps[0].coefs:
        raise ValueError("JPEG contains no decoded scan")
    return _assemble(comps, qt, H, W)


def _decode_scan(order, intervals, dc_tables, ac_tables, dri, H, W):
    for c in order:
        if c.td not in dc_tables or c.ta not in ac_tables:
            raise ValueError(f"JPEG scan references undefined huffman table "
                             f"(dc={c.td}, ac={c.ta})")
    hmax = max(c.h for c in order)
    vmax = max(c.v for c in order)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    total = mcus_x * mcus_y
    reader = _BitReader(intervals[0])
    interval_i = 0
    preds = {c.cid: 0 for c in order}
    for m in range(total):
        if dri and m and m % dri == 0:
            interval_i += 1
            if interval_i >= len(intervals):
                raise ValueError("JPEG truncated: missing restart interval")
            reader = _BitReader(intervals[interval_i])
            preds = {c.cid: 0 for c in order}
        my, mx = divmod(m, mcus_x)
        for c in order:
            dc_t, ac_t = dc_tables[c.td], ac_tables[c.ta]
            for v_i in range(c.v):
                for h_i in range(c.h):
                    coef = np.zeros(64, dtype=np.int32)
                    s = _huff_decode(reader, dc_t)
                    if s > 15:  # corrupt DHT: DC category is <= 11 by spec
                        raise ValueError(f"invalid JPEG DC category {s}")
                    diff = _extend(reader.read(s), s) if s else 0
                    preds[c.cid] += diff
                    coef[0] = preds[c.cid]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(reader, ac_t)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                break  # EOB
                            k += 16  # ZRL
                        else:
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            coef[k] = _extend(reader.read(s), s)
                            k += 1
                    c.coefs.append(coef)
                    c.positions.append((my * c.v + v_i, mx * c.h + h_i))


def _assemble(comps, qt, H, W) -> np.ndarray:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        if c.tq not in qt:
            raise ValueError(f"JPEG references missing quant table {c.tq}")
        zz = np.stack(c.coefs) * qt[c.tq][None, :]  # dequantize (zigzag order)
        blocks = np.zeros((len(zz), 64), dtype=np.float64)
        blocks[:, _ZIGZAG] = zz
        blocks = blocks.reshape(-1, 8, 8)
        # batched 2-D IDCT: C.T @ X @ C per block
        spatial = np.einsum("ki,mkl,lj->mij", _DCT, blocks, _DCT) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
        rows = max(p[0] for p in c.positions) + 1
        cols = max(p[1] for p in c.positions) + 1
        plane = np.zeros((rows * 8, cols * 8), dtype=np.uint8)
        for blk, (br, bc) in zip(spatial, c.positions):
            plane[br * 8:br * 8 + 8, bc * 8:bc * 8 + 8] = blk
        ch = -(-H * c.v // vmax)  # component raster size (A.1.1)
        cw = -(-W * c.h // hmax)
        plane = plane[:ch, :cw]
        if hmax % c.h or vmax % c.v:
            raise ValueError("non-integral JPEG subsampling ratio")
        plane = plane.repeat(vmax // c.v, axis=0).repeat(hmax // c.h, axis=1)
        planes.append(plane[:H, :W])
    if len(planes) == 1:
        return np.repeat(planes[0][:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    """Go's exact integer YCbCr->RGB (image/color/ycbcr.go YCbCrToRGB):
    16.16 fixed point, 0x10101 luma expansion folds in rounding, shift-16
    after clamping to [0, 0xFFFFFF]. Bit-identical to the reference."""
    yy = y.astype(np.int64) * 0x10101
    cb1 = cb.astype(np.int64) - 128
    cr1 = cr.astype(np.int64) - 128
    r = np.clip(yy + 91881 * cr1, 0, 0xFFFFFF) >> 16
    g = np.clip(yy - 22554 * cb1 - 46802 * cr1, 0, 0xFFFFFF) >> 16
    b = np.clip(yy + 116130 * cb1, 0, 0xFFFFFF) >> 16
    return np.stack([r, g, b], axis=2).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (test-suite support)
# ---------------------------------------------------------------------------


def _quality_tables(quality: int):
    """IJG quality scaling of the Annex K tables."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int32))
    return out


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane (H, W multiples of 8) -> (n_blocks, 64) zigzag
    quantized coefficients, blocks in raster order."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8).astype(np.float64) - 128.0
    )
    coef = np.einsum("ik,mkl,jl->mij", _DCT, blocks, _DCT)
    zz = coef.reshape(-1, 64)[:, _ZIGZAG]
    return np.floor(zz / q[_ZIGZAG][None, :] + 0.5).astype(np.int32)


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int, dc_t, ac_t) -> int:
    diff = int(zz[0]) - pred
    s = int(diff != 0 and int(abs(diff)).bit_length())
    code, ln = dc_t[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = np.nonzero(zz[1:])[0]
    last = last[-1] + 1 if len(last) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = int(abs(v)).bit_length()
        code, ln = ac_t[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_t[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def _rgb_to_ycbcr(img: np.ndarray):
    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return tuple(np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr))


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    return np.pad(plane, ((0, h - plane.shape[0]), (0, w - plane.shape[1])),
                  mode="edge")


def jpeg_encode(img: np.ndarray, quality: int = 90, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline JPEG writer: 4:4:4 (default) or 4:2:0 (``subsample``),
    grayscale for 2-D input, optional DRI/RSTn emission."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    H, W = img.shape[:2]
    ql, qc = _quality_tables(quality)
    dc_l, ac_l = _encode_table(*_HUFF_DC_LUMA), _encode_table(*_HUFF_AC_LUMA)
    dc_c, ac_c = _encode_table(*_HUFF_DC_CHROMA), _encode_table(*_HUFF_AC_CHROMA)

    if gray:
        samp = [(1, 1)]
        planes = [img]
        quants = [ql]
        huffs = [(dc_l, ac_l)]
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        if subsample:
            samp = [(2, 2), (1, 1), (1, 1)]
            eh, ew = -(-H // 2) * 2, -(-W // 2) * 2
            y = _pad_to(y, eh, ew)
            cb = _pad_to(cb, eh, ew).reshape(eh // 2, 2, ew // 2, 2).mean(
                axis=(1, 3)).round().astype(np.uint8)
            cr = _pad_to(cr, eh, ew).reshape(eh // 2, 2, ew // 2, 2).mean(
                axis=(1, 3)).round().astype(np.uint8)
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        quants = [ql, qc, qc]
        huffs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    # per-component zigzag blocks, raster order, padded to the MCU grid
    comp_blocks = []
    for plane, (h, v), q in zip(planes, samp, quants):
        ph, pw = mcus_y * v * 8, mcus_x * h * 8
        comp_blocks.append(_fdct_quant(_pad_to(plane, ph, pw), q))

    writer = _BitWriter()
    preds = [0] * len(planes)
    out_chunks: list[bytes] = []
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            out_chunks.append(bytes(writer.out))
            out_chunks.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) % 8
            writer = _BitWriter()
            preds = [0] * len(planes)
        my, mx = divmod(m, mcus_x)
        for ci, ((h, v), (dc_t, ac_t)) in enumerate(zip(samp, huffs)):
            bpl = mcus_x * h  # blocks per line in this component
            for v_i in range(v):
                for h_i in range(h):
                    bi = (my * v + v_i) * bpl + (mx * h + h_i)
                    preds[ci] = _encode_block(
                        writer, comp_blocks[ci][bi], preds[ci], dc_t, ac_t)
    writer.flush()
    out_chunks.append(bytes(writer.out))
    scan = b"".join(out_chunks)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    parts = [b"\xff\xd8",
             seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")]
    parts.append(seg(0xDB, bytes([0x00]) + bytes(ql[_ZIGZAG].astype(np.uint8))))
    if not gray:
        parts.append(seg(0xDB, bytes([0x01]) + bytes(qc[_ZIGZAG].astype(np.uint8))))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", H, W) + bytes([ncomp])
    for i, (h, v) in enumerate(samp):
        sof += bytes([i + 1, (h << 4) | v, 0 if i == 0 else 1])
    parts.append(seg(0xC0, sof))
    for tc_th, (bits, vals) in ((0x00, _HUFF_DC_LUMA), (0x10, _HUFF_AC_LUMA)):
        parts.append(seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals)))
    if not gray:
        for tc_th, (bits, vals) in ((0x01, _HUFF_DC_CHROMA), (0x11, _HUFF_AC_CHROMA)):
            parts.append(seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals)))
    if restart_interval:
        parts.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    parts.append(seg(0xDA, sos))
    parts.append(scan)
    parts.append(b"\xff\xd9")
    return b"".join(parts)
