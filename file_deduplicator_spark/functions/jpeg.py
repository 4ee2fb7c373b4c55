"""Dependency-free baseline JPEG codec (pure numpy + stdlib).

Extends decode parity with the reference, whose image registry is Go's
stdlib decoders — ``image/jpeg`` is registered first (perceptual.go:4-14)
and .jpg/.jpeg lead the ``isImageFile`` extension gate
(perceptual.go:434-442). With PNG/GIF (functions/png_gif.py) and this
module, only WebP remains codec-library-gated.

Scope (ITU-T T.81 baseline + progressive):
* SOI / APPn / COM / DQT (8- and 16-bit precision) / DHT / DRI /
  SOF0+SOF1+SOF2 / SOS / EOI marker walk;
* sequential DCT, 8-bit samples, 1-component grayscale or 3-component
  YCbCr with any integer subsampling ratio (4:4:4, 4:2:2, 4:2:0, ...);
* progressive DCT (Annex G): spectral selection, successive approximation,
  DC/AC refinement scans, EOBn runs, interleaved DC + non-interleaved AC
  data-unit iteration;
* restart markers (byte-aligned RST0-7, predictors/EOB runs reset per
  interval);
* lossless/hierarchical processes and arithmetic coding raise ValueError —
  callers map that to a null signature / ok=false row exactly like other
  unsupported payloads (main.go:666-674).

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
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "coef", "gcols", "grows",
                 "bw", "bh")

    def __init__(self, cid, h, v, tq):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        # (grows*gcols, 64) int32, zigzag order — allocated at first SOS so
        # progressive scans accumulate into one array (T.81 G.2)
        self.coef: np.ndarray | None = None


def _ensure_grids(comps: list[_Component], H: int, W: int):
    """Allocate each component's MCU-padded coefficient grid; returns the
    MCU grid dims. Also fixes the non-interleaved data-unit dims (A.2.2:
    ceil of the component's own raster, NOT padded to the MCU grid)."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    for c in comps:
        if c.coef is None:
            c.gcols = mcus_x * c.h
            c.grows = mcus_y * c.v
            cw = -(-W * c.h // hmax)
            ch = -(-H * c.v // vmax)
            c.bw = -(-cw // 8)
            c.bh = -(-ch // 8)
            c.coef = np.zeros((c.grows * c.gcols, 64), dtype=np.int32)
    return mcus_x, mcus_y


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
    prog = False
    nscans = 0
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
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            prog = marker == 0xC2
            prec, H, W, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG sample precision {prec}")
            comps = [
                _Component(seg[6 + 3 * i], seg[7 + 3 * i] >> 4,
                           seg[7 + 3 * i] & 15, seg[8 + 3 * i])
                for i in range(nc)
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG coding process (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            mcus_x, mcus_y = _ensure_grids(comps, H, W)
            ns = seg[0]
            order = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c.cid == cid)
                comp.td, comp.ta = tt >> 4, tt & 15
                order.append(comp)
            ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if not prog:
                ss, se, ah, al = 0, 63, 0, 0  # baseline ignores the fields
            elif not (ss <= se <= 63 and al <= 13) or (ss == 0) != (se == 0):
                # DC scans are exactly Ss=Se=0; AC bands live in 1..63 (G.1)
                raise ValueError(
                    f"invalid progressive spectral selection {ss}..{se}")
            intervals, pos = _split_scan(buf, pos + seglen)
            _decode_scan(order, intervals, dc_tables, ac_tables, dri,
                         mcus_x, mcus_y, prog, ss, se, ah, al)
            nscans += 1
            continue  # pos already past the entropy data
        # APPn / COM / others: skipped
        pos += seglen
    if not nscans:
        raise ValueError("JPEG contains no decoded scan")
    return _assemble(comps, qt, H, W)


class _ScanState:
    __slots__ = ("reader", "interval_i", "intervals", "eobrun", "preds")

    def __init__(self, intervals, order):
        self.intervals = intervals
        self.interval_i = 0
        self.reader = _BitReader(intervals[0])
        self.eobrun = 0
        self.preds = {c.cid: 0 for c in order}

    def restart(self, unit: int, dri: int) -> None:
        if dri and unit and unit % dri == 0:
            self.interval_i += 1
            if self.interval_i >= len(self.intervals):
                raise ValueError("JPEG truncated: missing restart interval")
            self.reader = _BitReader(self.intervals[self.interval_i])
            self.eobrun = 0
            self.preds = {cid: 0 for cid in self.preds}


def _decode_scan(order, intervals, dc_tables, ac_tables, dri,
                 mcus_x, mcus_y, prog, ss, se, ah, al):
    """One entropy-coded scan: baseline full-band, or any progressive
    DC/AC first/refinement scan (T.81 G.2). Interleaved iteration when the
    scan has several components, data-unit raster otherwise (A.2)."""
    for c in order:
        if ss == 0 and ah == 0 and c.td not in dc_tables:
            raise ValueError(f"JPEG scan references undefined DC table {c.td}")
        if se > 0 and c.ta not in ac_tables:
            raise ValueError(f"JPEG scan references undefined AC table {c.ta}")
    if prog and ss > 0 and len(order) != 1:
        raise ValueError("progressive AC scan must be single-component")
    st = _ScanState(intervals, order)
    if len(order) > 1:
        for m in range(mcus_x * mcus_y):
            st.restart(m, dri)
            my, mx = divmod(m, mcus_x)
            for c in order:
                for v_i in range(c.v):
                    for h_i in range(c.h):
                        bi = (my * c.v + v_i) * c.gcols + (mx * c.h + h_i)
                        _decode_unit(st, c, bi, dc_tables, ac_tables,
                                     prog, ss, se, ah, al)
    else:
        c = order[0]
        for u in range(c.bh * c.bw):
            st.restart(u, dri)
            br, bc = divmod(u, c.bw)
            _decode_unit(st, c, br * c.gcols + bc, dc_tables, ac_tables,
                         prog, ss, se, ah, al)


def _decode_unit(st, c, bi, dc_tables, ac_tables, prog, ss, se, ah, al):
    coef = c.coef[bi]
    r = st.reader
    if prog and ah:  # refinement scans
        if ss == 0:
            if r.read(1):  # one DC magnitude bit per unit (G.2.1)
                coef[0] |= 1 << al
        else:
            st.eobrun = _refine_ac(r, coef, ac_tables[c.ta], ss, se, al,
                                   st.eobrun)
        return
    if ss == 0:
        s = _huff_decode(r, dc_tables[c.td])
        if s > 15:  # corrupt DHT: DC category is <= 11 by spec
            raise ValueError(f"invalid JPEG DC category {s}")
        diff = _extend(r.read(s), s) if s else 0
        st.preds[c.cid] += diff
        coef[0] = st.preds[c.cid] << al
        if prog:
            return  # progressive DC scans carry no AC
        se_band = 63
    else:
        se_band = se
    st.eobrun = _first_ac(r, coef, ac_tables[c.ta], max(ss, 1), se_band, al,
                          st.eobrun)


def _first_ac(r, coef, table, ss, se, al, eobrun):
    """Band decode for baseline AC and progressive AC first scans
    (T.81 F.2.2.2 / G.2.2): run-length symbols, ZRL, EOBn runs."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, table)
        rr, s = rs >> 4, rs & 15
        if s == 0:
            if rr != 15:
                eobrun = (1 << rr) - 1  # this unit counts as one
                if rr:
                    eobrun += r.read(rr)
                return eobrun
            k += 16  # ZRL
        else:
            k += rr
            if k > se:
                raise ValueError("JPEG AC run past band end")
            coef[k] = _extend(r.read(s), s) << al
            k += 1
    return 0


def _refine_ac(r, coef, table, ss, se, al, eobrun):
    """Progressive AC refinement (T.81 G.2.2, the libjpeg-documented
    algorithm): one correction bit per already-nonzero coefficient, new
    coefficients arrive as ±(1<<al), EOBn covers whole corrected units."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, table)
            rr, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if rr != 15:
                    eobrun = 1 << rr
                    if rr:
                        eobrun += r.read(rr)
                    break
            else:
                if s != 1:
                    raise ValueError("invalid JPEG refinement magnitude")
                val = p1 if r.read(1) else m1
            # advance over rr zero-history coefficients, reading one
            # correction bit at every nonzero-history coefficient passed
            while k <= se:
                if coef[k] != 0:
                    if r.read(1) and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the rest of this unit
            if coef[k] != 0:
                if r.read(1) and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _assemble(comps, qt, H, W) -> np.ndarray:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        if c.tq not in qt:
            raise ValueError(f"JPEG references missing quant table {c.tq}")
        zz = c.coef * qt[c.tq][None, :]  # dequantize (zigzag order)
        blocks = np.zeros((len(zz), 64), dtype=np.float64)
        blocks[:, _ZIGZAG] = zz
        blocks = blocks.reshape(-1, 8, 8)
        # batched 2-D IDCT: C.T @ X @ C per block
        spatial = np.einsum("ki,mkl,lj->mij", _DCT, blocks, _DCT) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
        plane = (
            spatial.reshape(c.grows, c.gcols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.grows * 8, c.gcols * 8)
        )
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


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _prep(img: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: color transform, subsampling, FDCT+quant.
    Returns (gray, H, W, samp, comp_blocks, ql, qc, mcus_x, mcus_y) with
    comp_blocks[i] = (n_grid_blocks, 64) zigzag coefficients in raster
    order over the MCU-padded grid."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    H, W = img.shape[:2]
    ql, qc = _quality_tables(quality)
    if gray:
        samp = [(1, 1)]
        planes = [img]
        quants = [ql]
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

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    # per-component zigzag blocks, raster order, padded to the MCU grid
    comp_blocks = []
    for plane, (h, v), q in zip(planes, samp, quants):
        ph, pw = mcus_y * v * 8, mcus_x * h * 8
        comp_blocks.append(_fdct_quant(_pad_to(plane, ph, pw), q))
    return gray, H, W, samp, comp_blocks, ql, qc, mcus_x, mcus_y


def _frame_headers(gray, H, W, samp, ql, qc, sof_marker: int) -> list[bytes]:
    parts = [b"\xff\xd8",
             _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")]
    parts.append(_seg(0xDB, bytes([0x00]) + bytes(ql[_ZIGZAG].astype(np.uint8))))
    if not gray:
        parts.append(_seg(0xDB, bytes([0x01]) + bytes(qc[_ZIGZAG].astype(np.uint8))))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", H, W) + bytes([ncomp])
    for i, (h, v) in enumerate(samp):
        sof += bytes([i + 1, (h << 4) | v, 0 if i == 0 else 1])
    parts.append(_seg(sof_marker, sof))
    return parts


def jpeg_encode(img: np.ndarray, quality: int = 90, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline JPEG writer: 4:4:4 (default) or 4:2:0 (``subsample``),
    grayscale for 2-D input, optional DRI/RSTn emission."""
    gray, H, W, samp, comp_blocks, ql, qc, mcus_x, mcus_y = _prep(
        img, quality, subsample)
    dc_l, ac_l = _encode_table(*_HUFF_DC_LUMA), _encode_table(*_HUFF_AC_LUMA)
    dc_c, ac_c = _encode_table(*_HUFF_DC_CHROMA), _encode_table(*_HUFF_AC_CHROMA)
    huffs = [(dc_l, ac_l)] if gray else [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]

    writer = _BitWriter()
    preds = [0] * len(comp_blocks)
    out_chunks: list[bytes] = []
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            out_chunks.append(bytes(writer.out))
            out_chunks.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) % 8
            writer = _BitWriter()
            preds = [0] * len(comp_blocks)
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

    parts = _frame_headers(gray, H, W, samp, ql, qc, 0xC0)
    for tc_th, (bits, vals) in ((0x00, _HUFF_DC_LUMA), (0x10, _HUFF_AC_LUMA)):
        parts.append(_seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals)))
    if not gray:
        for tc_th, (bits, vals) in ((0x01, _HUFF_DC_CHROMA), (0x11, _HUFF_AC_CHROMA)):
            parts.append(_seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals)))
    if restart_interval:
        parts.append(_seg(0xDD, struct.pack(">H", restart_interval)))
    ncomp = 1 if gray else 3
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    parts.append(_seg(0xDA, sos))
    parts.append(scan)
    parts.append(b"\xff\xd9")
    return b"".join(parts)


# ---------------------------------------------------------------------------
# Progressive encoder (test-suite support, T.81 Annex G forward)
# ---------------------------------------------------------------------------

# Near-flat AC table: every symbol codable (the Annex K baseline AC tables
# lack the EOBn symbols 0x10..0xE0 that progressive scans emit; libjpeg
# solves this with optimized per-scan tables — a flat table keeps the writer
# tiny at the cost of compression, which tests don't care about). DHT counts
# are single bytes, so 256 symbols split as 254 nine-bit + 2 ten-bit codes.
_HUFF_AC_FLAT9 = ([0] * 8 + [254, 2] + [0] * 6, list(range(256)))


def _mag_shift(v: int, al: int) -> int:
    """AC point transform (G.1.2.2): shift the MAGNITUDE, keep the sign."""
    return -((-v) >> al) if v < 0 else v >> al


class _EobState:
    """Pending EOBn run + the correction bits attached to it (refinement)."""

    def __init__(self, w: _BitWriter, ac_t):
        self.w, self.ac_t, self.run, self.bits = w, ac_t, 0, []

    def flush(self) -> None:
        if self.run:
            nbits = self.run.bit_length() - 1
            code, ln = self.ac_t[nbits << 4]
            self.w.write(code, ln)
            if nbits:
                self.w.write(self.run & ((1 << nbits) - 1), nbits)
            self.run = 0
        for b in self.bits:
            self.w.write(b, 1)
        self.bits = []


def _enc_ac_first(w, zz, ss, se, al, ac_t, eob: _EobState) -> None:
    t = [_mag_shift(int(zz[k]), al) for k in range(ss, se + 1)]
    if not any(t):
        eob.run += 1
        if eob.run == 0x7FFF:
            eob.flush()
        return
    eob.flush()
    r = 0
    last_nz = max(i for i, v in enumerate(t) if v)
    for i, v in enumerate(t[:last_nz + 1]):
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac_t[0xF0]
            w.write(code, ln)
            r -= 16
        s = abs(v).bit_length()
        code, ln = ac_t[(r << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        r = 0
    if last_nz < len(t) - 1:
        eob.run += 1  # trailing zeros end in (a run of) EOB


def _enc_ac_refine(w, zz, ss, se, al, ac_t, eob: _EobState) -> None:
    """libjpeg's encode_mcu_AC_refine shape: correction bits buffer behind
    the next symbol (or attach to the pending EOB run)."""
    t = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eobpos = max((i for i, v in enumerate(t) if v == 1), default=-1)
    r = 0
    br: list[int] = []
    for i, v in enumerate(t):
        if v == 0:
            r += 1
            continue
        while r > 15 and i <= eobpos:
            eob.flush()
            code, ln = ac_t[0xF0]
            w.write(code, ln)
            r -= 16
            for b in br:
                w.write(b, 1)
            br = []
        if v > 1:  # history-nonzero: defer its correction bit
            br.append(v & 1)
            continue
        eob.flush()
        code, ln = ac_t[(r << 4) | 1]
        w.write(code, ln)
        w.write(1 if zz[ss + i] >= 0 else 0, 1)
        for b in br:
            w.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        eob.run += 1
        eob.bits.extend(br)
        if eob.run == 0x7FFF:
            eob.flush()


def jpeg_encode_progressive(img: np.ndarray, quality: int = 90,
                            subsample: bool = False) -> bytes:
    """Progressive writer exercising every Annex G decode path: DC first
    with successive approximation (Al=1) → per-component AC first scans
    (Al=1, EOBn runs) → DC refinement (Ah=1) → per-component AC refinement.
    Quantized coefficients are identical to ``jpeg_encode``'s, so decoding
    both must yield bit-identical pixels."""
    gray, H, W, samp, comp_blocks, ql, qc, mcus_x, mcus_y = _prep(
        img, quality, subsample)
    dc_l = _encode_table(*_HUFF_DC_LUMA)
    dc_c = _encode_table(*_HUFF_DC_CHROMA)
    ac_f = _encode_table(*_HUFF_AC_FLAT9)
    dc_tabs = [dc_l] if gray else [dc_l, dc_c, dc_c]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)

    def dc_scan(ah: int, al: int) -> bytes:
        w = _BitWriter()
        preds = [0] * len(comp_blocks)
        for m in range(mcus_x * mcus_y):
            my, mx = divmod(m, mcus_x)
            for ci, (h, v) in enumerate(samp):
                for v_i in range(v):
                    for h_i in range(h):
                        bi = (my * v + v_i) * (mcus_x * h) + (mx * h + h_i)
                        dc = int(comp_blocks[ci][bi][0])
                        if ah:  # refinement: one magnitude bit
                            w.write((dc >> al) & 1, 1)
                            continue
                        tdc = dc >> al  # DC point transform is arithmetic
                        diff = tdc - preds[ci]
                        preds[ci] = tdc
                        s = int(diff != 0 and abs(diff).bit_length())
                        code, ln = dc_tabs[ci][s]
                        w.write(code, ln)
                        if s:
                            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        w.flush()
        return bytes(w.out)

    def ac_scan(ci: int, ah: int, al: int) -> bytes:
        h, v = samp[ci]
        cw = -(-W * h // hmax)  # component raster (A.1.1)
        ch = -(-H * v // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)  # non-interleaved data units (A.2.2)
        w = _BitWriter()
        eob = _EobState(w, ac_f)
        enc = _enc_ac_refine if ah else _enc_ac_first
        for u in range(bh * bw):
            br_, bc_ = divmod(u, bw)
            zz = comp_blocks[ci][br_ * (mcus_x * h) + bc_]
            enc(w, zz, 1, 63, al, ac_f, eob)
        eob.flush()
        w.flush()
        return bytes(w.out)

    ncomp = 1 if gray else 3
    parts = _frame_headers(gray, H, W, samp, ql, qc, 0xC2)
    for tc_th, (bits, vals) in ((0x00, _HUFF_DC_LUMA), (0x01, _HUFF_DC_CHROMA),
                                (0x10, _HUFF_AC_FLAT9)):
        if gray and tc_th == 0x01:
            continue
        parts.append(_seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals)))

    def sos(comp_ids, tds, tas, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid, td, ta in zip(comp_ids, tds, tas):
            body += bytes([cid, (td << 4) | ta])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    all_ids = list(range(1, ncomp + 1))
    all_tds = [0] + [1] * (ncomp - 1)
    # scan script: DC first (Al=1) → AC first per comp (Al=1) →
    # DC refine → AC refine per comp
    parts.append(sos(all_ids, all_tds, [0] * ncomp, 0, 0, 0, 1))
    parts.append(dc_scan(0, 1))
    for ci in range(ncomp):
        parts.append(sos([ci + 1], [0], [0], 1, 63, 0, 1))
        parts.append(ac_scan(ci, 0, 1))
    parts.append(sos(all_ids, all_tds, [0] * ncomp, 0, 0, 1, 0))
    parts.append(dc_scan(1, 0))
    for ci in range(ncomp):
        parts.append(sos([ci + 1], [0], [0], 1, 63, 1, 0))
        parts.append(ac_scan(ci, 1, 0))
    parts.append(b"\xff\xd9")
    return b"".join(parts)
