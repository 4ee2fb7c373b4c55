"""probe_media: container/codec metadata for opaque binary columns.

Header-only probes across every container the engine knows (WAV family,
AIFF, FLAC, mp4, Ogg, images); gated codecs report decodable=false
instead of raising; junk yields ok=false rows."""

from __future__ import annotations

import numpy as np
import pytest

from file_deduplicator_spark.functions import ogg as OG
from file_deduplicator_spark.functions.audio import ulaw_encode_bytes, wav_encode
from file_deduplicator_spark.functions.flac import flac_encode
from file_deduplicator_spark.functions.mp4 import mp4_encode_pcm
from file_deduplicator_spark.functions.pcm_codecs import (
    adpcm_encode_bytes,
    aiff_encode,
    alaw_encode_bytes,
)
from file_deduplicator_spark.functions.png_gif import gif_encode, png_encode
from file_deduplicator_spark.operators.multimodal import _probe_one, probe_media


def _pcm(n=16000, sr=16000):
    t = np.arange(n) / sr
    return np.sin(2 * np.pi * 440 * t) * 0.5


def _img(w=20, h=12):
    rng = np.random.default_rng(5)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _ogg_opus(n_samples_48k=48000, sr=16000, pre_skip=312):
    pages = [OG.ogg_mux_page(OG.opus_head(sr, 1, pre_skip), granule=0,
                             seqno=0, header_type=2)]
    pages.append(OG.ogg_mux_page(b"OpusTags\x00\x00\x00\x00\x00\x00\x00\x00",
                                 granule=0, seqno=1))
    pages.append(OG.ogg_mux_page(b"\x00" * 100,
                                 granule=pre_skip + n_samples_48k, seqno=2,
                                 header_type=4))
    return b"".join(pages)


def test_probe_one_wav_family():
    pcm = _pcm()
    p = _probe_one(wav_encode(pcm, 16000))
    assert (p["container"], p["codec"], p["kind"]) == ("wav", "pcm_s16le", "audio")
    assert p["sr_hz"] == 16000 and p["decodable"]
    assert abs(p["dur_ms"] - 1000) <= 2
    assert _probe_one(ulaw_encode_bytes(pcm, 16000))["codec"] == "pcm_mulaw"
    assert _probe_one(alaw_encode_bytes(pcm, 16000))["codec"] == "pcm_alaw"
    pa = _probe_one(adpcm_encode_bytes(pcm, 16000))
    assert pa["codec"] == "adpcm_ima" and pa["decodable"]


def test_probe_one_aiff_flac_mp4():
    pcm = _pcm()
    s16 = np.round(pcm * 32767).astype(np.int16)
    p = _probe_one(aiff_encode(pcm, 16000))
    assert (p["container"], p["codec"]) == ("aiff", "pcm_s16be")
    assert p["decodable"] and abs(p["dur_ms"] - 1000) <= 2
    p = _probe_one(flac_encode(s16, 16000))
    assert (p["container"], p["codec"]) == ("flac", "flac")
    assert p["decodable"] and abs(p["dur_ms"] - 1000) <= 2
    p = _probe_one(mp4_encode_pcm(s16, 16000))
    assert p["container"] == "mp4" and p["kind"] == "audio" and p["decodable"]
    assert abs(p["dur_ms"] - 1000) <= 2


def test_probe_one_ogg_opus_gated_with_duration():
    p = _probe_one(_ogg_opus())
    assert (p["container"], p["codec"], p["kind"]) == ("ogg", "opus", "audio")
    assert p["sr_hz"] == 16000 and p["channels"] == 1
    assert p["decodable"] is False  # honest gate: no codec libs
    assert abs(p["dur_ms"] - 1000) <= 2  # 48000 granule samples @48k


def test_probe_one_images():
    img = _img()
    p = _probe_one(png_encode(img))
    assert (p["container"], p["width"], p["height"]) == ("png", 20, 12)
    p = _probe_one(gif_encode(img))
    assert (p["container"], p["width"], p["height"]) == ("gif", 20, 12)
    try:
        from file_deduplicator_spark.functions.jpeg import jpeg_encode

        p = _probe_one(jpeg_encode(img))
        assert (p["container"], p["width"], p["height"]) == ("jpeg", 20, 12)
    except ImportError:
        pass


def test_probe_media_operator_end_to_end(spark):
    pcm = _pcm()
    rows = [
        ("w", bytearray(wav_encode(pcm, 16000))),
        ("o", bytearray(_ogg_opus())),
        ("g", bytearray(gif_encode(_img()))),
        ("junk", bytearray(b"\x00\x01\x02 not a container")),
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    got = {r["media_id"]: r.asDict() for r in probe_media(df).collect()}
    assert got["w"]["ok"] and got["w"]["codec"] == "pcm_s16le"
    assert got["o"]["ok"] and got["o"]["codec"] == "opus" and not got["o"]["decodable"]
    assert got["g"]["ok"] and got["g"]["kind"] == "image"
    assert got["junk"]["ok"] is False


def test_ogg_page_walk_rejects_garbage():
    with pytest.raises(ValueError):
        OG.ogg_probe(b"OggS" + b"\x01" + b"\x00" * 40)  # bad version
    with pytest.raises(ValueError):
        OG.ogg_probe(b"\x00" * 10)


def test_ogg_decode_is_gated():
    with pytest.raises(NotImplementedError):
        OG.ogg_decode(_ogg_opus())


def test_probe_one_ogg_flac_id_packet():
    import struct

    pcm = np.round(_pcm() * 32767).astype(np.int16)
    native = flac_encode(pcm, 16000)
    # native = b"fLaC" + STREAMINFO block + ... ; the mapping packet wraps
    # the marker + first metadata block
    si_block = native[4:4 + 4 + 34]
    idpkt = (b"\x7fFLAC" + bytes([1, 0]) + struct.pack(">H", 0)
             + b"fLaC" + si_block)
    buf = (OG.ogg_mux_page(idpkt, granule=0, seqno=0, header_type=2)
           + OG.ogg_mux_page(b"\x00" * 10, granule=16000, seqno=1,
                             header_type=4))
    p = OG.ogg_probe(buf)
    assert p["codec"] == "flac" and p["sr_hz"] == 16000 and p["channels"] == 1
    assert abs(p["dur_ms"] - 1000) <= 2


def test_probe_one_ogg_vorbis_id_packet():
    import struct

    idpkt = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
             + struct.pack("<I", 44100) + struct.pack("<iii", 0, 128000, 0)
             + bytes([0xB8, 0x01]))
    buf = (OG.ogg_mux_page(idpkt, granule=0, seqno=0, header_type=2)
           + OG.ogg_mux_page(b"\x00" * 8, granule=44100 * 2, seqno=1,
                             header_type=4))
    p = OG.ogg_probe(buf)
    assert p["codec"] == "vorbis" and p["sr_hz"] == 44100 and p["channels"] == 2
    assert abs(p["dur_ms"] - 2000) <= 2


def test_probe_one_webp_vp8l_dims():
    from file_deduplicator_spark.functions.webp import webp_encode_lossless

    p = _probe_one(webp_encode_lossless(_img(33, 17)))
    assert (p["container"], p["width"], p["height"]) == ("webp_vp8l", 33, 17)
    assert p["decodable"]


def test_probe_stereo_wav_reports_metadata_not_ok_false():
    import struct

    data = b"\x00" * 64000  # 16000 stereo s16 frames
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 2, 16000, 64000, 4, 16,
        b"data", len(data),
    )
    p = _probe_one(hdr + data)
    assert p["container"] == "wav" and p["channels"] == 2
    assert p["decodable"] is False  # decode paths are mono-only
    assert abs(p["dur_ms"] - 1000) <= 2  # frames, not samples


def test_probe_vp8x_wrapped_lossless_webp():
    import struct

    from file_deduplicator_spark.functions.webp import webp_encode_lossless

    direct = webp_encode_lossless(_img(20, 12))
    vp8l_chunk = direct[12:]  # "VP8L" + size + payload
    vp8x = (b"VP8X" + struct.pack("<I", 10) + b"\x00\x00\x00\x00"
            + (19).to_bytes(3, "little") + (11).to_bytes(3, "little"))
    body = b"WEBP" + vp8x + vp8l_chunk
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    p = _probe_one(buf)
    assert p["container"] == "webp_vp8l" and p["decodable"]
    assert (p["width"], p["height"]) == (20, 12)


def test_probe_flac_unknown_length_yields_null_duration():
    pcm = np.round(_pcm() * 32767).astype(np.int16)
    buf = bytearray(flac_encode(pcm, 16000))
    # zero the 36-bit total_samples field (body bits 108..143; the body
    # starts at byte 8 = 4 fLaC + 4 block header)
    buf[8 + 13] &= 0xF0
    buf[8 + 14:8 + 18] = b"\x00\x00\x00\x00"
    p = _probe_one(bytes(buf))
    assert p["container"] == "flac"
    assert p["dur_ms"] is None


def test_probe_jpeg_with_fill_bytes():
    from file_deduplicator_spark.functions.jpeg import jpeg_encode

    raw = jpeg_encode(_img())
    # inject legal 0xFF fill bytes after SOI
    padded = raw[:2] + b"\xff\xff\xff" + raw[2:]
    p = _probe_one(padded)
    assert (p["container"], p["width"], p["height"]) == ("jpeg", 20, 12)
