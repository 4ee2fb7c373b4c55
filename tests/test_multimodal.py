"""Multimodal plumbing tests: schema, batch shape, per-kind dispatch, error
fallback, stub gating."""

import numpy as np
import pytest

from file_deduplicator_spark.datagen import _synth_pcm
from file_deduplicator_spark.functions.audio import wav_encode
from file_deduplicator_spark.operators.multimodal import (
    decode_image_stub,
    extract_media_features,
    resize_gray,
    sample_video_frames_stub,
)


def test_stub_gating():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG....")
    with pytest.raises(NotImplementedError):
        sample_video_frames_stub(b"....ftypmp4")
    img = decode_image_stub(b"\x89PNG....", allow_fake=True)
    assert img.ndim == 3 and img.shape[2] == 3
    # deterministic
    assert (img == decode_image_stub(b"\x89PNG....", allow_fake=True)).all()


def test_resize_gray():
    img = np.zeros((32, 48, 3), dtype=np.uint8)
    img[:, 24:, :] = 255
    g = resize_gray(img, 8, 8)
    assert g.shape == (8, 8)
    assert g[:, :4].max() == 0 and g[:, 4:].min() > 200


def test_extract_media_features(spark):
    rng = np.random.RandomState(5)
    wav = wav_encode(_synth_pcm(rng, 8000, 300), 8000)
    rows = [
        ("a1", "audio", bytearray(wav)),
        ("i1", "image", bytearray(b"\x89PNGfake")),
        ("v1", "video", bytearray(b"fakevideo")),
        ("bad", "audio", bytearray(b"notawav")),
        ("unk", "blob", bytearray(b"??")),
    ]
    df = spark.createDataFrame(rows, "media_id string, kind string, bytes binary")
    out = extract_media_features(df, allow_fake=True).toPandas().set_index("media_id")

    assert out.loc["a1", "ok"] and len(out.loc["a1", "features"]) == 64
    assert out.loc["a1", "n_samples"] == 2400
    assert out.loc["i1", "ok"] and out.loc["i1", "width"] > 0
    assert out.loc["v1", "ok"] and out.loc["v1", "n_frames"] == 4
    assert not out.loc["bad", "ok"]          # decode failure → ok=false row
    assert not out.loc["unk", "ok"]          # unknown kind → ok=false row


def test_stubbed_codec_without_fake_degrades_not_fails(spark):
    df = spark.createDataFrame(
        [("i1", "image", bytearray(b"img"))], "media_id string, kind string, bytes binary"
    )
    out = extract_media_features(df, allow_fake=False).toPandas()
    assert len(out) == 1 and not out.ok.iloc[0]
