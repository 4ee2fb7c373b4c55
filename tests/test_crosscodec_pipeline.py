"""One recording, seven codings → ONE cluster through the full pipeline.

The north-star table carries a ``codec`` column; the engine claim is that
transcoded copies of the same clip dedup regardless of coding. Signature-
level identity/closeness is pinned per codec in test_flac.py /
test_pcm_codecs.py; this test pins the END-TO-END behavior: a WAV clip and
its µ-law, A-law, IMA-ADPCM, MS-ADPCM, FLAC and AIFF transcodes all receive the same
cluster_id from ``dedup_pipeline``, while unrelated clips stay apart.
"""

from __future__ import annotations

import numpy as np

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.functions.audio import ulaw_encode_bytes, wav_encode
from file_deduplicator_spark.functions.flac import flac_encode
from file_deduplicator_spark.functions.pcm_codecs import (
    adpcm_encode_bytes,
    adpcm_ms_encode_bytes,
    aiff_encode,
    alaw_encode_bytes,
)
from file_deduplicator_spark.plans.pipeline import dedup_pipeline

SR = 16000


def _pcm(seed: int, n: int = 24000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = (np.sin(2 * np.pi * (180 + 31 * seed) * t)
         + 0.3 * np.sin(2 * np.pi * (700 + 13 * seed) * t)
         + rng.normal(0, 0.04, n))
    return (x / np.max(np.abs(x)) * 0.7)


def _variants(cid: str, pcm):
    s16 = np.round(pcm * 32767.0).astype(np.int16)
    return [
        (f"{cid}_wav", wav_encode(pcm, SR), "pcm_s16le"),
        (f"{cid}_ulaw", ulaw_encode_bytes(pcm, SR), "pcm_mulaw"),
        (f"{cid}_alaw", alaw_encode_bytes(pcm, SR), "pcm_alaw"),
        (f"{cid}_adpcm", adpcm_encode_bytes(pcm, SR), "adpcm_ima_wav"),
        (f"{cid}_msadpcm", adpcm_ms_encode_bytes(pcm, SR), "adpcm_ms"),
        (f"{cid}_flac", flac_encode(s16, SR), "flac"),
        (f"{cid}_aiff", aiff_encode(pcm, SR), "aiff"),
    ]


def test_seven_codings_one_cluster(spark):
    rows = []
    for seed, cid in [(3, "c3"), (8, "c8")]:
        pcm = _pcm(seed)
        for vid, buf, codec in _variants(cid, pcm):
            rows.append((vid, bytearray(buf), SR, 1500, codec, f"transcript {cid}"))
    ddl = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
           "codec string, transcript string")
    clips = spark.createDataFrame(rows, ddl)

    result = dedup_pipeline(clips, DedupConfig())
    pdf = result["clustered"].select("clip_id", "cluster_id").toPandas()
    cmap = dict(zip(pdf.clip_id, pdf.cluster_id))

    for cid in ("c3", "c8"):
        ids = [k for k in cmap if k.startswith(cid)]
        assert len(ids) == 7, f"pipeline dropped rows for {cid}: {sorted(cmap)}"
        clusters = {cmap[k] for k in ids}
        assert len(clusters) == 1, f"{cid} split across clusters: " + str(
            {k: cmap[k] for k in ids}
        )
    # the two source recordings must NOT merge
    assert cmap["c3_wav"] != cmap["c8_wav"]
