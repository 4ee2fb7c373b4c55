"""Two-clip compare utility — the debug/inspection path.

Reference parity: CompareImages (perceptual.go:474-498) + the compare-mode
CLI (compareImagesCLI main.go:2010-2102): hash both inputs with all three
algorithms, report Hamming distance, similarity % = 100 − dist/64·100, and
an is-similar verdict per the per-algo threshold table {dhash:10, ahash:12,
phash:8} (main.go:2042).

Also the per-row-invariant harness (BASELINE.json input_hint): decoded-PCM
SNR and transcript equality between two rows.
"""

from __future__ import annotations

from file_deduplicator_spark.config import BASE_THRESHOLDS
from file_deduplicator_spark.functions.audio import (
    SIG_FUNCS,
    hamming64,
    snr_db,
    wav_decode,
)


def compare_clips(bytes_a: bytes, bytes_b: bytes, transcript_a: str = "",
                  transcript_b: str = "") -> dict:
    """Compare two audio payloads across all signature algorithms."""
    pcm_a, sr_a = wav_decode(bytes_a)
    pcm_b, sr_b = wav_decode(bytes_b)
    out = {
        "sr_a": sr_a,
        "sr_b": sr_b,
        "n_samples_a": int(pcm_a.size),
        "n_samples_b": int(pcm_b.size),
        "snr_db": snr_db(pcm_a, pcm_b),
        "transcript_equal": transcript_a == transcript_b,
        "algos": {},
    }
    for algo, fn in SIG_FUNCS.items():
        sig_a, sig_b = fn(pcm_a), fn(pcm_b)
        dist = hamming64(sig_a, sig_b)
        threshold = BASE_THRESHOLDS[algo]
        out["algos"][algo] = {
            "sig_a": sig_a,
            "sig_b": sig_b,
            "distance": dist,
            "similarity_pct": 100.0 - dist / 64.0 * 100.0,
            "threshold": threshold,
            "is_similar": dist <= threshold,
        }
    return out
