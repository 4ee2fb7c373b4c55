"""Deterministic synthetic clips table generator (FIXTURES.md).

Produces the BASELINE.json ``input_hint`` schema exactly:
``clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32, codec:string,
transcript:string`` plus fixture-only columns ``mtime:timestamp`` (keeper
criteria need it, ref main.go:981-998) and ``scenario:string`` (test tagging).

Everything is keyed off ``seed`` (default 42) — no wall clock, no external
data. Audio is seeded sine/noise mixtures rendered to RIFF/WAV s16le (or the
µ-law transcode variant). Planted scenarios mirror the reference's unit-test
semantics — see the table in FIXTURES.md §2.

Also emits the oracle tables:
* ``expected_pairs(clip_id_a, clip_id_b, kind)`` — every planted dup pair
  (recall ≥ 0.99 target measures against this);
* ``forbidden_pairs`` — near-miss pairs that must NOT be emitted (precision);
* ``keeper_cases`` — keeper-selection fixtures (ref main_test.go:1030-1156).
"""

from __future__ import annotations

import datetime as dt
import itertools
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from file_deduplicator_spark.functions.audio import (
    ulaw_decode,
    ulaw_encode_bytes,
    wav_decode,
    wav_encode,
)

_BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)

# Fixed 1k-word vocabulary, deterministically synthesized.
def _make_vocab(rng: np.random.RandomState, n: int = 1000) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out = []
    for _ in range(n):
        ln = rng.randint(3, 9)
        out.append("".join(letters[rng.randint(0, 26, size=ln)]))
    return out


_UNICODE_SNIPPETS = [
    "данные очень важны",
    "重复数据删除引擎测试",
    "محرك إزالة التكرار",
    "データ重複排除 テスト",
    "🎧 audio clip 🔁 duplicate 🧪 test",
]


def _synth_pcm(rng: np.random.RandomState, sr: int, dur_ms: int) -> np.ndarray:
    """Seeded sine/noise mixture with a RANDOM PIECEWISE energy envelope,
    peak ≈ 0.7 (headroom for +2 dB gain).

    The envelope (what the dhash/ahash/phash signatures measure) is drawn
    from a high-entropy distribution — independent clips must NOT land
    within Hamming 10 of each other, mirroring real corpora where distinct
    recordings have distinct energy contours. (An earlier low-entropy
    generator made every clip an AM-sine with the same macro-envelope; at
    200k rows that produced 1.2M spurious 'true' near-dup pairs.)
    """
    n = int(sr * dur_ms / 1000)
    if n == 0:
        return np.zeros(0)
    t = np.arange(n) / sr
    x = np.zeros(n)
    for _ in range(rng.randint(2, 6)):
        f = rng.uniform(60, min(3800, sr / 2 - 100))
        ph = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.05, 0.35)
        x += amp * np.sin(2 * np.pi * f * t + ph)
    x += rng.normal(0, rng.uniform(0.005, 0.05), size=n)
    # random piecewise-constant gain over 8-24 segments, smoothed — gives
    # each clip a unique energy contour (some segments near-silent)
    n_seg = rng.randint(8, 25)
    seg_gains = rng.uniform(0.05, 1.0, size=n_seg) ** rng.uniform(0.5, 2.0)
    env = np.repeat(seg_gains, int(np.ceil(n / n_seg)))[:n]
    k = max(1, n // 64)
    kernel = np.ones(k) / k
    env = np.convolve(env, kernel, mode="same")
    x *= env
    peak = np.max(np.abs(x)) or 1.0
    return x * (0.7 / peak)


@dataclass
class ClipsFixture:
    clips: pd.DataFrame
    expected_pairs: pd.DataFrame
    forbidden_pairs: pd.DataFrame
    keeper_cases: pd.DataFrame = field(default=None)


class _Builder:
    def __init__(self, seed: int):
        self.rng = np.random.RandomState(seed)
        self.vocab = _make_vocab(np.random.RandomState(seed + 1))
        self.rows: list[dict] = []
        self.pairs: list[tuple[str, str, str]] = []
        self.forbidden: list[tuple[str, str]] = []
        self._i = 0

    def _cid(self) -> str:
        cid = f"clip_{self._i:08d}"
        self._i += 1
        return cid

    def _transcript(self, n_words: int) -> str:
        idx = self.rng.randint(0, len(self.vocab), size=n_words)
        return " ".join(self.vocab[j] for j in idx)

    def add(self, pcm, sr, transcript, scenario, codec="wav", dur_ms=None) -> str:
        cid = self._cid()
        if codec == "wav":
            data = wav_encode(pcm, sr)
        elif codec == "ulaw":
            data = ulaw_encode_bytes(pcm, sr)
        else:
            raise ValueError(codec)
        self.rows.append(
            {
                "clip_id": cid,
                "bytes": data,
                "sr_hz": np.int32(sr),
                "dur_ms": np.int32(dur_ms if dur_ms is not None else round(len(pcm) / sr * 1000)),
                "codec": codec,
                "transcript": transcript,
                "mtime": _BASE_TS + dt.timedelta(minutes=7 * len(self.rows)),
                "scenario": scenario,
            }
        )
        return cid

    def add_raw(self, data: bytes, sr, dur_ms, transcript, scenario, codec="wav") -> str:
        cid = self._cid()
        self.rows.append(
            {
                "clip_id": cid,
                "bytes": data,
                "sr_hz": np.int32(sr),
                "dur_ms": np.int32(dur_ms),
                "codec": codec,
                "transcript": transcript,
                "mtime": _BASE_TS + dt.timedelta(minutes=7 * len(self.rows)),
                "scenario": scenario,
            }
        )
        return cid

    def pair(self, a: str, b: str, kind: str):
        self.pairs.append((min(a, b), max(a, b), kind))

    def group(self, ids: list[str], kind: str):
        for a, b in itertools.combinations(sorted(ids), 2):
            self.pairs.append((a, b, kind))


def generate_clips(n_clips: int = 100, seed: int = 42) -> ClipsFixture:
    """Generate ~n_clips rows with the FIXTURES.md §2 scenario mix."""
    b = _Builder(seed)
    rng = b.rng

    def n_of(frac, minimum=1):
        return max(minimum, int(n_clips * frac))

    def rand_sr():
        return int(rng.choice([8000, 16000]))

    def rand_dur():
        return int(rng.randint(200, 2001))

    # exact_dup_k3 — byte-identical triples (ref main_test.go:55-98)
    for _ in range(n_of(0.03)):
        sr, dur = rand_sr(), rand_dur()
        pcm = _synth_pcm(rng, sr, dur)
        txt = b._transcript(rng.randint(5, 30))
        data = wav_encode(pcm, sr)
        ids = [b.add_raw(data, sr, dur, txt, "exact_dup_k3") for _ in range(3)]
        b.group(ids, "exact")

    # exact_dup_k2 — byte-identical pairs (ref main_test.go:588-616)
    for _ in range(n_of(0.04)):
        sr, dur = rand_sr(), rand_dur()
        pcm = _synth_pcm(rng, sr, dur)
        txt = b._transcript(rng.randint(5, 30))
        data = wav_encode(pcm, sr)
        ids = [b.add_raw(data, sr, dur, txt, "exact_dup_k2") for _ in range(2)]
        b.group(ids, "exact")

    # unique singletons (ref main_test.go:562-586)
    for _ in range(n_of(0.40)):
        sr, dur = rand_sr(), rand_dur()
        b.add(_synth_pcm(rng, sr, dur), sr, b._transcript(rng.randint(5, 40)), "unique")

    # empty_audio — valid WAV, zero samples (ref main_test.go:618-647)
    for _ in range(2):
        sr = rand_sr()
        b.add(np.zeros(0), sr, "", "empty_audio", dur_ms=0)

    # near_dup_gain — same signal ±2 dB (analog perceptual_test.go:173-178)
    for _ in range(n_of(0.04)):
        sr, dur = rand_sr(), rand_dur()
        pcm = _synth_pcm(rng, sr, dur)
        txt = b._transcript(rng.randint(5, 30))
        g = 10 ** (rng.choice([-2.0, 2.0]) / 20.0)
        a = b.add(pcm, sr, txt, "near_dup_gain")
        c = b.add(np.clip(pcm * g, -1, 1), sr, txt, "near_dup_gain")
        b.pair(a, c, "near_audio")

    # near_dup_transcode — µ-law round trip (SNR≥30dB invariant pair)
    for _ in range(n_of(0.04)):
        sr, dur = rand_sr(), rand_dur()
        pcm = _synth_pcm(rng, sr, dur)
        txt = b._transcript(rng.randint(5, 30))
        a = b.add(pcm, sr, txt, "near_dup_transcode")
        c = b.add(pcm, sr, txt, "near_dup_transcode", codec="ulaw")
        b.pair(a, c, "near_audio")

    # near_dup_pad — trailing silence ≤ 50 ms (analog of resize/crop)
    for _ in range(n_of(0.03)):
        sr, dur = rand_sr(), rand_dur()
        pcm = _synth_pcm(rng, sr, dur)
        txt = b._transcript(rng.randint(5, 30))
        pad = np.zeros(int(sr * rng.randint(10, 51) / 1000))
        a = b.add(pcm, sr, txt, "near_dup_pad")
        c = b.add(np.concatenate([pcm, pad]), sr, txt, "near_dup_pad")
        b.pair(a, c, "near_audio")

    # near_miss — different signals, must NOT pair (perceptual_test.go:113-151)
    for _ in range(n_of(0.04)):
        sr, dur = rand_sr(), rand_dur()
        a = b.add(_synth_pcm(rng, sr, dur), sr, b._transcript(rng.randint(5, 30)), "near_miss")
        c = b.add(_synth_pcm(rng, sr, rand_dur()), sr, b._transcript(rng.randint(5, 30)), "near_miss")
        b.forbidden.append((min(a, c), max(a, c)))

    # transcript_contained — A's transcript ⊂ B's, different audio
    for _ in range(n_of(0.025)):
        sr = rand_sr()
        inner = b._transcript(rng.randint(8, 16))
        outer = f"{b._transcript(rng.randint(3, 10))} {inner} {b._transcript(rng.randint(3, 10))}"
        a = b.add(_synth_pcm(rng, sr, rand_dur()), sr, inner, "transcript_contained")
        c = b.add(_synth_pcm(rng, sr, rand_dur()), sr, outer, "transcript_contained")
        b.pair(a, c, "contained")

    # transcript_shuffled — same word multiset, different order (documented)
    for _ in range(n_of(0.01)):
        sr = rand_sr()
        words = b._transcript(rng.randint(10, 20)).split()
        shuf = list(words)
        rng.shuffle(shuf)
        b.add(_synth_pcm(rng, sr, rand_dur()), sr, " ".join(words), "transcript_shuffled")
        b.add(_synth_pcm(rng, sr, rand_dur()), sr, " ".join(shuf), "transcript_shuffled")

    # hot_bucket — identical 100 ms silence (skew; north_star clause)
    n_hot = min(1000, n_of(0.05, minimum=6))
    sr = 8000
    silence = wav_encode(np.zeros(int(sr * 0.1)), sr)
    hot_ids = [b.add_raw(silence, sr, 100, "", "hot_bucket") for _ in range(n_hot)]
    b.group(hot_ids, "exact")

    # unicode transcripts (ref main_test.go:425-468)
    for k in range(n_of(0.02, minimum=len(_UNICODE_SNIPPETS))):
        sr, dur = rand_sr(), rand_dur()
        b.add(_synth_pcm(rng, sr, dur), sr, _UNICODE_SNIPPETS[k % len(_UNICODE_SNIPPETS)], "unicode")

    # chain — A≈B, B≈C via successive small edits; CC merges all (SURVEY §7.3)
    for _ in range(n_of(0.01)):
        sr, dur = rand_sr(), rand_dur()
        pcm = _synth_pcm(rng, sr, dur)
        txt = b._transcript(rng.randint(5, 30))
        pad = np.zeros(int(sr * 0.04))
        a = b.add(pcm, sr, txt, "chain")
        c = b.add(np.concatenate([pcm, pad]), sr, txt, "chain")
        g = 10 ** (1.5 / 20.0)
        d = b.add(np.clip(np.concatenate([pcm, pad]) * g, -1, 1), sr, txt, "chain")
        b.pair(a, c, "near_audio")
        b.pair(c, d, "near_audio")

    clips = pd.DataFrame(b.rows)
    expected = pd.DataFrame(b.pairs, columns=["clip_id_a", "clip_id_b", "kind"]).drop_duplicates()
    forbidden = pd.DataFrame(b.forbidden, columns=["clip_id_a", "clip_id_b"])
    keeper = _keeper_cases()
    return ClipsFixture(clips, expected, forbidden, keeper)


def _keeper_cases() -> pd.DataFrame:
    """Keeper-selection fixtures mirroring main_test.go:1030-1156.

    One duplicate group of 4 with known mtime/size ordering; expected keeper
    per criteria. Tie case: equal mtime ⇒ lowest clip_id wins (deterministic
    stand-in for the reference's first-seen-wins)."""
    rows = []
    base = _BASE_TS
    group = [
        ("k_0001", base + dt.timedelta(days=3), 400, "path/a/one.wav"),
        ("k_0002", base + dt.timedelta(days=1), 100, "path/b/two.wav"),
        ("k_0003", base + dt.timedelta(days=9), 900, "path/keepme/three.wav"),
        ("k_0004", base + dt.timedelta(days=1), 900, "path/c/four.wav"),  # mtime tie w/ k_0002
    ]
    for cid, mt, size, path in group:
        rows.append({"clip_id": cid, "mtime": mt, "size": size, "path": path, "group_id": "g1"})
    df = pd.DataFrame(rows)
    df.attrs["expected"] = {
        "oldest": "k_0002",     # strict Before; tie (k_0004) → first-seen/lowest id
        "newest": "k_0003",
        "largest": "k_0003",    # 900 tie with k_0004 → lowest id among ties = k_0003
        "smallest": "k_0002",
        "path:keepme": "k_0003",
        "path:nomatch": "k_0001",  # fallback idx 0 (main.go:1012-1016)
        "first": "k_0001",
    }
    return df


def write_clips_parquet(fx: ClipsFixture, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    schema = pa.schema(
        [
            ("clip_id", pa.string()),
            ("bytes", pa.binary()),
            ("sr_hz", pa.int32()),
            ("dur_ms", pa.int32()),
            ("codec", pa.string()),
            ("transcript", pa.string()),
            ("mtime", pa.timestamp("us")),
            ("scenario", pa.string()),
        ]
    )
    # small row groups: parquet splits only at row-group boundaries, so one
    # giant row group would serialize the whole scan onto a single Spark task
    pq.write_table(
        pa.Table.from_pandas(fx.clips, schema=schema, preserve_index=False),
        out / "clips.parquet",
        row_group_size=512,
    )
    pq.write_table(pa.Table.from_pandas(fx.expected_pairs, preserve_index=False),
                   out / "expected_pairs.parquet")
    pq.write_table(pa.Table.from_pandas(fx.forbidden_pairs, preserve_index=False),
                   out / "forbidden_pairs.parquet")
