"""Text kernels: tokenization, shingling, MinHash, SimHash — pure Python/numpy.

These are the *oracle* implementations used by unit tests and by the parity
harness; the production path computes the identical values JVM-side with
Column expressions (see ``minhash_sql.py``) so that the hot loop never enters
Python. Determinism: every hash here is seed-fixed (xxhash64-compatible via
Spark, blake2b-based here only where we don't need JVM parity).

Also: language-ID heuristic, quality scoring, token counting, rolling-hash
fingerprints — the text-analysis operators a training-data pipeline needs
(task brief), each mirrored by a Column-expression implementation in
``operators/textops.py``.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np

_BLAKE2B = hashlib.blake2b

MERSENNE_61 = (1 << 61) - 1

# Per-process scratch for the batched affine/M61 product (see
# minhash_signatures_batch). Grows geometrically, never shrinks.
_AFFINE_SCRATCH: dict = {}
HASH_MASK_31 = 0x7FFFFFFF  # fold base hashes into 31 bits → a*h+b never
                           # overflows int64 (a,b < 2^31) — see minhash_sql.py


def tokenize(text: str) -> list[str]:
    """Whitespace word split, lowercased. Unicode-safe (str-level ops only)."""
    return text.lower().split()


def shingles(text: str, k: int) -> list[str]:
    """k-word shingles joined by single spaces; < k words → one shingle of all."""
    words = tokenize(text)
    if not words:
        return []
    if len(words) < k:
        return [" ".join(words)]
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic affine coefficients (a odd, in [1, 2^31); b in [0, 2^31))."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, HASH_MASK_31, size=num_perm, dtype=np.int64) | 1
    b = rng.randint(0, HASH_MASK_31, size=num_perm, dtype=np.int64)
    return a, b


def minhash_from_hashes(base31: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """sig[i] = min over shingles of (a_i * h + b_i) mod M61.

    ``base31`` are 31-bit-folded base hashes, so a_i*h < 2^62 — no overflow
    in int64 arithmetic, matching the JVM expression exactly.
    """
    if base31.size == 0:
        return np.full(a.size, MERSENNE_61 - 1, dtype=np.int64)
    prod = a[:, None] * base31[None, :] + b[:, None]
    return (prod % MERSENNE_61).min(axis=1)


def jaccard(text_a: str, text_b: str, k: int) -> float:
    sa, sb = set(shingles(text_a, k)), set(shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def simhash_text(text: str, hash_fn) -> int:
    """64-bit SimHash over word tokens (weighted bit-vote; Charikar 2002).

    ``hash_fn(token) -> int64`` must match the JVM-side hash (xxhash64).
    """
    counts = np.zeros(64, dtype=np.int64)
    words = tokenize(text)
    if not words:
        return 0
    for w in words:
        h = hash_fn(w) & 0xFFFFFFFFFFFFFFFF
        for bit in range(64):
            counts[bit] += 1 if (h >> bit) & 1 else -1
    val = 0
    for bit in range(64):
        if counts[bit] > 0:
            val |= 1 << bit
    if val >= 1 << 63:
        val -= 1 << 64
    return val


# ---------------------------------------------------------------------------
# Text-analysis kernels (oracle forms; Column versions in operators/textops.py)
# ---------------------------------------------------------------------------

_STOPWORDS = frozenset(
    "the a an and or of to in is it that for on with as was are be this by "
    "at from not have has but they you we his her its their".split()
)

# BPE-ish token regex: words, numbers, or single non-space symbols.
TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def token_count(text: str) -> int:
    return len(TOKEN_RE.findall(text))


def quality_score(text: str) -> float:
    """Heuristic doc-quality in [0,1]: length, alpha ratio, stopword ratio,
    punctuation density — the usual pretraining-corpus filters."""
    n = len(text)
    if n == 0:
        return 0.0
    words = text.lower().split()
    n_words = len(words)
    alpha = sum(c.isalpha() for c in text) / n
    punct = sum(not c.isalnum() and not c.isspace() for c in text) / n
    stop = (sum(w in _STOPWORDS for w in words) / n_words) if n_words else 0.0
    length_term = min(n_words / 20.0, 1.0)
    score = 0.35 * length_term + 0.3 * alpha + 0.2 * min(stop * 4, 1.0) + 0.15 * (1 - min(punct * 5, 1.0))
    return max(0.0, min(1.0, score))


def rolling_fingerprint(text: str, window: int = 16, mod: int = 8) -> list[int]:
    """Winnowing-style document fingerprint: Karp-Rabin rolling hash over
    characters, keep hashes ≡ 0 (mod ``mod``) — a sparse, position-robust
    fingerprint set for containment/overlap detection."""
    if len(text) < window:
        return [abs(hash_bytes_stable(text.encode("utf-8")))] if text else []
    base, m = 257, MERSENNE_61
    h = 0
    pw = pow(base, window - 1, m)
    out = []
    data = text.encode("utf-8", errors="replace")
    for i, c in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * pw) % m
        h = (h * base + c) % m
        if i >= window - 1 and h % mod == 0:
            out.append(h)
    return out


def hash_bytes_stable(data: bytes) -> int:
    """Stable (non-salted) 63-bit hash for fingerprints/tests."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big") >> 1


def shingle_base31(text: str, k: int) -> np.ndarray:
    """31-bit-folded blake2b base hashes of the k-word shingles — the Python
    analog of minhash_sql.shingle_hashes_col (which folds xxhash64). Both
    feed the identical affine/M61 step (minhash_from_hashes)."""
    _b2b, _fb = _BLAKE2B, int.from_bytes  # local binds: this is a hot loop
    out = [
        _fb(_b2b(s.encode("utf-8"), digest_size=8).digest(), "big") & HASH_MASK_31
        for s in shingles(text, k)
    ]
    return np.asarray(out, dtype=np.int64)


def minhash_signature_py(text: str, a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """Full Python MinHash signature (blake2b base hashes + affine/M61)."""
    return minhash_from_hashes(shingle_base31(text, k), a, b)


def minhash_signatures_batch(
    texts, a: np.ndarray, b: np.ndarray, k: int
) -> np.ndarray:
    """MinHash signatures for a whole batch of texts → (n_rows, num_perm).

    Value-identical to stacking ``minhash_signature_py`` per row (same
    int64 a·h+b mod M61 arithmetic, pytest-pinned), but the affine/M61
    product runs ONCE over the batch's concatenated shingle hashes and the
    per-row min becomes a segmented ``np.minimum.reduceat`` — ~20 numpy
    dispatches per ROW become ~6 per BATCH (measured 108 → ~25 µs/row on
    the bench fixture's 18-word transcripts; the remaining cost is the
    per-shingle blake2b, which is the contract with the JVM oracle path).
    None rows hash as empty text (empty-set signature), matching callers.

    The (num_perm × total_shingles) affine product reuses a per-process
    scratch buffer instead of allocating ~64 MB of fresh temporaries per
    Arrow batch: this host stalls ~25 µs/page on first touch of new
    anonymous memory (SCALING.json round4_fault_stall_finding), so fresh
    allocs cost more in page faults than in arithmetic (measured 75 →
    53 ms per 65k-shingle batch, first batch 445 → 68 ms). Arrow python
    workers process batches sequentially within one process, so a
    module-level buffer is safe.
    """
    n = len(texts)
    num_perm = a.size
    out = np.empty((n, num_perm), dtype=np.int64)
    base_list = [shingle_base31(t if t is not None else "", k) for t in texts]
    counts = np.fromiter((x.size for x in base_list), dtype=np.int64, count=n)
    nz = counts > 0
    if not nz.any():
        out[:] = MERSENNE_61 - 1
        return out
    allh = np.concatenate([x for x in base_list if x.size])
    need = num_perm * allh.size
    buf = _AFFINE_SCRATCH.get("buf")
    if buf is None or buf.size < need:
        buf = np.empty(max(need, 2 * (buf.size if buf is not None else 0)), dtype=np.int64)
        buf.fill(0)  # touch every page once, while we're off the clock
        _AFFINE_SCRATCH["buf"] = buf
    prod = buf[:need].reshape(num_perm, allh.size)
    np.multiply(a[:, None], allh[None, :], out=prod)
    np.add(prod, b[:, None], out=prod)
    np.mod(prod, MERSENNE_61, out=prod)
    starts = np.zeros(int(nz.sum()), dtype=np.int64)
    np.cumsum(counts[nz][:-1], out=starts[1:])
    out[nz] = np.minimum.reduceat(prod, starts, axis=1).T
    out[~nz] = MERSENNE_61 - 1
    return out
