"""Spark bindings for the audio kernels — vectorized pandas/Arrow UDFs.

This is the ONLY place per-row Python runs in the engine, and it is the
unavoidable place: codec decode of a binary payload is not expressible in
Catalyst. Everything around it (digests, MinHash, banding, joins, windows)
is pure Column expressions.

Batch-shape notes (SURVEY §7.3 "binary payloads through Arrow"):
* session sets ``spark.sql.execution.arrow.maxRecordsPerBatch`` low (1024)
  so multi-MB clips don't blow the Arrow transfer;
* callers should project ONLY (id, bytes) into this stage — column pruning
  keeps the shuffled/scanned footprint minimal;
* decode failure → null signature; the row remains exact-dedupable —
  mirrors the reference's per-file fallback (main.go:666-674).

Reference parity: computePerceptualHash dispatch perceptual.go:407-431.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_deduplicator_spark.functions.audio import SIG_FUNCS, wav_decode


def _sig_series(data: pd.Series, algo: str) -> pd.Series:
    fn = SIG_FUNCS[algo]
    out = []
    for buf in data:
        if buf is None:
            out.append(None)
            continue
        try:
            pcm, _sr = wav_decode(bytes(buf))
            out.append(fn(pcm))
        except Exception:  # decode failure → null sig
            out.append(None)
    return pd.Series(out, dtype="object")


def make_audio_sig_udf(algo: str = "dhash"):
    """pandas_udf: bytes → 64-bit similarity signature (LongType, nullable)."""
    if algo not in SIG_FUNCS:
        algo = "dhash"  # unknown → default, matching getHasher's fallback style

    @F.pandas_udf(T.LongType())
    def audio_sig(data: pd.Series) -> pd.Series:
        return _sig_series(data, algo)

    return audio_sig


def audio_sig_col(bytes_col: Column, algo: str = "dhash") -> Column:
    return make_audio_sig_udf(algo)(bytes_col)


def signatures_map_in_pandas(df, algo: str, num_perm: int, shingle_k: int, seed: int,
                             bytes_col: str = "bytes", transcript_col: str = "transcript"):
    """ONE combined Arrow pass: bytes → audio SimHash, transcript → MinHash —
    via ``mapInPandas``, consuming the payload column.

    Why mapInPandas and not a pandas_udf projection: ``ArrowEvalPython``
    buffers every INPUT row in a JVM-side row queue (HybridRowQueue) to
    rejoin it with the UDF output — with multi-MB ``bytes`` rows that means
    an extra UnsafeRow copy of the payload per row plus disk spill of the
    queue; a thread dump under load shows most cores in UnsafeRow.copy /
    JoinedRow.getBinary / spill-file reads (measured 3.5x ANTI-scaling from
    8→32 cores). mapInPandas has no rejoin: the Python output REPLACES the
    input batch, so ``bytes`` crosses Arrow once and dies inside the worker.

    Returns df with ``bytes_col`` REMOVED and (sim_sig, minhash_sig) added.
    """
    from pyspark.sql import types as ST

    from file_deduplicator_spark.functions.text import minhash_params, minhash_signature_py

    if algo not in SIG_FUNCS:
        algo = "dhash"
    a, b = minhash_params(num_perm, seed)

    keep = [f for f in df.schema.fields if f.name != bytes_col]
    out_schema = ST.StructType(
        keep
        + [
            ST.StructField("sim_sig", ST.LongType()),
            ST.StructField("minhash_sig", ST.ArrayType(ST.LongType())),
        ]
    )
    keep_names = [f.name for f in keep]

    def run(batches):
        for pdf in batches:
            out = pdf[keep_names].copy()
            out["sim_sig"] = _sig_series(pdf[bytes_col], algo)
            out["minhash_sig"] = [
                minhash_signature_py(t if t is not None else "", a, b, shingle_k).tolist()
                for t in pdf[transcript_col]
            ]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def make_minhash_udf(num_perm: int, shingle_k: int, seed: int):
    """Vectorized MinHash-only UDF (text-only tables / perceptual off)."""
    from file_deduplicator_spark.functions.text import minhash_params, minhash_signature_py

    a, b = minhash_params(num_perm, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash(transcript: pd.Series) -> pd.Series:
        return pd.Series(
            [
                minhash_signature_py(t if t is not None else "", a, b, shingle_k).tolist()
                for t in transcript
            ]
        )

    return minhash


@F.pandas_udf(T.StructType([
    T.StructField("n_samples", T.LongType()),
    T.StructField("sr_hz", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("ok", T.BooleanType()),
]))
def audio_probe(data: pd.Series) -> pd.DataFrame:
    """Decode probe: per-clip sample count / sr / rms / peak — the
    per-row-invariant harness column (decoded-PCM checks) and the
    compare-mode debug utility (ref compareImagesCLI main.go:2010-2102)."""
    import numpy as np

    rows = []
    for buf in data:
        try:
            pcm, sr = wav_decode(bytes(buf))
            rms = float(np.sqrt(np.mean(pcm * pcm))) if pcm.size else 0.0
            peak = float(np.max(np.abs(pcm))) if pcm.size else 0.0
            rows.append((pcm.size, sr, rms, peak, True))
        except Exception:
            rows.append((None, None, None, None, False))
    return pd.DataFrame(rows, columns=["n_samples", "sr_hz", "rms", "peak", "ok"])
