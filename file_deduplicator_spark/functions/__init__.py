"""Scalar/vectorized kernels: audio DSP, text shingling, hashing.

Pure-numpy kernels live in ``audio.py`` / ``text.py`` (unit-testable without
Spark); Spark bindings (pandas/Arrow UDFs and pure-Column expressions) live
in ``udfs.py`` and ``minhash_sql.py``.
"""
