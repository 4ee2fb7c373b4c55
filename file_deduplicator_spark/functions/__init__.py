"""Scalar/vectorized kernels: audio DSP, text shingling, hashing.

Pure-numpy kernels live in ``audio.py`` / ``pcm_codecs.py`` / ``text.py``
and the container codecs (``flac/png_gif/jpeg/webp/mp4/ogg.py``) (unit-testable without
Spark); Spark bindings (pandas/Arrow UDFs and pure-Column expressions) live
in ``udfs.py`` and ``minhash_sql.py``.
"""
