"""file_deduplicator_spark — a from-scratch, PySpark-native near-duplicate
detection and clustering engine.

Generalizes the query semantics of ``luinbytes/file-deduplicator`` (reference
snapshot at /root/reference, v3.1.0) to web-scale tables of audio clip +
transcript pairs:

* exact-duplicate grouping via content digests        (ref: main.go:807-833)
* near-duplicate grouping via 64-bit similarity sigs  (ref: main.go:836-905,
  perceptual.go:173-292) — SimHash over decoded-PCM frame features, MinHash
  over transcript shingles, LSH band joins + connected components instead of
  the reference's O(n^2) greedy star
* keeper selection per duplicate cluster              (ref: main.go:967-1021)
* report / action-plan / undo-lineage tables          (ref: main.go:1023-1389)
* incremental ("watch mode") dedup over snapshots     (ref: main.go:1585-1921)

Everything is expressed as pyspark.sql DataFrame transforms; per-row compute
(audio decode, feature extraction) lives in vectorized pandas/Arrow UDFs.
"""

__version__ = "0.1.0"

from file_deduplicator_spark.config import DedupConfig, adaptive_threshold

__all__ = ["DedupConfig", "adaptive_threshold", "__version__"]
