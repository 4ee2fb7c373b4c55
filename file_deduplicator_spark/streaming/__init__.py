"""Incremental ("watch mode") dedup: snapshot-driven batches, a Structured
Streaming wrapper, and an applyInPandasWithState stateful tier."""
