"""Incremental ("watch mode") dedup: snapshot-driven batches + a Structured
Streaming wrapper."""
