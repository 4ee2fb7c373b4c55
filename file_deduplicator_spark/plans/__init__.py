"""End-to-end pipeline assembly (scan → filter → sign → cluster → report)."""
