"""Sources & sinks: clips tables, snapshot log (Iceberg-style incremental
reads), report/action/metrics sinks."""
