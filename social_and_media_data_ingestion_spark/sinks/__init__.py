"""Side-effecting sinks: CSV/parquet writers live in io.py; this package
holds the per-row HTTP download sink with retry/error-split semantics."""
