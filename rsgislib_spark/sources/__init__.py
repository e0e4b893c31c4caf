"""Table-format sources/sinks (Iceberg catalog + parquet-path
fallback) for the tile-partitioned outputs."""
