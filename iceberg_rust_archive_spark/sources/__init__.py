"""Data-plane IO: partitioned Parquet writes, footer-stats harvesting,
manifest (JSON) read/write."""
