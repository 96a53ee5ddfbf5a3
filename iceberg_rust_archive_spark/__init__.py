"""PySpark-native analytics engine with the capabilities of
JanKaul/iceberg-rust_archive (an Iceberg table format + DataFusion query
integration, re-expressed Spark-first).

Layering (mirrors SURVEY.md §7):
- ``spec``      — Iceberg metadata model (schemas, partition specs, snapshots,
                  manifests, table/view/MV metadata) as pure-Python dataclasses.
- ``functions`` — partition transforms (murmur3 bucket, truncate, y/m/d/h) and
                  analytics column functions (text, similarity).
- ``catalog``   — Catalog ABC + File and SQL(sqlite) catalogs with CAS commits.
- ``sources``   — data-plane readers/writers (Parquet via Spark; stats harvest).
- ``operators`` — scan (two-level pruning, equality-delete merge-on-read),
                  write (partitioned append/replace), dedup, similarity, text.
- ``plans``     — SQL shim + MV incremental refresh (PosDelta/NegDelta).
- ``streaming`` — Structured Streaming equivalents for the events table.

The metadata layer is driver-side pure Python; the data plane is Spark
DataFrames so Catalyst/Tungsten plays the role DataFusion plays in the
reference (SURVEY.md §2.B).
"""

__version__ = "0.1.0"

from iceberg_rust_archive_spark.session import get_spark  # noqa: F401
