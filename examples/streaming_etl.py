"""Iceberg → Iceberg streaming ETL, exactly-once end to end.

Source side: the Structured Streaming source
(``streaming/source.py``) — snapshot ids as offsets, so every
micro-batch is a replayable snapshot range. Sink side: the
foreachBatch Iceberg sink (``streaming/sink.py``) — the batch id is
recorded in the snapshot summary, so a batch that commits twice is
detected and skipped. Together: an append to the source table lands
in the target table exactly once, surviving restarts from the
checkpoint at ANY point.

    raw orders (Iceberg)
      → readStream (snapshot-range offsets)
      → projection/filter (the stateless hot path stays JVM-side)
      → foreachBatch append (batch-id exactly-once)
      → order_facts (Iceberg)

Run: ``python examples/streaming_etl.py [warehouse_dir]``. Prints the
row accounting per cycle; both tables are normal Iceberg tables
(time travel, changelog, maintenance all apply).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(warehouse: str | None = None):
    import datetime as dt

    from pyspark.sql import functions as F

    from iceberg_rust_archive_spark.catalog import FileCatalog
    from iceberg_rust_archive_spark.session import get_spark
    from iceberg_rust_archive_spark.spec import (
        NestedField, PartitionSpec, Schema, StructTypeSpec,
    )
    from iceberg_rust_archive_spark.streaming.sink import (
        write_stream_to_table,
    )
    from iceberg_rust_archive_spark.streaming.source import (
        IcebergStreamSource,
    )
    from iceberg_rust_archive_spark.table import Table

    spark = get_spark("streaming-etl")
    spark.dataSource.register(IcebergStreamSource)
    wh = warehouse or tempfile.mkdtemp(prefix="stream_etl_")
    cat = FileCatalog(os.path.join(wh, "wh"))

    src_schema = Schema(0, StructTypeSpec((
        NestedField(1, "order_id", "long", True),
        NestedField(2, "status", "string", True),
        NestedField(3, "amount", "double", True),
        NestedField(4, "order_date", "date", True))))
    tgt_schema = Schema(0, StructTypeSpec((
        NestedField(1, "order_id", "long", True),
        NestedField(2, "amount", "double", True),
        NestedField(3, "order_date", "date", True))))
    src = Table.create(cat, "db.orders_raw", src_schema,
                       PartitionSpec(0, ()))
    tgt = Table.create(cat, "db.order_facts", tgt_schema,
                       PartitionSpec(0, ()))
    ckpt = os.path.join(wh, "ckpt")

    def drain():
        stream = (spark.readStream.format("iceberg-archive")
                  .option("catalog_root", cat.root)
                  .option("identifier", "db.orders_raw").load()
                  .filter(F.col("status") == "OPEN")
                  .select("order_id", "amount", "order_date"))
        q = (write_stream_to_table(stream, tgt, checkpoint_dir=ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        tgt.refresh()
        return tgt.scan(spark).count()

    d0 = dt.date(2024, 1, 1)
    src.append(spark, spark.createDataFrame(
        [(1, "OPEN", 10.0, d0), (2, "CANCELLED", 5.0, d0),
         (3, "OPEN", 7.5, d0)],
        "order_id long, status string, amount double, order_date date"))
    print("cycle 1 target rows:", drain())          # → 2

    src.refresh()
    src.append(spark, spark.createDataFrame(
        [(4, "OPEN", 1.0, d0), (5, "OPEN", 2.0, d0)],
        "order_id long, status string, amount double, order_date date"))
    print("cycle 2 target rows:", drain())          # → 4

    print("cycle 3 target rows:", drain(), "(no new data — no-op)")
    print("target snapshots:",
          len(tgt.metadata.snapshots))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
