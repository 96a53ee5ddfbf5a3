"""Structured Streaming sink into OUR Iceberg tables.

``foreachBatch`` + a batch-id watermark in the snapshot summary gives
exactly-once appends: Structured Streaming replays the last micro-batch
after a restart, and the committed ``streaming-batch-id`` makes the
replayed append a no-op. This is the streaming twin of the reference's
``RefreshState``-in-snapshot-summary idempotency trick
(materialized_view/transaction/mod.rs:66-133) — the sink's progress
marker commits ATOMICALLY with the data it describes, so there is no
window where data landed but the marker didn't.

At scale each micro-batch append is the ordinary partitioned write path
(one repartition on the transform columns, executor-side stats harvest)
plus one metadata commit; the commit CAS serializes concurrent writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

BATCH_KEY = "streaming-batch-id"
BATCH_PROP = "streaming.last-batch-id"


def last_committed_batch_id(table) -> int | None:
    """Watermark lives in TABLE PROPERTIES, not just the current snapshot
    summary: any interleaved non-sink commit (compaction, another writer's
    append, equality delete, MV refresh) creates a snapshot without the
    summary key, but properties are carried forward by every commit, so a
    replayed micro-batch after a restart still sees the marker. The
    summary entry is kept for per-snapshot observability; scanning the
    snapshot history covers tables written before the property existed."""
    prop = table.metadata.properties.get(BATCH_PROP)
    if prop is not None:
        return int(prop)
    ids = [int(s.summary[BATCH_KEY])
           for s in table.metadata.snapshots.values()
           if BATCH_KEY in s.summary]
    return max(ids) if ids else None


def write_stream_to_table(stream_df: DataFrame, table,
                          checkpoint_dir: str, spark=None):
    """Returns an un-started ``DataStreamWriter``; callers pick the
    trigger (tests use ``.trigger(availableNow=True).start()``)."""
    spark = spark or stream_df.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        table.refresh()
        last = last_committed_batch_id(table)
        if last is not None and batch_id <= last:
            return  # replayed batch — already committed
        from iceberg_rust_archive_spark.sources.write import write_datafiles
        files = write_datafiles(spark, table.metadata, batch_df)
        txn = (table.new_transaction().append_files(files)
               .set_summary(BATCH_KEY, str(batch_id))
               .set_properties({BATCH_PROP: str(batch_id)}))
        txn.commit_with_retry(
            lambda t: t.append_files(files)
            .set_summary(BATCH_KEY, str(batch_id))
            .set_properties({BATCH_PROP: str(batch_id)}))
        table.refresh()

    return (stream_df.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir))
