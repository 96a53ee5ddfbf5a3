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


def last_committed_batch_id(table) -> int | None:
    snap = table.metadata.current_snapshot()
    if snap is None or BATCH_KEY not in snap.summary:
        return None
    return int(snap.summary[BATCH_KEY])


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
               .set_summary(BATCH_KEY, str(batch_id)))
        txn.commit_with_retry(
            lambda t: t.append_files(files)
            .set_summary(BATCH_KEY, str(batch_id)))
        table.refresh()

    return (stream_df.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir))
