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


CDC_BATCH_KEY = "streaming-cdc-batch-id"
CDC_BATCH_PROP = "streaming.cdc-last-batch-id"


def apply_changes_to_table(stream_df: DataFrame, table, keys: list[str],
                           checkpoint_dir: str, spark=None):
    """CDC APPLY sink: maintain a MIRROR Iceberg table from a changelog
    stream — rows carrying ``_change_type`` ('insert' | 'delete'),
    ``_change_ordinal`` (monotone commit marker) and the full data
    columns, i.e. exactly the ``Table.changes()`` feed shape.

    Per micro-batch, in ONE atomic commit:
    - the batch is NETTED per key first (events at the key's max
      ordinal win; an upsert's delete+insert pair shares an ordinal and
      the insert is the survivor) — a key updated three times in one
      batch lands once, not three times;
    - every key seen in the batch goes into ONE equality-delete file
      (retraction of the mirror's prior row, no-op for brand-new keys);
    - the surviving insert rows append as data files at the same
      sequence number, so the delete applies only to strictly-earlier
      data (table.rs:498-531) and the commit IS the net batch.

    Exactly-once: the committed batch id rides table properties +
    snapshot summary (same idempotence contract as
    ``write_stream_to_table``); a post-crash replayed batch is a no-op.

    Ordering contract: micro-batches must arrive in commit order and
    must NOT split one source commit's events across batches (deliver
    per-commit files, or whole prefixes like a ``Table.changes``
    replay). A batch boundary inside a commit separates its
    retraction from its insert, and whichever lands second would
    wrongly win the per-key netting — the same prefix-consistency rule
    every changelog consumer (Debezium, Iceberg CDC) imposes.

    Scale: the delete side is the skinny key projection; netting is one
    window over the batch (micro-batch-sized, not table-sized); the
    mirror pays the ordinary merge-on-read anti-join until compaction.

    Returns an un-started ``DataStreamWriter``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = spark or stream_df.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        table.refresh()
        prop = table.metadata.properties.get(CDC_BATCH_PROP)
        if prop is not None and batch_id <= int(prop):
            return  # replayed batch — already committed
        batch_df = batch_df.cache()
        try:
            if batch_df.limit(1).count() == 0:
                return
            w = Window.partitionBy(*keys)
            mx = F.max("_change_ordinal").over(w)
            last = (batch_df.withColumn("__mx", mx)
                    .filter(F.col("_change_ordinal") == F.col("__mx")))
            finals = (last.filter(F.col("_change_type") == "insert")
                      .drop("_change_type", "_commit_snapshot_id",
                            "_change_ordinal", "__mx"))
            del_keys = batch_df.select(*keys).dropDuplicates()

            from iceberg_rust_archive_spark.sources.write import (
                write_datafiles,
            )
            from iceberg_rust_archive_spark.spec.manifest import (
                CONTENT_EQUALITY_DELETES,
            )
            md = table.metadata
            schema = md.current_schema()
            eq_ids = tuple(schema.field_by_name(k).field_id for k in keys)
            del_files = write_datafiles(
                spark, md, del_keys, content=CONTENT_EQUALITY_DELETES,
                equality_ids=eq_ids)
            data_files = write_datafiles(spark, md, finals)

            def build(t):
                return (t.append_files(data_files)
                        .append_delete_files(del_files)
                        .set_summary(CDC_BATCH_KEY, str(batch_id))
                        .set_properties({CDC_BATCH_PROP: str(batch_id)}))
            build(table.new_transaction()).commit_with_retry(build)
            table.refresh()
        finally:
            batch_df.unpersist()

    return (stream_df.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir))
