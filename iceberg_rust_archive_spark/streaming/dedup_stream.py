"""Streaming ingestion dedup: file-source stream → per-micro-batch
probe of the persistent MinHash index → novel docs forwarded, dupes
quarantined.

This is the composition a training-data ingestion pipeline actually
runs: documents arrive continuously, each micro-batch is deduped
against EVERYTHING accepted so far (operators/incremental_dedup.py —
IN-probe pruning, broadcast batch, corpus never shuffles), novel
documents land in the output and their band signatures commit to the
index. The reference has no streaming runtime at all (SURVEY §2); this
is the Spark-first surface over the same data model.

Effective exactly-once WITHOUT a transactional sink, from two pieces:

1. **Output before index** — novel rows are staged to a deterministic
   per-batch directory (``out_dir/batch=<id>``, mode=overwrite) BEFORE
   their signatures commit to the index (the ``before_index_commit``
   hook of dedup_against_index). A crash between the two replays the
   batch as novel-again and overwrites the same staging dir with the
   same content — nothing is lost and nothing duplicates. The reverse
   order would be at-MOST-once: index-first + crash makes the replay
   classify the batch as duplicates and emit nothing, silently losing
   it from the output.
2. **Index as idempotence** — after the index commit, a checkpoint-loss
   replay finds its own documents indexed, classifies every one as a
   duplicate, and emits nothing; already-staged batch dirs are left
   untouched.

The test drives two identical availableNow passes and asserts the
second emits zero rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

DOCS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("source", StringType()),
    StructField("text", StringType()),
])


def run_dedup_stream_once(spark: SparkSession, source_dir: str,
                          index, out_dir: str,
                          threshold: float = 0.5,
                          timeout_sec: int = 600) -> dict:
    """Drain ``source_dir`` with an availableNow trigger, deduping each
    micro-batch against ``index`` (a Table from create_minhash_index).
    Novel rows append to ``out_dir`` parquet; returns counters."""
    from iceberg_rust_archive_spark.operators.incremental_dedup import (
        dedup_against_index,
    )
    from iceberg_rust_archive_spark.session import ensure_read_confs
    ensure_read_confs(spark)
    stats = {"batches": 0, "docs": 0, "novel": 0, "dups": 0}

    def process(batch_df, batch_id):
        batch_df = batch_df.select("doc_id", "source", "text")
        n = batch_df.count()
        if n == 0:
            return
        index.refresh()

        def stage_output(novel_ids):
            """Persist the batch's novel rows BEFORE the index commit
            (see module docstring): deterministic per-batch dir +
            overwrite = idempotent under replay; join on an id frame,
            not a driver isin literal that grows with the batch."""
            if not novel_ids:
                return
            ids_df = spark.createDataFrame(
                [(int(i),) for i in novel_ids], "doc_id long")
            (batch_df.join(F.broadcast(ids_df), on="doc_id")
             .write.mode("overwrite")
             .parquet(os.path.join(out_dir, f"batch={batch_id}")))

        dups, novel_ids = dedup_against_index(
            spark, index, batch_df, threshold=threshold, add_novel=True,
            before_index_commit=stage_output)
        stats["batches"] += 1
        stats["docs"] += n
        stats["dups"] += dups.count()
        stats["novel"] += len(novel_ids)

    q = (spark.readStream.schema(DOCS_SCHEMA).parquet(source_dir)
         .writeStream.foreachBatch(process)
         .option("checkpointLocation", os.path.join(out_dir, "_chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination(timeout_sec)
    return stats
