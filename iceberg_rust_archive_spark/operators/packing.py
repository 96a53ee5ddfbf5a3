"""Sequence packing: assemble documents into fixed token-budget bins.

LLM training consumes fixed-length sequences; the standard assembly is
concat-and-chunk — order the corpus deterministically, concatenate the
token streams, and cut at every ``capacity`` tokens. A document is
attributed to the bin where it STARTS, which makes the assignment a
pure prefix-sum: ``bin = floor((cumsum_tokens - tokens) / capacity)``.
That is one window aggregate — no Python, no iteration.

Scale shape: a single global ordering would serialize the prefix sum
through one partition, so packing runs within (source, shard) streams,
``shard = doc_id % N_SHARDS`` — each stream packs independently and in
parallel, and the assignment stays deterministic at any parallelism
(the same property the sampling operators get from content hashing).
At 100 TB, N_SHARDS scales with the cluster; bins are only ever built
from one shard's contiguous stream, so no cross-shard shuffle exists
beyond the window's own hash exchange.

Token counts use the whitespace convention shared with
``operators/text.py`` so the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CAPACITY = 512  # tokens per packed sequence
N_SHARDS = 4    # parallel packing streams per source

_WS_TOKENS = "size(filter(split(lower(text), '\\\\s+'), w -> w != ''))"
_DWS_TOKENS = ("len(list_filter(string_split_regex(lower(text), '\\s+'), "
               "w -> w != ''))")


def pack_bins(df: DataFrame, capacity: int = CAPACITY,
              shards: int = N_SHARDS) -> DataFrame:
    """Per-(source, shard, bin) packing ledger: every document mapped to
    the concat-and-chunk bin where its token stream begins."""
    toks = df.select(
        "source", "doc_id",
        F.expr(_WS_TOKENS).cast("long").alias("n_tok"),
        (F.col("doc_id") % shards).alias("shard"))
    w = (Window.partitionBy("source", "shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = toks.withColumn("cum", F.sum("n_tok").over(w))
    return (cum.withColumn(
                "bin",
                F.floor((F.col("cum") - F.col("n_tok"))
                        / F.lit(float(capacity))).cast("long"))
            .groupBy("source", "shard", "bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("bin_tokens")))


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source packing summary over the documents table: how many
    bins the corpus packs into, and how densely."""
    from iceberg_rust_archive_spark.session import read_parallel
    d = read_parallel(spark, os.path.join(sf_dir, "documents.parquet"))
    bins = pack_bins(d)
    return (bins.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_bins"),
                 F.sum("n_docs").alias("n_docs"),
                 F.sum("bin_tokens").alias("sum_tokens"),
                 (F.floor(F.avg("n_docs") * 10000 + F.lit(0.5))
                  / 10000.0).alias("avg_docs_per_bin"))
            .orderBy("source"))


ORACLE_SQL = {
    "sequence_packing": f"""
        WITH toks AS (
          SELECT source, doc_id, doc_id % {N_SHARDS} AS shard,
                 CAST({_DWS_TOKENS} AS BIGINT) AS n_tok
          FROM documents
        ), cum AS (
          SELECT source, shard, n_tok,
                 SUM(n_tok) OVER (PARTITION BY source, shard
                                  ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
          FROM toks
        ), bins AS (
          SELECT source, shard,
                 CAST(floor((cum - n_tok) / {float(CAPACITY)}) AS BIGINT)
                   AS bin,
                 count(*) AS n_docs, sum(n_tok) AS bin_tokens
          FROM cum GROUP BY 1, 2, 3
        )
        SELECT source, count(*) AS n_bins,
               CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(sum(bin_tokens) AS BIGINT) AS sum_tokens,
               floor(avg(n_docs) * 10000 + 0.5) / 10000.0 AS avg_docs_per_bin
        FROM bins GROUP BY source ORDER BY source
    """,
}
