"""Document chunking — RAG / context-window preparation over the
``documents`` table.

Two chunkers, both pure built-in expressions (sequence → posexplode →
substring / slice), so the hot path is JVM codegen with zero Python:

- **char windows**: fixed ``width`` characters, ``overlap`` characters
  shared between consecutive chunks (stride = width - overlap). The
  boundary rule: a doc of length L yields 1 chunk when L ≤ width, else
  ``ceil((L - width) / stride) + 1`` — the last chunk may be short but
  every character is covered and no chunk starts past the end.
- **token windows**: same arithmetic over the whitespace-token stream
  (``filter(split(trim(text)))`` drops empty tokens), chunks re-joined
  with single spaces — the shape embedding pipelines feed to encoders.

100 TB shape: chunking is a per-row ``explode`` — no shuffle at all;
output partitioning inherits the input's, and the amplification factor
(≈ L/stride rows per doc) is bounded by the width knobs. The rollup
summaries here add one small groupBy for test comparability; production
callers take the un-aggregated chunk stream straight to a writer.

The reference engine has no chunking operator (it stops at relational
queries); this extends the training-data surface the north-star brief
asks for.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_WIDTH = 600      # chars per chunk
CHUNK_OVERLAP = 120    # chars shared between consecutive chunks
TOK_WIDTH = 80         # tokens per chunk
TOK_OVERLAP = 16


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_rust_archive_spark.session import read_parallel
    return read_parallel(spark, os.path.join(sf_dir, "documents.parquet"))


def _n_chunks(total_col, width: int, stride: int):
    """1 chunk when it fits, else ceil((total-width)/stride)+1."""
    return (F.when(total_col <= width, F.lit(1))
            .otherwise(F.ceil((total_col - F.lit(width))
                              / F.lit(stride)) + 1)).cast("int")


def chunk_by_chars(docs: DataFrame, width: int = CHUNK_WIDTH,
                   overlap: int = CHUNK_OVERLAP,
                   text_col: str = "text") -> DataFrame:
    """Overlapping character windows: one row per (doc, chunk_idx) with
    the chunk text and its [start, start+len) offsets."""
    if not 0 <= overlap < width:
        raise ValueError("need 0 <= overlap < width")
    stride = width - overlap
    n = _n_chunks(F.length(text_col), width, stride)
    return (docs
            .withColumn("chunk_idx",
                        F.explode(F.sequence(F.lit(0), n - 1)))
            .withColumn("chunk_start", F.col("chunk_idx") * stride)
            .withColumn("chunk_text", F.expr(
                f"substring({text_col}, chunk_idx * {stride} + 1, "
                f"{width})"))
            .withColumn("chunk_len", F.length("chunk_text")))


def chunk_by_tokens(docs: DataFrame, width: int = TOK_WIDTH,
                    overlap: int = TOK_OVERLAP,
                    text_col: str = "text") -> DataFrame:
    """Overlapping whitespace-token windows, re-joined with spaces.
    ``chunk_tokens`` counts the window's tokens (last window may be
    short); empty docs yield one empty chunk, mirroring char mode."""
    if not 0 <= overlap < width:
        raise ValueError("need 0 <= overlap < width")
    stride = width - overlap
    toks = f"filter(split(trim({text_col}), '\\\\s+'), x -> x != '')"
    d = docs.withColumn("__toks", F.expr(toks))
    n = _n_chunks(F.size("__toks"), width, stride)
    return (d
            .withColumn("chunk_idx",
                        F.explode(F.sequence(F.lit(0), n - 1)))
            .withColumn("__win", F.expr(
                f"slice(__toks, chunk_idx * {stride} + 1, {width})"))
            .withColumn("chunk_text", F.array_join("__win", " "))
            .withColumn("chunk_tokens", F.size("__win"))
            .drop("__toks", "__win"))


def chunk_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source rollup of both chunkers (labeled union) — boundary-
    sensitive sums so any off-by-one in the window math shows up."""
    docs = _docs(spark, sf_dir)
    c = (chunk_by_chars(docs)
         .groupBy("source")
         .agg(F.count(F.lit(1)).alias("n_chunks"),
              F.sum("chunk_len").alias("sum_units"),
              F.max("chunk_len").alias("max_units"))
         .withColumn("branch", F.lit("chars")))
    t = (chunk_by_tokens(docs)
         .groupBy("source")
         .agg(F.count(F.lit(1)).alias("n_chunks"),
              F.sum("chunk_tokens").alias("sum_units"),
              F.max("chunk_tokens").alias("max_units"))
         .withColumn("branch", F.lit("tokens")))
    cols = ["branch", "source", "n_chunks", "sum_units", "max_units"]
    return c.select(*cols).unionByName(t.select(*cols))


# DuckDB twins (driver correctness gate). Chunk counts use the same
# boundary rule; DuckDB's list_slice is (list, begin, end-INCLUSIVE)
# where Spark's slice is (arr, start, LENGTH) — end = start + width - 1.
_CW, _CS = CHUNK_WIDTH, CHUNK_WIDTH - CHUNK_OVERLAP
_TW, _TS = TOK_WIDTH, TOK_WIDTH - TOK_OVERLAP
ORACLE_SQL = {
    "document_chunk_summary": f"""
        WITH d AS (
          SELECT source, text, length(text) AS L,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        cc AS (
          SELECT source,
                 length(substr(text, CAST(i AS BIGINT) * {_CS} + 1,
                               {_CW})) AS units
          FROM (SELECT source, text,
                       CASE WHEN L <= {_CW} THEN 1
                            ELSE CAST(ceil((L - {_CW}) / {_CS}.0)
                                      AS BIGINT) + 1 END AS n
                FROM d) s,
               LATERAL (SELECT unnest(range(0, n)) AS i) g
        ),
        tc AS (
          SELECT source,
                 len(list_slice(toks, CAST(i AS BIGINT) * {_TS} + 1,
                                CAST(i AS BIGINT) * {_TS} + {_TW}))
                   AS units
          FROM (SELECT source, toks,
                       CASE WHEN len(toks) <= {_TW} THEN 1
                            ELSE CAST(ceil((len(toks) - {_TW}) / {_TS}.0)
                                      AS BIGINT) + 1 END AS n
                FROM d) s,
               LATERAL (SELECT unnest(range(0, n)) AS i) g
        )
        SELECT 'chars' AS branch, source, count(*) AS n_chunks,
               CAST(sum(units) AS BIGINT) AS sum_units,
               CAST(max(units) AS BIGINT) AS max_units
        FROM cc GROUP BY source
        UNION ALL
        SELECT 'tokens', source, count(*),
               CAST(sum(units) AS BIGINT), CAST(max(units) AS BIGINT)
        FROM tc GROUP BY source
    """,
}
