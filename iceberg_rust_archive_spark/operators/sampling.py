"""Deterministic sampling / dataset-split operators.

Training pipelines need *reproducible* sampling: the same row must land
in the same split on every engine, every run, at any scale — which rules
out engine RNGs (`df.sample` seeds don't survive repartitioning, and no
two engines agree). The portable primitive is content hashing: bucket =
md5(stable_key) mod N. One narrow projection, no shuffle until the
final small aggregate; adding data never reassigns existing rows.

- ``with_split``: train/val/test assignment from md5(doc_id) buckets.
- ``dataset_split_summary``: per (source, split) accounting query.
- ``hash_sample``: keep a deterministic p% of rows (same mechanism).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SPLIT_BUCKETS = 100
VAL_PCT = 10
TEST_PCT = 10


def _hash_bucket(key: Column, buckets: int = SPLIT_BUCKETS) -> Column:
    """md5-derived bucket in [0, buckets): engine-portable, stable."""
    return (F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
            .cast("long") % buckets)


def with_split(df: DataFrame, key: str = "doc_id") -> DataFrame:
    b = _hash_bucket(F.col(key))
    return df.withColumn(
        "split",
        F.when(b < TEST_PCT, "test")
         .when(b < TEST_PCT + VAL_PCT, "val")
         .otherwise("train"))


def hash_sample(df: DataFrame, key: str, pct: int) -> DataFrame:
    """Deterministic ~pct% sample by content hash."""
    return df.filter(_hash_bucket(F.col(key)) < pct)


def dataset_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_rust_archive_spark.session import read_parallel
    d = read_parallel(spark, os.path.join(sf_dir, "documents.parquet"))
    base = (with_split(d)
            .groupBy("source", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars")))
    return (base
            .unionByName(stratified_sample_summary(spark, sf_dir))
            .unionByName(per_source_cap_summary(spark, sf_dir))
            .unionByName(mixture_sample_summary(spark, sf_dir))
            .orderBy("source", "split"))


STRATIFIED_TARGET = 50  # rebalance: ≈ this many docs kept per source


def stratified_sample_summary(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Stratified per-source sampling: rebalance skewed sources to
    ≈ STRATIFIED_TARGET docs each by keeping a per-source fraction of
    hash buckets (rate = target/count, capped at 1).

    Scale shape: one small per-source count (group cardinality = the
    source enum, bounded by construction → broadcast back), then a
    content-hash filter — the corpus itself never shuffles, and the
    same rows are kept on every engine, every run, at any parallelism
    (the reproducibility property engine RNG sampling can't give)."""
    from iceberg_rust_archive_spark.session import read_parallel
    d = read_parallel(spark, os.path.join(sf_dir, "documents.parquet"))
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    keep_buckets = F.least(
        F.lit(SPLIT_BUCKETS).cast("long"),
        F.ceil(F.lit(float(SPLIT_BUCKETS * STRATIFIED_TARGET))
               / F.col("n_src")))
    return (d.join(F.broadcast(counts), "source")
            .filter(_hash_bucket(F.col("doc_id")) < keep_buckets)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"))
            .select("source", F.lit("stratified").alias("split"),
                    "n_docs", "sum_chars"))


CAP_PER_SOURCE = 120  # per-domain document cap (CommonCrawl-style)


def per_source_cap_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps: keep at most CAP_PER_SOURCE docs per
    source, ranked by content hash — the per-domain cap every web-crawl
    pipeline applies so no single host dominates the corpus.

    Unlike the bucket-rate stratified branch (approximate counts), the
    rank cut is EXACT: ties broken by (md5(doc_id), doc_id) make the
    kept set deterministic on every engine. Scale shape: one window
    rank per source — the shuffle is by source; a skewed mega-source
    pays one partition's sort of CAP + its rows, and the standard
    mitigation (pre-filter with an over-admitting hash-bucket rate,
    then rank only the survivors) composes from the stratified branch
    above."""
    from pyspark.sql import Window
    from iceberg_rust_archive_spark.session import read_parallel
    d = read_parallel(spark, os.path.join(sf_dir, "documents.parquet"))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (d.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= CAP_PER_SOURCE)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"))
            .select("source", F.lit("capped").alias("split"),
                    "n_docs", "sum_chars"))


MIXTURE_BUDGET_FRAC = 0.4  # sampled mixture size vs the full corpus


def mixture_sample_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data-mixture sampling: draw a corpus whose per-source
    share follows an externally-specified mixture-weight table (the
    pretraining "data recipe" knob — here weights ∝ source index + 1, a
    deterministic stand-in for a quality-tier table). Per-source target
    = weight/Σweights × budget; kept rows = content-hash buckets below
    ceil(rate × buckets), so the draw is reproducible on any engine and
    adding data never reassigns kept rows.

    Scale shape: the weight/rate table has source-enum cardinality —
    one tiny aggregate broadcast back onto the corpus; the corpus scan
    itself never shuffles. A weight demanding MORE than a source has
    caps at rate 1 (upsampling is a repeat-factor column for the data
    loader, not a row-duplicating shuffle)."""
    from iceberg_rust_archive_spark.session import read_parallel
    d = read_parallel(spark, os.path.join(sf_dir, "documents.parquet"))
    idx = F.regexp_extract("source", "(\\d+)", 1).cast("double") + 1
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_src"), F.first(idx).alias("w"))
    tot = counts.agg(F.sum("n_src").alias("n_tot"),
                     F.sum("w").alias("w_tot"))
    # the rate expression is kept textually identical to the DuckDB
    # oracle's (same left-assoc multiply chain): IEEE doubles are
    # deterministic per expression SHAPE, and a different association
    # order could flip the ceil on an exact bucket boundary
    rates = (counts.crossJoin(F.broadcast(tot))  # enum-sized × 1 row
             .withColumn("keep_b", F.expr(
                 f"least(cast({SPLIT_BUCKETS} as bigint), "
                 f"ceil({SPLIT_BUCKETS} * (w / w_tot) "
                 f"* {MIXTURE_BUDGET_FRAC} * n_tot / n_src))"))
             .select("source", "keep_b"))
    return (d.join(F.broadcast(rates), "source")
            .filter(_hash_bucket(F.col("doc_id")) < F.col("keep_b"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"))
            .select("source", F.lit("mixture").alias("split"),
                    "n_docs", "sum_chars"))


ORACLE_SQL = {
    "dataset_split_summary": f"""
        WITH s AS (
          SELECT source, n_chars,
                 CASE WHEN b < {TEST_PCT} THEN 'test'
                      WHEN b < {TEST_PCT + VAL_PCT} THEN 'val'
                      ELSE 'train' END AS split
          FROM (
            SELECT source, n_chars,
                   ('0x' || md5(doc_id::VARCHAR)[1:8])::BIGINT
                     % {SPLIT_BUCKETS} AS b
            FROM documents
          )
        ),
        strat AS (
          SELECT d.source, d.n_chars
          FROM documents d
          JOIN (SELECT source, count(*) AS n_src
                FROM documents GROUP BY source) c USING (source)
          WHERE ('0x' || md5(doc_id::VARCHAR)[1:8])::BIGINT
                  % {SPLIT_BUCKETS}
                < least({SPLIT_BUCKETS},
                        ceil({float(SPLIT_BUCKETS * STRATIFIED_TARGET)}
                             / n_src))
        )
        SELECT source, split, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM s GROUP BY source, split
        UNION ALL
        SELECT source, 'stratified', count(*),
               CAST(sum(n_chars) AS BIGINT)
        FROM strat GROUP BY source
        UNION ALL
        SELECT source, 'capped', count(*),
               CAST(sum(n_chars) AS BIGINT)
        FROM (
          SELECT source, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5(doc_id::VARCHAR), doc_id)
                   AS rk
          FROM documents
        ) WHERE rk <= {CAP_PER_SOURCE}
        GROUP BY source
        UNION ALL
        SELECT source, 'mixture', count(*),
               CAST(sum(n_chars) AS BIGINT)
        FROM documents d
        JOIN (
          SELECT source,
                 least(CAST({SPLIT_BUCKETS} AS BIGINT),
                       ceil({SPLIT_BUCKETS} * (w / w_tot)
                            * {MIXTURE_BUDGET_FRAC} * n_tot / n_src))
                   AS keep_b
          FROM (SELECT source, count(*) AS n_src,
                       CAST(regexp_extract(source, '(\\d+)', 1) AS DOUBLE)
                         + 1 AS w
                FROM documents GROUP BY source) c,
               (SELECT count(*) AS n_tot FROM documents) t1,
               (SELECT sum(CAST(regexp_extract(source, '(\\d+)', 1)
                                AS DOUBLE) + 1) AS w_tot
                FROM (SELECT DISTINCT source FROM documents)) t2
        ) r USING (source)
        WHERE ('0x' || md5(doc_id::VARCHAR)[1:8])::BIGINT
                % {SPLIT_BUCKETS} < keep_b
        GROUP BY source
    """,
}
