"""Embedding quantization: int8 scalar quantization + error accounting.

Vector stores and ANN shards keep embeddings quantized (int8 symmetric:
``q = round(x * 127 / max|x|)``) and pay a small reconstruction error
for a 4x footprint cut. This operator computes, entirely with built-in
higher-order functions (zero Python in the hot path):

* per-vector scale   = 127 / max(|x|)            (symmetric, per-row)
* per-vector MAE     = mean |x - dequant(quant(x))|

and rolls both up per label. The elementwise pass is a single
``aggregate(transform(...))`` expression, so quantization error for a
100 TB embedding table is one scan with map-side partial aggregation —
no shuffle of the vectors themselves, only of the tiny per-label rows.

The DuckDB oracle mirrors the expression with ``list_transform`` /
``list_sum``; both engines reduce the element stream in list order, so
the doubles agree bit-for-bit before the final rounded rollup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SUM_ERR = (
    "aggregate(embedding, cast(0.0 as double), (a, x) -> a + "
    "abs(cast(x as double) - round(cast(x as double) * scale) / scale))")
_D_SUM_ERR = (
    "list_sum(list_transform(embedding, x -> "
    "abs(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) * scale) / scale)))")


def quantization_error(df: DataFrame) -> DataFrame:
    """Per-vector int8 quantization scale and reconstruction MAE."""
    amax = F.expr(
        "cast(array_max(transform(embedding, x -> abs(x))) as double)")
    out = df.withColumn("scale",
                        F.lit(127.0) / F.greatest(amax, F.lit(1e-12)))
    return (out.withColumn("sum_err", F.expr(_SUM_ERR))
            .withColumn("mae",
                        F.col("sum_err") / F.size("embedding"))
            .drop("sum_err"))


def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label rollup of quantization scale / error over embeddings."""
    from iceberg_rust_archive_spark.session import read_parallel
    e = read_parallel(spark, os.path.join(sf_dir, "embeddings.parquet"))
    return (quantization_error(e)
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.round(F.sum("mae"), 4).alias("sum_mae"),
                 F.round(F.sum("scale"), 2).alias("sum_scale"))
            .orderBy("label"))


ORACLE_SQL = {
    "embedding_quantization": f"""
        WITH q AS (
          SELECT label,
                 127.0 / greatest(CAST(list_max(list_transform(embedding,
                     x -> abs(x))) AS DOUBLE), 1e-12) AS scale,
                 embedding
          FROM embeddings
        ), err AS (
          SELECT label, scale,
                 {_D_SUM_ERR} / len(embedding) AS mae
          FROM q
        )
        SELECT label, count(*) AS n_vecs,
               round(sum(mae), 4) AS sum_mae,
               round(sum(scale), 2) AS sum_scale
        FROM err GROUP BY label ORDER BY label
    """,
}
