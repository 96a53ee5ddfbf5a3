"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the *decode* step is
stubbed (`decode_image` raises NotImplementedError unless PIL is
importable); everything around it — schema, batching, partitioning,
``mapInPandas`` signatures — is real and tested. The deterministic
fake featurizer (md5-derived) stands in for a real embedding model so
the pipeline is end-to-end testable and oracle-checkable.

Design for 100 TB of media:
- payloads ride in the DataFrame as ``binary`` — never hit the driver;
- ``mapInPandas`` streams Arrow batches through Python, so per-batch
  (not per-row) overhead; batch size via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` tuned down for
  large payloads;
- metadata (format, width, height, duration) lives in plain columns so
  filters on it prune *before* any Python decode runs;
- feature extraction emits fixed-width arrays → downstream similarity
  search (operators/similarity.py) without reshaping.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

FEATURE_DIM = 4

MEDIA_SCHEMA = StructType([
    StructField("item_id", LongType()),
    StructField("source", StringType()),
    StructField("media_format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("payload", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("item_id", LongType()),
    StructField("source", StringType()),
    StructField("payload_bytes", LongType()),
    StructField("feature", ArrayType(DoubleType())),
])


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from ``documents``: text bytes become
    the opaque payload, metadata derived deterministically. Stands in
    for `spark.read.parquet` over a real (binary, metadata) table."""
    from iceberg_rust_archive_spark.session import read_parallel
    d = read_parallel(spark, os.path.join(sf_dir, "documents.parquet"))
    return d.select(
        F.col("doc_id").alias("item_id"),
        "source",
        F.when(F.col("doc_id") % 3 == 0, "png")
         .when(F.col("doc_id") % 3 == 1, "jpeg")
         .otherwise("webp").alias("media_format"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
        F.encode("text", "utf-8").cast("binary").alias("payload"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real image decode. The execution container has no imaging
    libraries; plug PIL/pyvips here in production."""
    try:
        from PIL import Image  # noqa: F401
        import io
        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL; container has no imaging libs "
            "(deterministic fake featurizer used instead)") from exc


def fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic md5-derived feature vector: component k =
    int(md5(payload || k)[:8], 16) / 2^32 ∈ [0, 1)."""
    return [
        int(hashlib.md5(payload + bytes([k])).hexdigest()[:8], 16) / 2**32
        for k in range(dim)
    ]


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas featurizer: binary payload → fixed-width feature
    array. Arrow-batched; one Python roundtrip per batch."""
    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "item_id": pdf["item_id"],
                "source": pdf["source"],
                "payload_bytes": payloads.map(len).astype("int64"),
                "feature": payloads.map(fake_feature),
            })

    return df.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def sample_frames(payload: bytes, n_frames: int,
                  frame_size: int = 16) -> list[bytes]:
    """STUB-adjacent: deterministic frame sampling for "video" payloads
    — n equally-spaced fixed-size slices (real impl: pyav keyframes)."""
    if n_frames <= 0 or not payload:
        return []
    step = max(len(payload) // n_frames, 1)
    return [payload[i * step:i * step + frame_size]
            for i in range(min(n_frames, len(payload)))]


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline query: metadata-pruned decode pipeline. Filter on plain
    metadata columns first (no Python runs for pruned rows), featurize
    the survivors, summarize per source."""
    media = media_table(spark, sf_dir).filter(
        (F.col("media_format") != "webp") & (F.col("width") >= 64))
    feats = extract_features(media)
    return (feats
            .withColumn("f0", F.round(F.element_at("feature", 1), 4))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum("payload_bytes").alias("sum_payload_bytes"),
                 F.round(F.avg("f0"), 4).alias("avg_f0"))
            .orderBy("source"))


# DuckDB oracle: the fake featurizer is md5-based, so the pipeline is
# exactly reproducible in SQL. md5(text || chr(0)) == md5(payload+b'\0')
# because payload is the utf-8 encoding of text.
ORACLE_SQL = {
    "multimodal_features": """
        WITH media AS (
          SELECT doc_id AS item_id, source,
                 CASE WHEN doc_id % 3 = 0 THEN 'png'
                      WHEN doc_id % 3 = 1 THEN 'jpeg'
                      ELSE 'webp' END AS media_format,
                 doc_id % 640 + 32 AS width,
                 strlen(text) AS payload_bytes,
                 round(('0x' || md5(text || chr(0))[1:8])::BIGINT
                       / 4294967296.0, 4) AS f0
          FROM documents
        )
        SELECT source, count(*) AS n_items,
               CAST(sum(payload_bytes) AS BIGINT) AS sum_payload_bytes,
               round(avg(f0), 4) AS avg_f0
        FROM media
        WHERE media_format <> 'webp' AND width >= 64
        GROUP BY source
    """,
}
