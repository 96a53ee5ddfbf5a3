"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

Decode reality levels (the container has no imaging/audio libraries):
- **REAL, stdlib-only**: WAV audio decode (``decode_wav`` →
  rate/duration/RMS/ZCR via ``wave`` + numpy, ``audio_features`` as the
  mapInPandas path) and image header decode (``image_dims`` → format +
  dimensions from PNG/GIF/BMP/JPEG bytes).
- **STUB**: pixel-level image decode (`decode_image` raises unless PIL
  is importable). The deterministic fake featurizer (md5-derived)
  stands in for a pixel-embedding model so the pipeline stays
  end-to-end testable and oracle-checkable.

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
    """STUB: full pixel decode. The execution container has no imaging
    libraries; plug PIL/pyvips here in production. Header-level decode
    (format + dimensions) IS real — see ``image_dims``."""
    try:
        from PIL import Image  # noqa: F401
        import io
        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "pixel decode requires PIL; container has no imaging libs "
            "(image_dims covers header metadata; deterministic fake "
            "featurizer stands in for pixel features)") from exc


def image_dims(payload: bytes):
    """REAL header decode, stdlib-only: (format, width, height) from
    PNG / GIF / BMP headers and JPEG SOF segments, or None. This is the
    trust-the-bytes-not-the-metadata step a crawled-media pipeline
    runs before any expensive pixel decode — corrupt or mislabeled
    payloads drop here."""
    import struct
    p = payload
    if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n" \
            and p[12:16] == b"IHDR":
        w, h = struct.unpack(">II", p[16:24])
        return ("png", w, h)
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", p[6:10])
        return ("gif", w, h)
    if len(p) >= 26 and p[:2] == b"BM":
        w, h = struct.unpack("<ii", p[18:26])
        return ("bmp", w, abs(h))  # negative h = top-down rows
    if len(p) >= 4 and p[:2] == b"\xff\xd8":      # JPEG: walk segments
        i = 2
        while i + 9 <= len(p) and p[i] == 0xFF:
            marker, seglen = p[i + 1], int.from_bytes(p[i + 2:i + 4],
                                                      "big")
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):   # SOFn
                h, w = struct.unpack(">HH", p[i + 5:i + 9])
                return ("jpeg", w, h)
            i += 2 + seglen
    return None


WAV_FEATURE_SCHEMA = StructType([
    StructField("item_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("duration_s", DoubleType()),
    StructField("rms", DoubleType()),
    StructField("zero_crossing_rate", DoubleType()),
])


def decode_wav(payload: bytes) -> dict:
    """REAL audio decode, stdlib-only (``wave`` + numpy): PCM WAV
    payload → sample rate, channels, duration, RMS (normalized to
    [0, 1] full scale), zero-crossing rate. The production swap-in for
    compressed formats is soundfile/ffmpeg — same return contract."""
    import io
    import wave

    import numpy as np
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, nch, width = w.getframerate(), w.getnchannels(), \
            w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    dtype = {1: np.int8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported sample width {width}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    full = float(2 ** (8 * width - 1))
    rms = float(np.sqrt(np.mean((x / full) ** 2))) if x.size else 0.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) \
        if x.size > 1 else 0.0
    return {"sample_rate": rate, "n_channels": nch,
            "duration_s": n / rate if rate else 0.0,
            "rms": rms, "zero_crossing_rate": zcr}


def audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas over (item_id, payload) WAV rows → WAV_FEATURE_SCHEMA
    rows. Undecodable payloads are dropped (the standard crawled-media
    posture: quarantine, don't fail the batch)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                try:
                    f = decode_wav(bytes(payload))
                except Exception:  # noqa: BLE001 — corrupt payload
                    continue
                out.append({"item_id": item_id, **f})
            yield pd.DataFrame(
                out, columns=[f.name for f in WAV_FEATURE_SCHEMA])

    return df.mapInPandas(run, schema=WAV_FEATURE_SCHEMA)


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
