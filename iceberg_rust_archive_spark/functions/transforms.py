"""Iceberg partition transforms — value level and Spark-column level.

Semantics mirror the reference (iceberg-rust-spec/src/spec/values.rs:357-428
for value level; iceberg-rust/src/arrow/transform.rs:44-104 for the
vectorized write path):

- ``bucket[N]``  = ``(murmur3_x86_32(bytes, seed 0) & Integer.MAX_VALUE)
  % N`` per the Iceberg spec (Appendix B), with int/date WIDENED to
  8-byte LE before hashing (the spec hashes int 34 identically to long
  34); long/time/timestamp → 8-byte LE, string → UTF-8, decimal →
  minimal big-endian two's complement, uuid → 16B BE.
  REFERENCE DIVERGENCE (two, both silent-lost-rows for foreign
  readers): values.rs:112,116 serializes Int/Date as 4-byte LE (no
  widening) and values.rs:360-364 takes ``(hash % n)`` on the raw u32
  (no sign mask) — both off-spec vs Iceberg-java/pyiceberg, whose
  bucket probes on such a table would prune to the WRONG bucket. We
  follow the spec; Appendix B's published hash vectors pin it.
  Spark's builtin ``hash()`` uses seed 42 and different byte layouts, so it
  is NOT compatible; we implement murmur3 over the spec encoding in a
  pandas UDF.
- ``truncate[W]`` int  = ``v - v.rem_euclid(W)`` → Spark ``v - pmod(v, W)``;
  string = W-char prefix (values.rs:365-376).
- ``year``/``month``/``day``/``hour`` = offsets from epoch
  (values.rs:836-924): year→years since 1970, day→days since epoch,
  hour→hours since epoch, month→``12*(year-1970) + (month-1)`` — months
  since 1970-01, so 2023-05 → 640 and 1969-12 → -1.
  REFERENCE DIVERGENCE: the reference's ``datetime_to_months``
  (values.rs:857-861; arrow path transform.rs:122-124 agrees) omits the
  ``-1`` and yields 641 — off-by-one vs the Iceberg spec and Iceberg-java.
  We deliberately follow the SPEC: an independent reader (pyiceberg, Trino,
  Spark-Iceberg) of a month-partitioned table projects predicates into the
  spec's month space, and a writer in the reference's space would make that
  reader mis-prune and silently lose rows.

Column versions use built-in functions (whole-stage codegen) everywhere
except bucket, which needs the custom hash.
"""

from __future__ import annotations

import datetime as _dt
import struct
from decimal import Decimal

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from iceberg_rust_archive_spark.spec.partition import (
    _BUCKET_RE, _TRUNCATE_RE,
)

_EPOCH = _dt.date(1970, 1, 1)


def _exact_micros(naive_dt: _dt.datetime) -> int:
    """Naive-UTC datetime → epoch micros in EXACT integer arithmetic.
    ``total_seconds()*1e6`` / ``timestamp()*1e6`` round through float64,
    which is off by up to ~32µs beyond 2^53 µs (≈ year 2255) — the
    value-side twin of the ``_floor_div`` column fix."""
    td = naive_dt - _dt.datetime(1970, 1, 1)
    return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds


def _utc_naive(value):
    """tz-aware datetime → naive UTC. The spec defines every time
    transform on the UTC datetime of the instant (values.rs:836-924 goes
    through epoch micros); a tz-aware literal carrying any other offset
    must be normalized before field extraction, and ``replace(tzinfo=…)``
    on an aware value would silently discard its offset."""
    if isinstance(value, _dt.datetime) and value.tzinfo is not None:
        return value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return value


# --- murmur3_x86_32, seed 0 (matches Iceberg spec appendix B) -------------

def murmur3_32(data: bytes, seed: int = 0) -> int:
    c1, c2 = 0xCC9E2D51, 0x1B873593
    length = len(data)
    h = seed & 0xFFFFFFFF
    rounded = length & ~0x3
    for i in range(0, rounded, 4):
        k = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) | (data[i + 3] << 24)
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = length & 0x3
    if tail >= 3:
        k ^= data[rounded + 2] << 16
    if tail >= 2:
        k ^= data[rounded + 1] << 8
    if tail >= 1:
        k ^= data[rounded]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _single_value_bytes(value, iceberg_type: str) -> bytes:
    """Iceberg hash-input serialization (spec Appendix B): int and
    date WIDEN to 8-byte LE so ``hash(int 34) == hash(long 34)`` and a
    foreign engine's bucket probe lands in the same bucket;
    long/time/timestamp → 8-byte LE, string → UTF-8, decimal →
    minimal big-endian two's complement, uuid → 16 bytes,
    binary/fixed → raw.  (Reference divergence: values.rs:112,116
    packs Int/Date as i32 — off-spec, see module docstring.)"""
    t = iceberg_type
    if t == "int":
        return struct.pack("<q", int(value))  # spec: widen to long
    if t == "long":
        return struct.pack("<q", int(value))
    if t == "date":
        if isinstance(value, _dt.datetime):
            value = value.date()
        if isinstance(value, _dt.date):
            value = (value - _EPOCH).days
        return struct.pack("<q", int(value))  # spec: widen to long
    if t in ("time", "timestamp", "timestamptz"):
        if isinstance(value, _dt.datetime):
            value = _exact_micros(_utc_naive(value))
        return struct.pack("<q", int(value))
    if t == "string":
        return str(value).encode("utf-8")
    if t in ("binary",) or t.startswith("fixed"):
        return bytes(value)
    if t == "uuid":
        import uuid as _u
        return _u.UUID(str(value)).bytes
    if t.startswith("decimal"):
        unscaled = int(Decimal(str(value)).scaleb(
            int(t.split(",")[1].rstrip(")").strip())))
        length = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(length, "big", signed=True)
    raise TypeError(f"type {t!r} cannot be bucketed")


def bucket_value(value, n: int, iceberg_type: str):
    if value is None:
        return None
    h = murmur3_32(_single_value_bytes(value, iceberg_type))
    # spec: (hash & Integer.MAX_VALUE) % N — the sign-bit mask, NOT
    # unsigned mod (reference divergence: values.rs:362-364 mods the
    # raw u32, which disagrees whenever the hash's top bit is set)
    return (h & 0x7FFFFFFF) % n


def truncate_value(value, width: int, iceberg_type: str):
    if value is None:
        return None
    if iceberg_type in ("int", "long"):
        return value - (value % width)  # Python % == rem_euclid for positive w
    if iceberg_type == "string":
        return value[:width]
    if iceberg_type.startswith("decimal"):
        # spec: truncate applies to the UNSCALED value (transform.rs /
        # Iceberg spec Appendix B) — truncate[10] of 12.34 is 12.30
        # (unscaled 1234 → 1230), NOT 10 (r13 conformance fix; a
        # foreign reader computing the spec transform for pruning
        # literals would otherwise mismatch our stored tuples)
        scale = int(iceberg_type.split(",")[1].rstrip(")").strip())
        unscaled = int(Decimal(str(value)).scaleb(scale))
        return Decimal(unscaled - unscaled % width).scaleb(-scale)
    raise TypeError(f"truncate on {iceberg_type!r}")


def _to_date(value) -> _dt.date:
    if isinstance(value, _dt.datetime):
        return value.date()
    if isinstance(value, _dt.date):
        return value
    if isinstance(value, str):
        return _dt.date.fromisoformat(value[:10])
    # days-from-epoch int
    return _EPOCH + _dt.timedelta(days=int(value))


def transform_value(transform: str, value, iceberg_type: str):
    """Apply a transform to a single (driver-side) value — used for
    partition-predicate rewriting during pruning (A2) and for computing
    partition tuples of literals."""
    if value is None:
        return None
    value = _utc_naive(value)
    if transform == "identity":
        # spec-typed partition values: date → days from epoch,
        # timestamp[tz] → UTC epoch micros (what the write path stores
        # in partition tuples and what a foreign reader's typed probe
        # computes — ISO strings there would break its comparisons)
        if isinstance(value, _dt.datetime):
            return _exact_micros(value)
        if isinstance(value, _dt.date):
            return (value - _EPOCH).days
        return value
    if transform == "void":
        return None
    m = _BUCKET_RE.match(transform)
    if m:
        return bucket_value(value, int(m.group(1)), iceberg_type)
    m = _TRUNCATE_RE.match(transform)
    if m:
        return truncate_value(value, int(m.group(1)), iceberg_type)
    d = _to_date(value)
    if transform == "year":
        return d.year - 1970
    if transform == "month":
        # spec semantics: months since 1970-01 (reference divergence —
        # values.rs:857-861 omits the -1, off-by-one vs Iceberg-java)
        return (d.year - 1970) * 12 + d.month - 1
    if transform == "day":
        return (d - _EPOCH).days
    if transform == "hour":
        if not isinstance(value, _dt.datetime):
            value = _dt.datetime.combine(d, _dt.time())
        return _exact_micros(value) // 3_600_000_000
    raise ValueError(f"unknown transform {transform!r}")


# --- Spark column versions -------------------------------------------------

def _floor_div(c: Column, n: int) -> Column:
    """Exact floor(c / n) for long columns, staying in integer space.
    ``c / lit(n)`` promotes long/long to double, and a micros value one
    below a bucket boundary can round UP past ~2^53 (hour ordinals beyond
    roughly year 2900 land in the wrong partition).  ``pmod`` keeps the
    remainder non-negative, so subtracting it yields the exact floor
    multiple; the final divide runs in decimal space, which is exact."""
    exact = (c - F.pmod(c, F.lit(n))).cast("decimal(38,0)")
    return (exact / F.lit(n)).cast("int")


# Types whose spec hash input is the 8-byte-LE long widening (Appendix
# B: int/date widen to long; time/timestamp[tz] are already micros) —
# the vectorizable fast path. string/decimal/uuid/binary have
# variable-length encodings and keep the scalar path.
_LONG_HASH_TYPES = ("int", "long", "date", "time", "timestamp",
                    "timestamptz")


def _murmur3_32_long_le(vals: "np.ndarray") -> "np.ndarray":
    """Vectorized murmur3_x86_32 (seed 0) over the 8-byte-LE encoding
    of an int64 array — numpy uint32 lane ops, two 4-byte blocks, no
    tail. Wraps mod 2^32 exactly like the scalar ``murmur3_32``
    (pinned byte-for-byte by the Appendix B vectors and a hypothesis
    model in tests/test_spec.py). This replaces the last row-at-a-time
    Python loop on the bucketed-write hot path (r14 verdict #1);
    reference semantics anchor: iceberg-rust/src/arrow/transform.rs:
    44-104 vectorizes the same hash Arrow-side."""
    v = vals.astype(np.uint64, copy=False)  # two's complement == LE bytes
    c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
    h = np.zeros(len(v), dtype=np.uint32)
    for shift in (np.uint64(0), np.uint64(32)):
        k = ((v >> shift) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        k = k * c1
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * c2
        h ^= k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h ^= np.uint32(8)  # total byte length
    h ^= h >> np.uint32(16)
    h = h * np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h = h * np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h


# Variable-length vectorization guards: a batch whose padded matrix
# would blow past either bound keeps the scalar path (one pathological
# multi-KB doc in a batch of short ids must not allocate rows×maxlen).
_VARLEN_MAX_WIDTH = 1 << 12        # 4 KiB padded row width
_VARLEN_MAX_MATRIX = 1 << 26       # 64 MiB padded matrix per batch


def _murmur3_32_varlen(buf: "np.ndarray", offsets: "np.ndarray"):
    """Vectorized murmur3_x86_32 (seed 0) over RAGGED byte rows —
    ``buf[offsets[i]:offsets[i+1]]`` is row i. The rows scatter into a
    zero-padded (n × ⌈maxlen/4⌉·4) uint8 matrix viewed as LE uint32
    lanes; block j of every row mixes in one masked pass (rows shorter
    than 4j carry their already-final h through ``np.where``), then a
    masked tail pass handles the 1-3 trailing bytes. Byte-for-byte
    equal to the scalar ``murmur3_32`` (pinned by the Appendix B
    string/binary vectors and a hypothesis model) — this closes the
    last per-row-Python bucket path (r15 verdict #2): a bucket[N]
    write keyed on a string doc-id/URL now hashes each Arrow batch in
    numpy lane ops. Returns None when the batch's padded matrix would
    exceed the width/size guards (caller falls back to scalar).
    Reference semantics anchor: iceberg-rust-spec/src/spec/values.rs:
    360-364 (hash = murmur3 over the UTF-8/raw bytes)."""
    n = len(offsets) - 1
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    lengths = np.diff(offsets).astype(np.int64)
    max_len = int(lengths.max())
    width = max(4, (max_len + 3) & ~3)
    if width > _VARLEN_MAX_WIDTH or n * width > _VARLEN_MAX_MATRIX:
        return None
    flat = buf[offsets[0]:offsets[-1]]
    mat = np.zeros(n * width, dtype=np.uint8)
    if flat.size:
        # monotonic flat destinations + np.put: byte g of row i lands
        # at i*width + (g - rel[i]). np.put is ~40× faster than the
        # equivalent fancy-index scatter (measured 0.17s vs 7.5s on a
        # 1M×40MB batch — advanced indexing pays a per-element
        # translation np.put skips).
        rel = (offsets[:-1] - offsets[0]).astype(np.int64)
        shift = np.arange(n, dtype=np.int64) * width - rel
        dest = np.arange(flat.size, dtype=np.int64) + np.repeat(
            shift, lengths)
        np.put(mat, dest, flat)
    mat = mat.reshape(n, width)
    lanes = mat.view("<u4")
    c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
    h = np.zeros(n, dtype=np.uint32)
    nblocks = lengths // 4
    for j in range(width // 4):
        active = nblocks > j
        if not active.any():
            break
        k = lanes[:, j].copy()
        k *= c1
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k *= c2
        hx = h ^ k
        hx = (hx << np.uint32(13)) | (hx >> np.uint32(19))
        hx = hx * np.uint32(5) + np.uint32(0xE6546B64)
        h = np.where(active, hx, h)
    tail = lengths % 4
    has_tail = tail >= 1
    if has_tail.any():
        base = nblocks * 4
        ridx = np.arange(n, dtype=np.int64)

        def byte_at(off):
            # clip keeps the gather in-bounds for rows whose tail is
            # shorter; np.where discards the clipped reads
            return mat[ridx, np.minimum(base + off,
                                        width - 1)].astype(np.uint32)

        k = np.zeros(n, dtype=np.uint32)
        k = np.where(tail >= 3, k ^ (byte_at(2) << np.uint32(16)), k)
        k = np.where(tail >= 2, k ^ (byte_at(1) << np.uint32(8)), k)
        k = np.where(has_tail, k ^ byte_at(0), k).astype(np.uint32)
        k *= c1
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k *= c2
        h = np.where(has_tail, h ^ k, h)
    h = h ^ lengths.astype(np.uint32)
    h ^= h >> np.uint32(16)
    h *= np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h *= np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h


def _decimal_ragged_bytes(s: pd.Series, scale: int):
    """Decimal batch → ragged minimal big-endian two's-complement bytes
    of the UNSCALED values at the declared type scale (the spec's hash
    input — values.rs:360-364 hashes the twos-complement bytes).
    Ingests through Arrow decimal128 (C++-side conversion + exact
    rescale to the type scale), reverses the 16-byte LE storage to BE,
    and strips leading sign-redundant bytes with a vectorized
    cumprod — no per-row Python. None when Arrow can't ingest (mixed
    objects, >38 digits) — scalar path decides."""
    import pyarrow as pa
    try:
        arr = pa.Array.from_pandas(s, type=pa.decimal128(38, scale))
    except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError, TypeError,
            OverflowError):
        return None
    n = len(arr)
    mask = np.asarray(s.isna())
    if n == 0:
        return (np.zeros(0, dtype=np.uint8),
                np.zeros(1, dtype=np.int64), mask)
    data = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
    data = data[arr.offset * 16:(arr.offset + n) * 16]
    # 16-byte little-endian two's complement → big-endian per row
    be = data.reshape(n, 16)[:, ::-1].copy()
    be[mask] = 0  # null slots may carry garbage; normalize under mask
    # minimal signed length: drop leading 0x00 whose successor has a
    # clear sign bit / 0xFF whose successor has a set sign bit
    first, second = be[:, :-1], be[:, 1:]
    redundant = (((first == 0x00) & (second < 0x80))
                 | ((first == 0xFF) & (second >= 0x80)))
    lead = np.cumprod(redundant, axis=1, dtype=np.uint8).sum(
        axis=1).astype(np.int64)
    lengths = 16 - lead
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    row = np.repeat(np.arange(n, dtype=np.int64), lengths)
    within = (np.arange(offsets[-1], dtype=np.int64)
              - np.repeat(offsets[:-1], lengths))
    buf = be[row, np.repeat(lead, lengths) + within]
    return buf, offsets, mask


# ASCII hex digit → nibble; 0xFF marks a non-hex byte (whole-batch
# scalar fallback — the scalar path accepts every uuid.UUID spelling)
_HEX_LUT = np.full(256, 0xFF, dtype=np.uint8)
for _c in range(10):
    _HEX_LUT[ord("0") + _c] = _c
for _c in range(6):
    _HEX_LUT[ord("a") + _c] = 10 + _c
    _HEX_LUT[ord("A") + _c] = 10 + _c
_UUID_HYPHENS = np.array([8, 13, 18, 23], dtype=np.int64)
_UUID_HEX_COLS = np.setdiff1d(np.arange(36, dtype=np.int64),
                              _UUID_HYPHENS)


def _uuid_ragged_bytes(data: "np.ndarray", offsets: "np.ndarray",
                       mask: "np.ndarray"):
    """Canonical-form UUID strings (already ingested as UTF-8 ragged
    rows) → 16 raw bytes per row, the spec's uuid hash input. All
    non-null rows must be the 36-char hyphenated spelling with valid
    hex; anything else returns None and the scalar path (which accepts
    every ``uuid.UUID`` spelling — braces, urn:, no-hyphen) decides."""
    n = len(offsets) - 1
    if n == 0:
        return (np.zeros(0, dtype=np.uint8),
                np.zeros(1, dtype=np.int64), mask)
    lengths = np.diff(offsets)
    if not (lengths[~mask] == 36).all():
        return None
    starts = np.where(mask, np.int64(0), offsets[:-1] - offsets[0])
    flat = data[offsets[0]:offsets[-1]]
    if flat.size < 36:  # all-null / degenerate batch
        return None if (~mask).any() else (
            np.zeros(n * 16, dtype=np.uint8),
            np.arange(n + 1, dtype=np.int64) * 16, mask)
    starts = np.minimum(starts, flat.size - 36)
    mat = flat[starts[:, None] + np.arange(36, dtype=np.int64)]
    ok = ~mask
    if (mat[np.ix_(ok, _UUID_HYPHENS)] != ord("-")).any():
        return None
    nib = _HEX_LUT[mat[:, _UUID_HEX_COLS]]
    if (nib[ok] == 0xFF).any():
        return None
    by = ((nib[:, ::2] << np.uint8(4)) | nib[:, 1::2]).astype(np.uint8)
    by[mask] = 0
    return (by.reshape(-1),
            np.arange(n + 1, dtype=np.int64) * 16, mask)


def _series_to_ragged_bytes(s: pd.Series, iceberg_type: str):
    """pandas Series → ``(uint8 buffer, int64 offsets, null mask)`` in
    the spec's hash-input bytes for the variable-length carriers:
    string → UTF-8 (Arrow's native string representation IS the UTF-8
    bytes — zero per-row Python), binary/fixed → raw bytes, decimal →
    minimal big-endian two's complement of the unscaled value (Arrow
    decimal128 ingest + vectorized sign-byte strip), uuid → the 16 raw
    bytes (vectorized hex parse of the canonical spelling). None when
    Arrow can't ingest the batch or a row needs the permissive scalar
    parse — the caller falls back per batch, never per row."""
    import os
    if os.environ.get("ICEBERG_SPARK_DISABLE_VARLEN_BUCKET"):
        return None  # kill switch: forces the scalar reference path
    import pyarrow as pa
    if iceberg_type.startswith("decimal"):
        scale = int(iceberg_type.split(",")[1].rstrip(")").strip())
        return _decimal_ragged_bytes(s, scale)
    if iceberg_type in ("string", "uuid"):
        arrow_type = pa.large_string()
    elif iceberg_type == "binary" or iceberg_type.startswith("fixed"):
        arrow_type = pa.large_binary()
    else:
        return None
    try:
        arr = pa.Array.from_pandas(s, type=arrow_type)
    except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError, TypeError):
        return None  # mixed/unexpected objects — scalar path decides
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[
        arr.offset:arr.offset + len(arr) + 1]
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.zeros(0, dtype=np.uint8))
    mask = np.asarray(s.isna())
    if iceberg_type == "uuid":
        return _uuid_ragged_bytes(data, offsets, mask)
    return data, offsets, mask


def _series_to_long(s: pd.Series, iceberg_type: str):
    """pandas Series → ``(int64 ndarray, bool null-mask)`` in the
    spec's long hash carrier (epoch micros for timestamps, day
    ordinals for dates, the value itself for int/long/time) — or None
    when the dtype needs the scalar fallback. Arrow ships timestamps
    at ns (exact ×1000 of the µs values), so the ``// 1000`` here is
    lossless; NaT slots are zeroed under the mask before any
    arithmetic so int64-min never overflows."""
    dtype = s.dtype
    if pd.api.types.is_datetime64_any_dtype(dtype):
        idx = pd.DatetimeIndex(s)
        mask = np.asarray(idx.isna())
        raw = idx.asi8.copy()
        raw[mask] = 0
        unit = getattr(dtype, "unit", None) or np.datetime_data(dtype)[0]
        micros = {"ns": raw // 1_000, "us": raw,
                  "ms": raw * 1_000, "s": raw * 1_000_000}[unit]
        if iceberg_type == "date":
            return micros // 86_400_000_000, mask
        return micros, mask
    if dtype == object:
        if iceberg_type != "date":
            return None  # unexpected carrier — scalar path decides
        try:
            converted = pd.to_datetime(s, errors="coerce")
        except (TypeError, ValueError):
            return None
        got = _series_to_long(pd.Series(converted), "date")
        if got is not None and (
                got[1] != np.asarray(s.isna())).any():
            # a date outside datetime64[ns]'s range (sentinels like
            # 9999-12-31, or anything before 1677/after 2262) coerces
            # to NaT: bucketing it NULL would write a null partition
            # tuple for a real value — a spec reader pruning on
            # bucket(d)=k then silently loses the file. Scalar path.
            return None
        return got
    mask = np.asarray(s.isna())
    try:
        # float carrier (Spark ships nullable longs as float64 in some
        # Arrow paths): C cast truncates toward zero, same as the
        # scalar path's int(value)
        vals = s.fillna(0).to_numpy(dtype=np.int64)
    except (TypeError, ValueError):
        return None
    return vals, mask


def _bucket_long_pair_udf(n: int):
    """bucket[n] over a LONG carrier shipped as TWO float64-exact
    halves. Arrow→pandas converts a nullable int64 column to float64,
    which silently corrupts |v| > 2^53 BEFORE any kernel (vectorized or
    scalar) sees it — found by the write→scan property soak as a lost
    scoped equality delete: the null-carrying data batch hashed the
    corrupted value (bucket 2) while the null-free delete batch hashed
    the exact one (bucket 1), so the delete's partition scope never
    matched the data file. The JVM side ships ``shiftright(v, 32)``
    (|hi| < 2^31) and ``v & 0xFFFFFFFF`` (< 2^32), both exactly
    representable in float64 under any null-induced coercion; the
    kernel reassembles the two's-complement int64 exactly."""
    @pandas_udf(T.IntegerType())
    def _bucket(hi: pd.Series, lo: pd.Series) -> pd.Series:
        mask = np.asarray(hi.isna())
        hv = hi.fillna(0).to_numpy(dtype=np.int64)
        lv = lo.fillna(0).to_numpy(dtype=np.int64)
        vals = (hv << np.int64(32)) | lv
        h = _murmur3_32_long_le(vals)
        b = ((h & np.uint32(0x7FFFFFFF)) % np.uint32(n)).astype("int32")
        out = pd.array(b, dtype="Int32")
        out[mask] = pd.NA
        return pd.Series(out)
    return _bucket


def _bucket_udf(n: int, iceberg_type: str):
    @pandas_udf(T.IntegerType())
    def _bucket(s: pd.Series) -> pd.Series:
        h = mask = None
        if iceberg_type in _LONG_HASH_TYPES:
            conv = _series_to_long(s, iceberg_type)
            if conv is not None:
                vals, mask = conv
                h = _murmur3_32_long_le(vals)
        else:
            conv = _series_to_ragged_bytes(s, iceberg_type)
            if conv is not None:
                buf, offsets, mask = conv
                h = _murmur3_32_varlen(buf, offsets)  # None if too wide
        if h is not None:
            b = ((h & np.uint32(0x7FFFFFFF))
                 % np.uint32(n)).astype("int32")
            out = pd.array(b, dtype="Int32")
            out[mask] = pd.NA
            return pd.Series(out)
        def one(v):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                return None
            return bucket_value(v, n, iceberg_type)
        return s.map(one).astype("Int32")
    return _bucket


def transform_column(transform: str, col: Column | str,
                     iceberg_type: str = "long") -> Column:
    """Spark Column expression for a transform. All except bucket stay in
    whole-stage codegen (built-in functions only)."""
    c = F.col(col) if isinstance(col, str) else col
    if transform == "identity":
        return c
    if transform == "void":
        return F.lit(None)
    m = _BUCKET_RE.match(transform)
    if m:
        n = int(m.group(1))
        if iceberg_type == "timestamptz":
            # Arrow ships TimestampType to pandas as SESSION-zone naive
            # values, so hashing the datetime in the UDF bucketed the
            # wall time, not the instant (probed: 2023-06-01T12:30Z
            # bucketed 7≠31 under America/New_York). unix_micros is
            # timezone-free JVM-side, and the spec's timestamp hash
            # encoding (8-byte LE micros) is byte-identical to long —
            # so hash the micros as a long (split — see below).
            c = F.unix_micros(c)
            iceberg_type = "long"
        if iceberg_type == "long":
            # LONG carriers must not cross the Arrow→pandas boundary as
            # one column: a null in the batch coerces int64 → float64
            # and corrupts |v| > 2^53 (see _bucket_long_pair_udf).
            # int/time/date carriers are float64-exact (< 2^53) and
            # keep the single-column path.
            # Defensive cast (ADVICE r16): shiftright on an IntegerType
            # carrier masks the shift count mod 32 (Java semantics), so
            # hi would equal the raw value and the reassembled int64
            # garbage — current call sites cast to the table schema
            # first, but the signature accepts any Column.
            c = c.cast("long")
            return _bucket_long_pair_udf(n)(
                F.shiftright(c, 32),
                c.bitwiseAND(F.lit(0xFFFFFFFF)))
        return _bucket_udf(n, iceberg_type)(c)
    m = _TRUNCATE_RE.match(transform)
    if m:
        w = int(m.group(1))
        if iceberg_type == "string":
            return F.substring(c, 1, w)
        if iceberg_type.startswith("decimal"):
            # unscaled-space truncate expressed in value space: step is
            # W·10^-scale, keeping the decimal type (spec tuple value)
            scale = int(iceberg_type.split(",")[1].rstrip(")").strip())
            step = F.lit(Decimal(w).scaleb(-scale))
            return c - F.pmod(c, step)
        return (c - F.pmod(c, F.lit(w))).cast("long")
    if iceberg_type == "timestamptz" and transform in (
            "year", "month", "day", "hour"):
        # Spec: time transforms on timestamptz apply to the UTC datetime
        # of the instant (values.rs:836-924 goes through epoch micros).
        # F.year/F.month/F.to_date extract SESSION-timezone fields from
        # a TimestampType instant, so a non-UTC session would write
        # non-conformant partition tuples (probed: 2023-01-01T02:00Z in
        # an America/New_York session yields year=2022, month=12).
        # Epoch arithmetic is timezone-free and DST-exact; date_add on
        # the day ordinal recovers calendar fields for year/month.
        micros = F.unix_micros(c)
        if transform == "hour":
            return _floor_div(micros, 3_600_000_000)
        days = _floor_div(micros, 86_400_000_000)
        if transform == "day":
            return days
        utc_date = F.date_add(F.lit(_EPOCH), days)
        if transform == "year":
            return (F.year(utc_date) - F.lit(1970)).cast("int")
        # month: spec semantics, months since 1970-01 (reference
        # divergence — transform.rs:122-124 omits the -1)
        return ((F.year(utc_date) - F.lit(1970)) * 12
                + F.month(utc_date) - F.lit(1)).cast("int")
    if transform == "year":
        return (F.year(c) - F.lit(1970)).cast("int")
    if transform == "month":
        # spec semantics, months since 1970-01 (reference divergence —
        # transform.rs:122-124 omits the -1)
        return ((F.year(c) - F.lit(1970)) * 12
                + F.month(c) - F.lit(1)).cast("int")
    if transform == "day":
        return F.datediff(F.to_date(c), F.lit("1970-01-01")).cast("int")
    if transform == "hour":
        # field arithmetic, not unix_timestamp: TIMESTAMP_NTZ fields are
        # the spec's local datetime and never consult a timezone.
        return (F.datediff(F.to_date(c), F.lit("1970-01-01")) * 24
                + F.hour(c)).cast("int")
    raise ValueError(f"unknown transform {transform!r}")
