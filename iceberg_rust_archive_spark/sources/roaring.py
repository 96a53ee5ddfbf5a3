"""Roaring-bitmap position serialization for deletion vectors.

Inner pages follow the public 32-bit RoaringFormatSpec "portable"
serialization (github.com/RoaringBitmap/RoaringFormatSpec): little-
endian cookie ``12346`` (no run containers), container count, a
(key, cardinality-1) descriptive header per container, an offset table,
then container data — ARRAY containers (≤ 4096 values, sorted u16) or
BITMAP containers (8 KiB fixed). Run containers are never written
(positions are arbitrary row ordinals; runs add little) but ARE
accepted on read for foreign files.

Positions are u64 row ordinals (Iceberg v3 deletion vectors), stored in
the spec blob layout for the Puffin ``deletion-vector-v1`` blob type:

    u32 BE combined length of magic + vector
    4-byte magic sequence  D1 D3 39 64
    the vector: portable 64-bit roaring serialization
        (u64 LE count of 32-bit bitmaps · per bitmap: u32 LE high-bits
         key, then the standard 32-bit portable page — NO extra
         byte-length field; page extents derive from its own headers)
    u32 BE CRC checksum of magic + vector

The checksum is written as CRC-32C (Castagnoli, reflected poly
0x82F63B78) per the v3 blob description; on read we accept either
CRC-32C or zlib CRC-32 so blobs written by Delta-lineage writers (which
use ``java.util.zip.CRC32``) also verify. Blobs framed by this
engine's pre-r8 custom layout are still decoded via a magic-sniffing
fallback so existing tables keep reading.
"""

from __future__ import annotations

import struct
import zlib

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE_RUN = 12347
_BITMAP_THRESHOLD = 4096  # array container above this cardinality

DV_MAGIC = bytes((0xD1, 0xD3, 0x39, 0x64))

# CRC-32C (Castagnoli), reflected polynomial 0x82F63B78 — table-driven.
_CRC32C_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    tbl = _CRC32C_TABLE
    for b in data:
        c = tbl[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _serialize32(values: list[int]) -> bytes:
    """Portable 32-bit roaring bytes for sorted, deduped u32 values."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<II", SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset table: byte position of each container's data from start
    header_len = 8 + 4 * len(keys) + 4 * len(keys)
    offsets, pos = [], header_len
    bodies = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= _BITMAP_THRESHOLD:
            body = struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            body = bytes(bits)
        bodies.append(body)
        offsets.append(pos)
        pos += len(body)
    for o in offsets:
        out += struct.pack("<I", o)
    for b in bodies:
        out += b
    return bytes(out)


def _deserialize32(data: bytes, off: int = 0) -> tuple[list[int], int]:
    """Parse one standard 32-bit portable page at ``off``; return
    (values, offset-past-page) — page extent derives from its own
    headers, as the 64-bit portable framing requires."""
    cookie = struct.unpack_from("<I", data, off)[0]
    run_bitset = b""
    if cookie & 0xFFFF == SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        off += 4
        run_bitset = data[off:off + (n + 7) // 8]
        off += (n + 7) // 8
    elif cookie == SERIAL_COOKIE_NO_RUN:
        n = struct.unpack_from("<I", data, off + 4)[0]
        off += 8
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    headers = []
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", data, off)
        headers.append((k, cm1 + 1))
        off += 4
    has_offsets = cookie == SERIAL_COOKIE_NO_RUN or n >= 4
    if has_offsets:
        off += 4 * n  # we read sequentially; offsets are redundant
    out: list[int] = []
    for i, (k, card) in enumerate(headers):
        base = k << 16
        is_run = bool(run_bitset) and bool(run_bitset[i >> 3]
                                           & (1 << (i & 7)))
        if is_run:
            n_runs = struct.unpack_from("<H", data, off)[0]
            off += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", data, off)
                off += 4
                out.extend(base + start + j for j in range(length + 1))
        elif card <= _BITMAP_THRESHOLD:
            vals = struct.unpack_from(f"<{card}H", data, off)
            off += 2 * card
            out.extend(base + v for v in vals)
        else:
            bits = data[off:off + 8192]
            off += 8192
            for byte_i, byte in enumerate(bits):
                while byte:
                    low = byte & -byte
                    out.append(base + (byte_i << 3)
                               + low.bit_length() - 1)
                    byte &= byte - 1
    return out, off


def _serialize64(positions: list[int]) -> bytes:
    """Sorted, deduped u64 positions → portable 64-bit roaring bytes."""
    buckets: dict[int, list[int]] = {}
    for p in positions:
        if p < 0 or p > 0xFFFFFFFFFFFFFFFF:
            raise ValueError(f"position out of u64 range: {p}")
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(buckets)))
    for high in sorted(buckets):
        out += struct.pack("<I", high)
        out += _serialize32(buckets[high])
    return bytes(out)


def _deserialize64(data: bytes, off: int = 0,
                   end: int | None = None) -> list[int]:
    (n_buckets,) = struct.unpack_from("<Q", data, off)
    off += 8
    out: list[int] = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", data, off)
        vals, off = _deserialize32(data, off + 4)
        out.extend((high << 32) | v for v in vals)
    if end is not None and off != end:
        raise ValueError(f"deletion vector: {end - off} trailing bytes")
    return out


def serialize_positions(positions) -> bytes:
    """u64 position iterable → v3 ``deletion-vector-v1`` blob bytes
    (sorted, deduped): u32 BE len(magic+vector) · magic D1 D3 39 64 ·
    portable-64 roaring vector · u32 BE CRC-32(magic+vector). The
    checksum is plain zlib CRC-32 (java.util.zip.CRC32) per the v3
    Puffin DV layout (byte-compatible with Delta Lake DVs); CRC-32C
    is accepted on READ only, for blobs this engine wrote in r8."""
    ps = sorted(set(int(p) for p in positions))
    vector = _serialize64(ps)
    body = DV_MAGIC + vector
    return (struct.pack(">I", len(body)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))


def deserialize_positions(data: bytes) -> list[int]:
    """Decode a deletion-vector blob. Primary path is the v3 spec
    layout (magic-verified, CRC-checked against CRC-32C or zlib CRC-32);
    blobs written by this engine before r8 (u64 LE bucket count, per-
    bucket u32 byte-length framing, no magic/CRC) still decode via the
    legacy fallback."""
    if len(data) >= 12 and data[4:8] == DV_MAGIC:
        (body_len,) = struct.unpack_from(">I", data, 0)
        body = data[4:4 + body_len]
        if len(body) != body_len:
            raise ValueError("deletion vector: truncated blob")
        (crc,) = struct.unpack_from(">I", data, 4 + body_len)
        if crc not in (crc32c(body), zlib.crc32(body) & 0xFFFFFFFF):
            raise ValueError("deletion vector: checksum mismatch")
        return _deserialize64(data, off=8, end=4 + body_len)
    # legacy pre-r8 framing
    (n_buckets,) = struct.unpack_from("<Q", data, 0)
    off = 8
    out: list[int] = []
    for _ in range(n_buckets):
        high, ln = struct.unpack_from("<II", data, off)
        off += 8
        vals, _ = _deserialize32(data[off:off + ln])
        out.extend((high << 32) | v for v in vals)
        off += ln
    return out
