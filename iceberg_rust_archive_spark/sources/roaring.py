"""Roaring-bitmap position serialization for deletion vectors.

Inner pages follow the public 32-bit RoaringFormatSpec "portable"
serialization (github.com/RoaringBitmap/RoaringFormatSpec): little-
endian cookie ``12346`` (no run containers), container count, a
(key, cardinality-1) descriptive header per container, an offset table,
then container data — ARRAY containers (≤ 4096 values, sorted u16) or
BITMAP containers (8 KiB fixed). Run containers are never written
(positions are arbitrary row ordinals; runs add little) but ARE
accepted on read for foreign files.

Positions are u64 row ordinals (Iceberg v3 deletion vectors), so pages
are bucketed by the high 32 bits with the framing
``u64 LE bucket-count · per bucket: u32 LE high-bits, u32 LE
byte-length, 32-bit portable page``. The inner pages are byte-exact
RoaringFormatSpec; the outer u64 framing is engine-pinned (the v3 blob
framing differs in byte order details across implementations — ours is
explicit, versioned by the Puffin blob type, and round-trip
property-tested). File ordinals in practice fit one bucket (< 2³²
rows/file), so the framing is 16 bytes of overhead.
"""

from __future__ import annotations

import struct

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE_RUN = 12347
_BITMAP_THRESHOLD = 4096  # array container above this cardinality


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


def _deserialize32(data: bytes) -> list[int]:
    cookie = struct.unpack_from("<I", data, 0)[0]
    run_bitset = b""
    if cookie & 0xFFFF == SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        off = 4
        run_bitset = data[off:off + (n + 7) // 8]
        off += (n + 7) // 8
    elif cookie == SERIAL_COOKIE_NO_RUN:
        n = struct.unpack_from("<I", data, 4)[0]
        off = 8
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
    return out


def serialize_positions(positions) -> bytes:
    """u64 position iterable → deletion-vector bytes (sorted, deduped)."""
    ps = sorted(set(int(p) for p in positions))
    buckets: dict[int, list[int]] = {}
    for p in ps:
        if p < 0 or p > 0xFFFFFFFFFFFFFFFF:
            raise ValueError(f"position out of u64 range: {p}")
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(buckets)))
    for high in sorted(buckets):
        page = _serialize32(buckets[high])
        out += struct.pack("<II", high, len(page))
        out += page
    return bytes(out)


def deserialize_positions(data: bytes) -> list[int]:
    (n_buckets,) = struct.unpack_from("<Q", data, 0)
    off = 8
    out: list[int] = []
    for _ in range(n_buckets):
        high, ln = struct.unpack_from("<II", data, off)
        off += 8
        out.extend((high << 32) | v
                   for v in _deserialize32(data[off:off + ln]))
        off += ln
    return out
