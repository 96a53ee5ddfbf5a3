"""Minimal Avro Object Container File codec (pure Python, stdlib only).

Implements the subset of the Avro 1.x binary spec that Iceberg manifest
and manifest-list files use — null/boolean/int/long/double/string/bytes,
records, arrays, maps, and 2-branch unions — plus the OCF framing
(magic ``Obj\\x01``, file-metadata map carrying ``avro.schema``, 16-byte
sync marker, block framing). Written from the public Avro specification;
the container has no Python avro package, and metadata files are
driver-side and tiny (one row per data FILE), so a dependency-free codec
is the right weight. Interop is proven against the REFERENCE Java Avro
implementation (``avro-1.12.1.jar`` ships with Spark): see
tests/test_avro_interop.py, which reads these files back through
``org.apache.avro.file.DataFileReader`` via the Spark JVM gateway.

This is the repo's analog of the reference's Avro manifest encoding
(iceberg-rust/src/table/manifest.rs:155-499, manifest_list.rs:36-97).
"""

from __future__ import annotations

import io
import json
import os
import struct

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive encoders (Avro spec "Binary encoding")
# ---------------------------------------------------------------------------

def write_long(buf: io.BytesIO, n: int) -> None:
    """Variable-length zigzag (same for int and long)."""
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            break


def read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(read_long(buf))


# ---------------------------------------------------------------------------
# schema-driven datum codec
# ---------------------------------------------------------------------------

def _branch_index(schema: list, value) -> int:
    """Union branch for a python value (schemas here are [null, X])."""
    for i, s in enumerate(schema):
        t = s["type"] if isinstance(s, dict) else s
        if value is None and t == "null":
            return i
        if value is not None and t != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {schema}")


def write_datum(buf: io.BytesIO, schema, value) -> None:
    if isinstance(schema, list):                       # union
        i = _branch_index(schema, value)
        write_long(buf, i)
        write_datum(buf, schema[i], value)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "string":
        write_bytes(buf, str(value).encode("utf-8"))
    elif t == "bytes":
        write_bytes(buf, bytes(value))
    elif t == "record":
        for f in schema["fields"]:
            write_datum(buf, f["type"], value.get(f["name"]))
    elif t == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                write_datum(buf, schema["items"], item)
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                write_bytes(buf, str(k).encode("utf-8"))
                write_datum(buf, schema["values"], v)
        write_long(buf, 0)
    else:
        raise ValueError(f"unsupported avro type: {t}")


def read_datum(buf: io.BytesIO, schema):
    if isinstance(schema, list):                       # union
        return read_datum(buf, schema[read_long(buf)])
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "bytes":
        return read_bytes(buf)
    if t == "record":
        return {f["name"]: read_datum(buf, f["type"])
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:                  # block with byte-size prefix
                n = -n
                read_long(buf)
            for _ in range(n):
                out.append(read_datum(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                read_long(buf)
            for _ in range(n):
                k = read_bytes(buf).decode("utf-8")
                out[k] = read_datum(buf, schema["values"])
    raise ValueError(f"unsupported avro type: {t}")


# ---------------------------------------------------------------------------
# object container file
# ---------------------------------------------------------------------------

def write_ocf(path: str, schema: dict, records: list,
              metadata: dict | None = None) -> None:
    """Write records as a one-block, null-codec Avro OCF."""
    sync = os.urandom(16)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": b"null"}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")

    body = io.BytesIO()
    for r in records:
        write_datum(body, schema, r)
    payload = body.getvalue()

    buf = io.BytesIO()
    buf.write(MAGIC)
    write_datum(buf, {"type": "map", "values": "bytes"}, meta)
    buf.write(sync)
    if records:
        write_long(buf, len(records))
        write_long(buf, len(payload))
        buf.write(payload)
        buf.write(sync)
    from iceberg_rust_archive_spark.object_store import store_for
    store_for(path).write_bytes(path, buf.getvalue())


def read_ocf(path: str) -> tuple[dict, list]:
    """Read an Avro OCF → (writer schema, records). Null codec only."""
    from iceberg_rust_archive_spark.object_store import store_for
    buf = io.BytesIO(store_for(path).read_bytes(path))
    assert buf.read(4) == MAGIC, f"not an avro OCF: {path}"
    meta = read_datum(buf, {"type": "map", "values": "bytes"})
    codec = meta.get("avro.codec", b"null")
    assert codec in (b"null", b""), f"unsupported codec {codec!r}"
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = buf.read(16)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = read_long(buf)
        read_long(buf)                         # block byte size
        for _ in range(n):
            records.append(read_datum(buf, schema))
        assert buf.read(16) == sync, f"sync marker mismatch in {path}"
    return schema, records
