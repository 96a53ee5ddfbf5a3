"""Puffin statistics file format (Apache Iceberg Puffin spec).

Layout per the public spec (iceberg.apache.org/puffin-spec):

    Magic · Blob₁ … Blobₙ · Footer
    Footer = Magic · FooterPayload(JSON) · PayloadSize(i32 LE)
             · Flags(4 bytes) · Magic

FooterPayload is the UTF-8 JSON ``{"blobs": [BlobMetadata...],
"properties": {...}}``; each BlobMetadata carries ``type``, ``fields``
(source field ids), ``snapshot-id``, ``sequence-number``, ``offset``,
``length`` plus free-form ``properties`` (the ``ndv`` property is what
query engines read for cardinality without parsing blob bytes).

We write uncompressed payloads (flags = 0) and DataSketches-HLL blob
bytes produced by Spark's ``hll_sketch_agg`` — genuine
org.apache.datasketches binary images, so any DataSketches reader (and
Spark's ``hll_union``/``hll_sketch_estimate``) can consume them.

Reference parity note: the reference engine
(JanKaul/iceberg-rust_archive) does not implement Puffin; this extends
the spec surface the same way position deletes do.
"""

from __future__ import annotations

import json
import struct

from iceberg_rust_archive_spark.object_store import store_for

MAGIC = b"PFA1"
_CREATED_BY = "iceberg-rust-archive-spark"


def write_puffin(path: str, blobs: list[dict],
                 properties: dict | None = None) -> dict:
    """Write ``blobs`` (each ``{"type", "fields", "snapshot-id",
    "sequence-number", "payload": bytes, "properties": {...}}``) and
    return ``{"file-size-in-bytes", "file-footer-size-in-bytes",
    "blob-metadata": [...]}`` for the table-metadata statistics entry."""
    body = bytearray(MAGIC)
    blob_meta = []
    for b in blobs:
        payload = b["payload"]
        blob_meta.append({
            "type": b["type"],
            "fields": list(b.get("fields", [])),
            "snapshot-id": b.get("snapshot-id"),
            "sequence-number": b.get("sequence-number"),
            "offset": len(body),
            "length": len(payload),
            **({"properties": b["properties"]}
               if b.get("properties") else {}),
        })
        body += payload
    payload_json = json.dumps(
        {"blobs": blob_meta,
         "properties": {"created-by": _CREATED_BY,
                        **(properties or {})}},
        separators=(",", ":")).encode()
    footer = (MAGIC + payload_json
              + struct.pack("<i", len(payload_json))
              + b"\x00\x00\x00\x00" + MAGIC)
    data = bytes(body) + footer
    store_for(path).write_bytes(path, data)
    return {"file-size-in-bytes": len(data),
            "file-footer-size-in-bytes": len(footer),
            "blob-metadata": blob_meta}


def read_puffin(path: str) -> tuple[list[dict], dict]:
    """Return ``(blobs, file_properties)`` with each blob's metadata
    plus its ``payload`` bytes re-attached. Validates both magics and
    rejects compressed footers (we never write them)."""
    data = store_for(path).read_bytes(path)
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"{path}: not a Puffin file (bad magic)")
    flags = data[-8:-4]
    if flags[0] & 0x01:
        raise ValueError(f"{path}: compressed footer payload unsupported")
    (payload_len,) = struct.unpack("<i", data[-12:-8])
    payload = data[-12 - payload_len:-12]
    footer_magic_at = len(data) - 12 - payload_len - 4
    if data[footer_magic_at:footer_magic_at + 4] != MAGIC:
        raise ValueError(f"{path}: footer start magic missing")
    doc = json.loads(payload.decode())
    blobs = []
    for bm in doc.get("blobs", []):
        off, ln = bm["offset"], bm["length"]
        blobs.append({**bm, "payload": data[off:off + ln]})
    return blobs, doc.get("properties", {})
