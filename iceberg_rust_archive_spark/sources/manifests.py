"""Manifest + manifest-list persistence (iceberg-rust/src/table/manifest.rs:155-499).

Spec-format Avro files under ``<location>/metadata/`` (same encoding
family the reference writes — manifest.rs:155-499, manifest_list.rs:36-97):

- ``manifest-<uuid>.avro`` — ``manifest_entry`` records; the table
  schema JSON rides in the container metadata so column bounds
  (single-value binary serialization) are decodable by field id.
- ``snap-<snapshot_id>-<uuid>.avro`` — ``manifest_file`` records.

JSON-lines files written by earlier versions of this engine remain
readable (read functions dispatch on extension).

Metadata is small relative to data (one row per *file*, not per record),
so driver-side encoding is the right tradeoff at 100 TB too: a
million-file table is ~1M manifest rows across manifests, and the
two-level structure means a pruned query only parses the manifests whose
partition ranges survive manifest-list pruning.
"""

from __future__ import annotations

import json
import math
import os
import uuid

from iceberg_rust_archive_spark.object_store import store_for
from iceberg_rust_archive_spark.sources import manifest_avro as mavro
from iceberg_rust_archive_spark.sources.avro_io import read_ocf, write_ocf
from iceberg_rust_archive_spark.spec.manifest import (
    FieldSummary, ManifestEntry, ManifestListEntry,
)


def write_manifest(metadata_dir: str, entries: list[ManifestEntry],
                   spec_id: int, content: int, snapshot_id: int,
                   sequence_number: int,
                   partition_field_names: list[str],
                   schema_json: str | None = None) -> ManifestListEntry:
    """Write entries to a new Avro manifest file and build its
    manifest-list row with per-partition-field FieldSummary bounds
    (manifest.rs:527+)."""
    path = os.path.join(metadata_dir, f"manifest-{uuid.uuid4().hex[:12]}.avro")

    partitions = [e.data_file.partition for e in entries]
    pfields = mavro.partition_avro_fields(partition_field_names, partitions)
    schema = mavro.manifest_entry_schema(pfields)
    ftypes = dict(mavro.field_types_from_schema_json(schema_json))
    # NEW manifests encode decimal bounds per the spec's Appendix D
    # (minimal big-endian unscaled int); the tag in this file's own
    # bound-types metadata says so, keeping pre-r13 str-encoded
    # manifests on their legacy decode path (manifests are immutable)
    ftypes = {fid: ("decimal-binary" + t[len("decimal"):]
                    if t.startswith("decimal(") else t)
              for fid, t in ftypes.items()}
    # bound fields the schema doesn't cover (schema-less callers, dropped
    # columns): infer the encoding from the value and record it in the
    # container metadata so decode stays symmetric
    for e in entries:
        for k, v in {**e.data_file.lower_bounds,
                     **e.data_file.upper_bounds}.items():
            ftypes.setdefault(int(k), mavro._py_avro_type([v]))
    meta = {"format-version": "2",
            "content": "data" if content == 0 else "deletes",
            "partition-spec-id": str(spec_id),
            "bound-types": json.dumps(ftypes)}
    if schema_json:
        meta["schema"] = schema_json
    write_ocf(path, schema,
              [mavro.entry_to_avro(e, ftypes) for e in entries], meta)

    summaries = []
    for name in partition_field_names:
        values = [e.data_file.partition.get(name) for e in entries
                  if e.status != 2]
        non_null = [v for v in values if v is not None]
        # NaN float partition values: excluded from bounds (a NaN in
        # min()/max() poisons the comparison chain) and recorded in
        # contains_nan per the spec, which also lets the NaN-blind
        # pruning rule refute ``>``/``>=`` when provably NaN-free
        is_float = any(isinstance(v, float) for v in non_null)
        nan_seen = any(isinstance(v, float) and math.isnan(v)
                       for v in non_null)
        ordered = [v for v in non_null
                   if not (isinstance(v, float) and math.isnan(v))]
        summaries.append(FieldSummary(
            contains_null=any(v is None for v in values),
            contains_nan=(nan_seen if is_float else None),
            lower_bound=min(ordered) if ordered else None,
            upper_bound=max(ordered) if ordered else None))

    added = [e for e in entries if e.status == 1]
    existing = [e for e in entries if e.status == 0]
    min_seq = min((e.sequence_number for e in entries
                   if e.sequence_number is not None), default=sequence_number)
    return ManifestListEntry(
        manifest_path=path, manifest_length=store_for(path).size(path),
        partition_spec_id=spec_id, content=content,
        sequence_number=sequence_number, min_sequence_number=min_seq,
        added_snapshot_id=snapshot_id,
        added_files_count=len(added), existing_files_count=len(existing),
        added_rows_count=sum(e.data_file.record_count for e in added),
        existing_rows_count=sum(e.data_file.record_count for e in existing),
        partitions=tuple(summaries),
        # v3 row lineage: the manifest's starting row id (files carry
        # explicit per-file values, which win on read; this is the
        # manifest-level summary the spec's inheritance rule keys off)
        first_row_id=min((e.data_file.first_row_id for e in added
                          if e.data_file.first_row_id is not None),
                         default=None))


# Parsed-manifest LRU: manifest files are IMMUTABLE once written (uuid
# paths, never rewritten in place — a changed manifest is a NEW path),
# so caching parsed entries by path is always coherent. Repeated scans
# of the same snapshot — the steady state of an interactive session or
# a refresh loop — skip re-reading and re-decoding Avro entirely. The
# budget counts ManifestEntry objects, not manifests, so a 100 TB
# table's million-file metadata can't pin unbounded driver memory.
_MANIFEST_CACHE: "dict[str, list[ManifestEntry]]" = {}
_MANIFEST_CACHE_LOCK = None  # lazily a threading.Lock (thread fetcher)
_MANIFEST_CACHE_ENTRIES = 0
MANIFEST_CACHE_MAX_ENTRIES = 500_000


def _cache_lock():
    global _MANIFEST_CACHE_LOCK
    if _MANIFEST_CACHE_LOCK is None:
        import threading
        _MANIFEST_CACHE_LOCK = threading.Lock()
    return _MANIFEST_CACHE_LOCK


def read_manifest(path: str) -> list[ManifestEntry]:
    global _MANIFEST_CACHE_ENTRIES
    with _cache_lock():
        hit = _MANIFEST_CACHE.get(path)
    if hit is not None:
        return list(hit)  # shallow copy — callers may slice/extend
    entries = _read_manifest_uncached(path)
    with _cache_lock():
        if path not in _MANIFEST_CACHE:
            _MANIFEST_CACHE[path] = entries
            _MANIFEST_CACHE_ENTRIES += len(entries)
            while _MANIFEST_CACHE_ENTRIES > MANIFEST_CACHE_MAX_ENTRIES \
                    and _MANIFEST_CACHE:
                _k = next(iter(_MANIFEST_CACHE))  # FIFO eviction
                _MANIFEST_CACHE_ENTRIES -= len(_MANIFEST_CACHE.pop(_k))
    return list(entries)


def _read_manifest_uncached(path: str) -> list[ManifestEntry]:
    if path.endswith(".jsonl"):                      # pre-Avro files
        text = store_for(path).read_bytes(path).decode("utf-8")
        return [ManifestEntry.from_json(json.loads(line))
                for line in text.splitlines() if line.strip()]
    _schema, records = read_ocf(path)
    meta = _ocf_metadata(path)
    ftypes = mavro.field_types_from_schema_json(meta.get("schema"))
    ftypes.update({int(k): v for k, v in
                   json.loads(meta.get("bound-types", "{}")).items()})
    entries = [mavro.entry_from_avro(r, ftypes) for r in records]
    if meta.get("format-version") == "1":
        # V1 entries carry no sequence numbers; the V1→V2 migration rule
        # assigns 0 (manifest.rs try_from_v1 → None, read as 0 downstream)
        entries = [ManifestEntry(e.status, e.data_file, e.snapshot_id,
                                 e.sequence_number or 0,
                                 e.file_sequence_number or 0)
                   for e in entries]
    return entries


def _ocf_metadata(path: str) -> dict:
    """Container-file metadata map as str→str (schema JSON etc.)."""
    import io

    from iceberg_rust_archive_spark.sources.avro_io import MAGIC, read_datum
    buf = io.BytesIO(store_for(path).read_bytes(path))
    assert buf.read(4) == MAGIC
    raw = read_datum(buf, {"type": "map", "values": "bytes"})
    return {k: v.decode("utf-8") for k, v in raw.items()}


def _summary_types(entries: list[ManifestListEntry]) -> list[str]:
    """Avro/iceberg type name per partition-summary slot, from values."""
    width = max((len(e.partitions) for e in entries), default=0)
    out = []
    for i in range(width):
        vals = [b for e in entries if i < len(e.partitions)
                for b in (e.partitions[i].lower_bound,
                          e.partitions[i].upper_bound)]
        out.append(mavro._py_avro_type(vals))
    return out


def write_manifest_list(metadata_dir: str, snapshot_id: int,
                        entries: list[ManifestListEntry]) -> str:
    path = os.path.join(
        metadata_dir, f"snap-{snapshot_id}-{uuid.uuid4().hex[:8]}.avro")
    ptypes = _summary_types(entries)
    write_ocf(path, mavro.MANIFEST_LIST_SCHEMA,
              [mavro.mle_to_avro(e, ptypes) for e in entries],
              {"format-version": "2", "snapshot-id": str(snapshot_id),
               "partition-types": json.dumps(ptypes)})
    return path


# Manifest LISTS are immutable too (snap-<id>-<uuid> paths, one per
# committed snapshot), and every metadata consumer starts from one —
# scan planning, commit prepare (old_entries), maintenance sweeps, the
# changelog, and the eq-delete lossless-scoping check all re-read the
# SAME current list within a DML session. Entries are frozen
# dataclasses, so sharing cached objects is safe; the cache is bounded
# by total entry count like the manifest cache below.
_MLIST_CACHE: "dict[str, list[ManifestListEntry]]" = {}
_MLIST_CACHE_ENTRIES = 0
MLIST_CACHE_MAX_ENTRIES = 100_000


def read_manifest_list(path: str) -> list[ManifestListEntry]:
    global _MLIST_CACHE_ENTRIES
    with _cache_lock():
        hit = _MLIST_CACHE.get(path)
    if hit is not None:
        return list(hit)
    if path.endswith(".jsonl"):                      # pre-Avro files
        text = store_for(path).read_bytes(path).decode("utf-8")
        out = [ManifestListEntry.from_json(json.loads(line))
               for line in text.splitlines() if line.strip()]
    else:
        _schema, records = read_ocf(path)
        ptypes = json.loads(
            _ocf_metadata(path).get("partition-types", "[]"))
        out = [mavro.mle_from_avro(r, ptypes) for r in records]
    with _cache_lock():
        if path not in _MLIST_CACHE:
            while (_MLIST_CACHE_ENTRIES + len(out) > MLIST_CACHE_MAX_ENTRIES
                   and _MLIST_CACHE):
                _, old = _MLIST_CACHE.popitem()
                _MLIST_CACHE_ENTRIES -= len(old)
            _MLIST_CACHE[path] = out
            _MLIST_CACHE_ENTRIES += len(out)
    return list(out)


# Manifest fetch concurrency (the reference reads manifests as a
# flattened unordered concurrent stream — iceberg-rust/src/table/
# mod.rs:313-356). Serial loops are invisible locally but at thousands
# of manifests on object storage (~10ms+ RTT each) they add tens of
# seconds of driver dead time; shared by scan, commit-rebuild, and
# maintenance paths.
MANIFEST_READ_THREADS = 16


def read_manifests(paths: list[str]) -> list[list[ManifestEntry]]:
    """Fetch many manifests concurrently, preserving input order so
    pruning and plan construction stay deterministic."""
    if len(paths) <= 1:
        return [read_manifest(p) for p in paths]
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(
            max_workers=min(MANIFEST_READ_THREADS, len(paths))) as ex:
        return list(ex.map(read_manifest, paths))


def replace_touches_data(snapshot) -> bool:
    """True iff this 'replace' snapshot added or tombstoned DATA files
    — i.e. it rewrote table data (compaction / truncate / overwrite)
    and row-level history across it is not derivable. False means a
    DELETE-FILE-ONLY rewrite (rewrite_position_deletes converting
    parquet pairs → DVs): every data file carries over as an EXISTING
    entry at its original sequence, so the row multiset is unchanged
    and changelog / incremental consumers may skip the commit. An
    empty replace (truncate-to-empty) counts as touching data."""
    from iceberg_rust_archive_spark.spec.manifest import (
        CONTENT_DATA, STATUS_DELETED,
    )
    has_data = False
    for entries in read_manifests(
            [m.manifest_path
             for m in read_manifest_list(snapshot.manifest_list)]):
        for e in entries:
            if e.data_file.content != CONTENT_DATA:
                continue
            has_data = True
            if e.status == STATUS_DELETED \
                    or e.sequence_number == snapshot.sequence_number:
                return True
    return not has_data
