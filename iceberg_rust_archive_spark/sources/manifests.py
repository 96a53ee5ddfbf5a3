"""Manifest + manifest-list persistence (iceberg-rust/src/table/manifest.rs:155-499).

JSON-lines files under ``<location>/metadata/``:
- ``manifest-<uuid>.jsonl`` — one ManifestEntry per line
- ``snap-<snapshot_id>-<uuid>.manifestlist.jsonl`` — one ManifestListEntry/line

Metadata is small relative to data (one row per *file*, not per record), so
driver-side JSON is the right tradeoff at 100 TB too: a million-file table
is ~1M manifest rows ≈ hundreds of MB across manifests, and the two-level
structure means a pruned query only parses the manifests whose partition
ranges survive manifest-list pruning.
"""

from __future__ import annotations

import json
import os
import uuid

from iceberg_rust_archive_spark.spec.manifest import (
    FieldSummary, ManifestEntry, ManifestListEntry,
)


def write_manifest(metadata_dir: str, entries: list[ManifestEntry],
                   spec_id: int, content: int, snapshot_id: int,
                   sequence_number: int,
                   partition_field_names: list[str]) -> ManifestListEntry:
    """Write entries to a new manifest file and build its manifest-list row
    with per-partition-field FieldSummary bounds (manifest.rs:527+)."""
    os.makedirs(metadata_dir, exist_ok=True)
    path = os.path.join(metadata_dir, f"manifest-{uuid.uuid4().hex[:12]}.jsonl")
    with open(path, "w", encoding="utf-8") as f:
        for e in entries:
            f.write(json.dumps(e.to_json()) + "\n")

    summaries = []
    for name in partition_field_names:
        values = [e.data_file.partition.get(name) for e in entries
                  if e.status != 2]
        non_null = [v for v in values if v is not None]
        summaries.append(FieldSummary(
            contains_null=any(v is None for v in values),
            lower_bound=min(non_null) if non_null else None,
            upper_bound=max(non_null) if non_null else None))

    added = [e for e in entries if e.status == 1]
    existing = [e for e in entries if e.status == 0]
    min_seq = min((e.sequence_number for e in entries
                   if e.sequence_number is not None), default=sequence_number)
    return ManifestListEntry(
        manifest_path=path, manifest_length=os.path.getsize(path),
        partition_spec_id=spec_id, content=content,
        sequence_number=sequence_number, min_sequence_number=min_seq,
        added_snapshot_id=snapshot_id,
        added_files_count=len(added), existing_files_count=len(existing),
        added_rows_count=sum(e.data_file.record_count for e in added),
        existing_rows_count=sum(e.data_file.record_count for e in existing),
        partitions=tuple(summaries))


def read_manifest(path: str) -> list[ManifestEntry]:
    with open(path, encoding="utf-8") as f:
        return [ManifestEntry.from_json(json.loads(line))
                for line in f if line.strip()]


def write_manifest_list(metadata_dir: str, snapshot_id: int,
                        entries: list[ManifestListEntry]) -> str:
    os.makedirs(metadata_dir, exist_ok=True)
    path = os.path.join(
        metadata_dir, f"snap-{snapshot_id}-{uuid.uuid4().hex[:8]}"
        ".manifestlist.jsonl")
    with open(path, "w", encoding="utf-8") as f:
        for e in entries:
            f.write(json.dumps(e.to_json()) + "\n")
    return path


def read_manifest_list(path: str) -> list[ManifestListEntry]:
    with open(path, encoding="utf-8") as f:
        return [ManifestListEntry.from_json(json.loads(line))
                for line in f if line.strip()]
