"""Manifests, manifest lists, data files
(iceberg-rust-spec/src/spec/manifest.rs:38-560, manifest_list.rs:36-97).

The reference serializes these as Avro; we serialize as JSON-lines — the
information content (partition tuples, per-column bounds/counts, sequence
numbers, equality ids) is identical and is what both pruning levels and the
delete-merge planner consume. Bound values are stored JSON-native:
date → ISO string, timestamp → epoch micros int, decimal → string.
"""

from __future__ import annotations

from dataclasses import dataclass, field

CONTENT_DATA = 0
CONTENT_POSITION_DELETES = 1   # not supported (parity: README.md:35)
CONTENT_EQUALITY_DELETES = 2

STATUS_EXISTING = 0
STATUS_ADDED = 1
STATUS_DELETED = 2


@dataclass(frozen=True)
class DataFile:
    """manifest.rs:521-560 — one Parquet file plus harvested footer stats."""
    content: int
    file_path: str
    file_format: str
    partition: dict            # partition field name -> transformed value
    record_count: int
    file_size_in_bytes: int
    column_sizes: dict = field(default_factory=dict)        # field_id -> bytes
    value_counts: dict = field(default_factory=dict)        # field_id -> n
    null_value_counts: dict = field(default_factory=dict)   # field_id -> n
    nan_value_counts: dict = field(default_factory=dict)    # field_id -> n
    distinct_counts: dict = field(default_factory=dict)     # field_id -> n
    lower_bounds: dict = field(default_factory=dict)        # field_id -> value
    upper_bounds: dict = field(default_factory=dict)        # field_id -> value
    equality_ids: tuple[int, ...] | None = None
    split_offsets: tuple[int, ...] | None = None
    # v3 deletion-vector fields: a DV entry (content=1,
    # file_format='puffin') points INTO a Puffin file at a serialized
    # position bitmap for exactly one data file
    referenced_data_file: str | None = None
    content_offset: int | None = None
    content_size_in_bytes: int | None = None
    # v3 row lineage: the row id of this data file's FIRST row; row N
    # of the file has _row_id = first_row_id + N. Assigned at commit
    # time from table metadata's next-row-id (Transaction.commit), None
    # on delete files and on files written before the table became v3.
    first_row_id: int | None = None

    def to_json(self) -> dict:
        d = {"content": self.content, "file-path": self.file_path,
             "file-format": self.file_format, "partition": self.partition,
             "record-count": self.record_count,
             "file-size-in-bytes": self.file_size_in_bytes,
             "column-sizes": _k2s(self.column_sizes),
             "value-counts": _k2s(self.value_counts),
             "null-value-counts": _k2s(self.null_value_counts),
             "nan-value-counts": _k2s(self.nan_value_counts),
             "distinct-counts": _k2s(self.distinct_counts),
             "lower-bounds": _k2s(self.lower_bounds),
             "upper-bounds": _k2s(self.upper_bounds)}
        if self.equality_ids is not None:
            d["equality-ids"] = list(self.equality_ids)
        if self.split_offsets is not None:
            d["split-offsets"] = list(self.split_offsets)
        if self.referenced_data_file is not None:
            d["referenced-data-file"] = self.referenced_data_file
        if self.content_offset is not None:
            d["content-offset"] = self.content_offset
        if self.content_size_in_bytes is not None:
            d["content-size-in-bytes"] = self.content_size_in_bytes
        if self.first_row_id is not None:
            d["first-row-id"] = self.first_row_id
        return d

    @staticmethod
    def from_json(d: dict) -> "DataFile":
        return DataFile(
            d["content"], d["file-path"], d["file-format"], d["partition"],
            d["record-count"], d["file-size-in-bytes"],
            _s2k(d.get("column-sizes", {})), _s2k(d.get("value-counts", {})),
            _s2k(d.get("null-value-counts", {})),
            _s2k(d.get("nan-value-counts", {})),
            _s2k(d.get("distinct-counts", {})),
            _s2k(d.get("lower-bounds", {})), _s2k(d.get("upper-bounds", {})),
            tuple(d["equality-ids"]) if d.get("equality-ids") is not None else None,
            tuple(d["split-offsets"]) if d.get("split-offsets") is not None else None,
            d.get("referenced-data-file"), d.get("content-offset"),
            d.get("content-size-in-bytes"), d.get("first-row-id"),
        )


def _k2s(d: dict) -> dict:
    return {str(k): v for k, v in d.items()}


def _s2k(d: dict) -> dict:
    return {int(k): v for k, v in d.items()}


@dataclass(frozen=True)
class ManifestEntry:
    """manifest.rs:38-52 — status + sequence numbers + DataFile."""
    status: int
    data_file: DataFile
    snapshot_id: int | None = None
    sequence_number: int | None = None
    file_sequence_number: int | None = None

    def to_json(self) -> dict:
        return {"status": self.status, "snapshot-id": self.snapshot_id,
                "sequence-number": self.sequence_number,
                "file-sequence-number": self.file_sequence_number,
                "data-file": self.data_file.to_json()}

    @staticmethod
    def from_json(d: dict) -> "ManifestEntry":
        return ManifestEntry(d["status"], DataFile.from_json(d["data-file"]),
                             d.get("snapshot-id"), d.get("sequence-number"),
                             d.get("file-sequence-number"))


@dataclass(frozen=True)
class FieldSummary:
    """Per-partition-field bounds in a manifest-list entry
    (manifest_list.rs:60-97)."""
    contains_null: bool = False
    contains_nan: bool | None = None
    lower_bound: object = None
    upper_bound: object = None

    def to_json(self) -> dict:
        return {"contains-null": self.contains_null,
                "contains-nan": self.contains_nan,
                "lower-bound": self.lower_bound,
                "upper-bound": self.upper_bound}

    @staticmethod
    def from_json(d: dict) -> "FieldSummary":
        return FieldSummary(d.get("contains-null", False),
                            d.get("contains-nan"),
                            d.get("lower-bound"), d.get("upper-bound"))


@dataclass(frozen=True)
class ManifestListEntry:
    """manifest_list.rs:36-97 — pointer to a manifest + partition summaries."""
    manifest_path: str
    manifest_length: int
    partition_spec_id: int
    content: int               # 0=data, 1=deletes
    sequence_number: int
    min_sequence_number: int
    added_snapshot_id: int
    added_files_count: int = 0
    existing_files_count: int = 0
    deleted_files_count: int = 0
    added_rows_count: int = 0
    existing_rows_count: int = 0
    deleted_rows_count: int = 0
    partitions: tuple[FieldSummary, ...] = field(default_factory=tuple)
    # v3 row lineage: starting row id for this manifest's added data
    # files (data manifests of v3 tables only; files carry explicit
    # per-file values too, which always win on read)
    first_row_id: int | None = None

    def to_json(self) -> dict:
        return {"manifest-path": self.manifest_path,
                "manifest-length": self.manifest_length,
                "partition-spec-id": self.partition_spec_id,
                "content": self.content,
                "sequence-number": self.sequence_number,
                "min-sequence-number": self.min_sequence_number,
                "added-snapshot-id": self.added_snapshot_id,
                "added-files-count": self.added_files_count,
                "existing-files-count": self.existing_files_count,
                "deleted-files-count": self.deleted_files_count,
                "added-rows-count": self.added_rows_count,
                "existing-rows-count": self.existing_rows_count,
                "deleted-rows-count": self.deleted_rows_count,
                "partitions": [p.to_json() for p in self.partitions]}

    @staticmethod
    def from_json(d: dict) -> "ManifestListEntry":
        return ManifestListEntry(
            d["manifest-path"], d["manifest-length"], d["partition-spec-id"],
            d.get("content", 0), d["sequence-number"],
            d["min-sequence-number"], d["added-snapshot-id"],
            d.get("added-files-count", 0), d.get("existing-files-count", 0),
            d.get("deleted-files-count", 0), d.get("added-rows-count", 0),
            d.get("existing-rows-count", 0), d.get("deleted-rows-count", 0),
            tuple(FieldSummary.from_json(p) for p in d.get("partitions", [])))
