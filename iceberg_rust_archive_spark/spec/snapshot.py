"""Snapshots and refs (iceberg-rust-spec/src/spec/snapshot.rs:34-297)."""

from __future__ import annotations

from dataclasses import dataclass, field

MAIN_BRANCH = "main"


@dataclass(frozen=True)
class Snapshot:
    snapshot_id: int
    sequence_number: int
    timestamp_ms: int
    manifest_list: str
    summary: dict = field(default_factory=dict)
    parent_snapshot_id: int | None = None
    schema_id: int | None = None
    # v3 row lineage: the row-id range [first_row_id, first_row_id +
    # added rows) this snapshot's new data files were assigned from
    first_row_id: int | None = None

    @property
    def operation(self) -> str:
        return self.summary.get("operation", "append")

    def to_json(self) -> dict:
        d = {"snapshot-id": self.snapshot_id,
             "sequence-number": self.sequence_number,
             "timestamp-ms": self.timestamp_ms,
             "manifest-list": self.manifest_list,
             "summary": self.summary}
        if self.parent_snapshot_id is not None:
            d["parent-snapshot-id"] = self.parent_snapshot_id
        if self.schema_id is not None:
            d["schema-id"] = self.schema_id
        if self.first_row_id is not None:
            d["first-row-id"] = self.first_row_id
        return d

    @staticmethod
    def from_json(d: dict) -> "Snapshot":
        return Snapshot(d["snapshot-id"], d.get("sequence-number", 0),
                        d["timestamp-ms"], d["manifest-list"],
                        d.get("summary", {}), d.get("parent-snapshot-id"),
                        d.get("schema-id"), d.get("first-row-id"))


@dataclass(frozen=True)
class SnapshotReference:
    """Branch/tag ref with retention (snapshot.rs:258-297)."""
    snapshot_id: int
    ref_type: str = "branch"  # branch | tag
    min_snapshots_to_keep: int | None = None
    max_snapshot_age_ms: int | None = None
    max_ref_age_ms: int | None = None

    def to_json(self) -> dict:
        d = {"snapshot-id": self.snapshot_id, "type": self.ref_type}
        if self.min_snapshots_to_keep is not None:
            d["min-snapshots-to-keep"] = self.min_snapshots_to_keep
        if self.max_snapshot_age_ms is not None:
            d["max-snapshot-age-ms"] = self.max_snapshot_age_ms
        if self.max_ref_age_ms is not None:
            d["max-ref-age-ms"] = self.max_ref_age_ms
        return d

    @staticmethod
    def from_json(d: dict) -> "SnapshotReference":
        return SnapshotReference(d["snapshot-id"], d.get("type", "branch"),
                                 d.get("min-snapshots-to-keep"),
                                 d.get("max-snapshot-age-ms"),
                                 d.get("max-ref-age-ms"))
