"""View and materialized-view metadata
(iceberg-rust-spec/src/spec/view_metadata.rs:50-449,
materialized_view_metadata.rs:27-63).

A view stores versioned SQL representations; an MV is a view plus the
identifier of a *storage table* and a ``RefreshState`` that records, per
source table, the snapshot id the storage table was last refreshed against.
The refresh state is stored as JSON in the storage-table snapshot summary
under key ``refresh-state`` (materialized_view_metadata.rs:24).
"""

from __future__ import annotations

import json
import time
import uuid as _uuid
from dataclasses import dataclass, field, replace

from iceberg_rust_archive_spark.spec.schema import Schema

REFRESH_STATE_KEY = "refresh-state"


@dataclass(frozen=True)
class ViewVersion:
    version_id: int
    schema_id: int
    timestamp_ms: int
    sql: str
    dialect: str = "spark"
    default_namespace: tuple[str, ...] = ()
    summary: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        return {"version-id": self.version_id, "schema-id": self.schema_id,
                "timestamp-ms": self.timestamp_ms,
                "summary": self.summary,
                "default-namespace": list(self.default_namespace),
                "representations": [{"type": "sql", "sql": self.sql,
                                     "dialect": self.dialect}]}

    @staticmethod
    def from_json(d: dict) -> "ViewVersion":
        rep = next(r for r in d["representations"] if r["type"] == "sql")
        return ViewVersion(d["version-id"], d["schema-id"], d["timestamp-ms"],
                           rep["sql"], rep.get("dialect", "spark"),
                           tuple(d.get("default-namespace", [])),
                           d.get("summary", {}))


@dataclass(frozen=True)
class ViewMetadata:
    view_uuid: str
    location: str
    versions: dict = field(default_factory=dict)   # version_id -> ViewVersion
    current_version_id: int = 1
    schemas: dict = field(default_factory=dict)    # schema_id -> Schema
    version_log: tuple = field(default_factory=tuple)
    properties: dict = field(default_factory=dict)
    format_version: int = 1

    def current_version(self) -> ViewVersion:
        return self.versions[self.current_version_id]

    @property
    def sql(self) -> str:
        return self.current_version().sql

    @staticmethod
    def new(location: str, sql: str, schema: Schema,
            properties: dict | None = None) -> "ViewMetadata":
        now = int(time.time() * 1000)
        ver = ViewVersion(1, schema.schema_id, now, sql)
        return ViewMetadata(
            view_uuid=str(_uuid.uuid4()), location=location.rstrip("/"),
            versions={1: ver}, current_version_id=1,
            schemas={schema.schema_id: schema},
            version_log=({"timestamp-ms": now, "version-id": 1},),
            properties=dict(properties or {}))

    def with_new_version(self, sql: str, schema: Schema) -> "ViewMetadata":
        now = int(time.time() * 1000)
        vid = max(self.versions) + 1
        ver = ViewVersion(vid, schema.schema_id, now, sql)
        versions = dict(self.versions)
        versions[vid] = ver
        schemas = dict(self.schemas)
        schemas[schema.schema_id] = schema
        return replace(self, versions=versions, current_version_id=vid,
                       schemas=schemas,
                       version_log=self.version_log + (
                           {"timestamp-ms": now, "version-id": vid},))

    def to_json(self) -> dict:
        return {"view-uuid": self.view_uuid, "location": self.location,
                "format-version": self.format_version,
                "versions": [v.to_json() for v in self.versions.values()],
                "current-version-id": self.current_version_id,
                "schemas": [s.to_json() for s in self.schemas.values()],
                "version-log": list(self.version_log),
                "properties": self.properties}

    @classmethod
    def from_json(cls, d: dict):
        versions = {v["version-id"]: ViewVersion.from_json(v)
                    for v in d["versions"]}
        schemas = {s["schema-id"]: Schema.from_json(s) for s in d["schemas"]}
        kwargs = dict(
            view_uuid=d["view-uuid"], location=d["location"],
            versions=versions, current_version_id=d["current-version-id"],
            schemas=schemas, version_log=tuple(d.get("version-log", [])),
            properties=d.get("properties", {}),
            format_version=d.get("format-version", 1))
        if cls is MaterializedViewMetadata:
            kwargs["storage_table"] = d["storage-table"]
        return cls(**kwargs)


@dataclass(frozen=True)
class SourceTableState:
    """(uuid, ref) -> snapshot_id (materialized_view_metadata.rs:40-63)."""
    uuid: str
    ref: str
    snapshot_id: int

    def to_json(self) -> dict:
        return {"uuid": self.uuid, "ref": self.ref,
                "snapshot-id": self.snapshot_id}

    @staticmethod
    def from_json(d: dict) -> "SourceTableState":
        return SourceTableState(d["uuid"], d["ref"], d["snapshot-id"])


@dataclass(frozen=True)
class RefreshState:
    refresh_version_id: int
    source_table_states: tuple[SourceTableState, ...] = ()

    def snapshot_for(self, uuid: str, ref: str = "main") -> int | None:
        for s in self.source_table_states:
            if s.uuid == uuid and s.ref == ref:
                return s.snapshot_id
        return None

    def to_json_str(self) -> str:
        return json.dumps({
            "refresh-version-id": self.refresh_version_id,
            "source-table-states": [s.to_json()
                                    for s in self.source_table_states]})

    @staticmethod
    def from_json_str(s: str) -> "RefreshState":
        d = json.loads(s)
        return RefreshState(d["refresh-version-id"],
                            tuple(SourceTableState.from_json(x)
                                  for x in d["source-table-states"]))


@dataclass(frozen=True)
class MaterializedViewMetadata(ViewMetadata):
    """View metadata + storage-table identifier
    (materialized_view_metadata.rs:27-47)."""
    storage_table: str = ""

    @staticmethod
    def new_mv(location: str, sql: str, schema: Schema, storage_table: str,
               properties: dict | None = None) -> "MaterializedViewMetadata":
        base = ViewMetadata.new(location, sql, schema, properties)
        return MaterializedViewMetadata(
            view_uuid=base.view_uuid, location=base.location,
            versions=base.versions, current_version_id=base.current_version_id,
            schemas=base.schemas, version_log=base.version_log,
            properties=base.properties, storage_table=storage_table)

    def to_json(self) -> dict:
        d = super().to_json()
        d["storage-table"] = self.storage_table
        return d
