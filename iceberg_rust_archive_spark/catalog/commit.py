"""Spec-conformant table-commit bodies (Iceberg REST protocol).

Mirrors iceberg-rust/src/catalog/commit.rs:94-372: a commit is a list of
**requirements** (assertions about the metadata the writer based its
changes on) plus a list of **updates** (the delta to apply atomically).
The client builds both from (base, new) metadata; a service validates
the requirements against its *current* metadata — rejecting with 409 on
any mismatch — then applies the updates and persists the result. This is
exactly how Polaris/Lakekeeper/Tabular implement the protocol, so a
client speaking these bodies can commit against a real Iceberg REST
service (the reference's cross-engine interop story,
datafusion_iceberg/tests/integration_trino.rs).

Wire format follows the Iceberg REST OpenAPI shapes: requirements are
tagged with ``type`` and updates with ``action``, all kebab-case —
matching the serde attributes on the reference's enums
(commit.rs:88-93 ``tag = "action", rename_all = "kebab-case"``).
"""

from __future__ import annotations

from dataclasses import replace as _dc_replace

from iceberg_rust_archive_spark.spec.partition import PartitionSpec
from iceberg_rust_archive_spark.spec.schema import Schema
from iceberg_rust_archive_spark.spec.snapshot import (
    Snapshot, SnapshotReference,
)
from iceberg_rust_archive_spark.spec.sort import SortOrder
from iceberg_rust_archive_spark.spec.table_metadata import TableMetadata
from iceberg_rust_archive_spark.spec.view_metadata import (
    MaterializedViewMetadata, ViewMetadata, ViewVersion,
)


def build_table_requirements(base: TableMetadata,
                             new: TableMetadata) -> list[dict]:
    """Assertions a conflicting writer would violate (commit.rs:198-246):
    the table uuid, plus — for every ref this commit moves — the ref's
    snapshot id as the writer last saw it (``assert-ref-snapshot-id``
    with null = the ref must not exist yet, per the REST spec)."""
    reqs: list[dict] = [
        {"type": "assert-table-uuid", "uuid": base.table_uuid}]
    for name in sorted(new.refs):
        old = base.refs.get(name)
        if old is None or old != new.refs[name]:
            reqs.append({"type": "assert-ref-snapshot-id", "ref": name,
                         "snapshot-id":
                             old.snapshot_id if old is not None else None})
    # refs this commit REMOVES also need their last-seen assertion — a
    # concurrent writer advancing the ref must 409, not be clobbered
    for name in sorted(base.refs):
        if name not in new.refs:
            reqs.append({"type": "assert-ref-snapshot-id", "ref": name,
                         "snapshot-id": base.refs[name].snapshot_id})
    return reqs


def build_table_updates(base: TableMetadata,
                        new: TableMetadata) -> list[dict]:
    """The (base → new) delta as spec update actions, in an order a
    server can apply sequentially (schemas before the snapshots that
    reference them, snapshots before the refs that point at them)."""
    ups: list[dict] = []
    for sid in sorted(new.schemas):
        if sid not in base.schemas:
            ups.append({"action": "add-schema",
                        "schema": new.schemas[sid].to_json(),
                        "last-column-id": new.last_column_id})
    if new.current_schema_id != base.current_schema_id:
        ups.append({"action": "set-current-schema",
                    "schema-id": new.current_schema_id})
    for pid in sorted(new.partition_specs):
        if pid not in base.partition_specs:
            ups.append({"action": "add-spec",
                        "spec": new.partition_specs[pid].to_json()})
    if new.default_spec_id != base.default_spec_id:
        ups.append({"action": "set-default-spec",
                    "spec-id": new.default_spec_id})
    for oid in sorted(new.sort_orders):
        if oid not in base.sort_orders:
            ups.append({"action": "add-sort-order",
                        "sort-order": new.sort_orders[oid].to_json()})
    if new.default_sort_order_id != base.default_sort_order_id:
        ups.append({"action": "set-default-sort-order",
                    "sort-order-id": new.default_sort_order_id})
    removed = sorted(s for s in base.snapshots if s not in new.snapshots)
    if removed:
        ups.append({"action": "remove-snapshots", "snapshot-ids": removed})
    for sid in sorted(new.snapshots):
        if sid not in base.snapshots:
            ups.append({"action": "add-snapshot",
                        "snapshot": new.snapshots[sid].to_json()})
    for name in sorted(new.refs):
        if base.refs.get(name) != new.refs[name]:
            ups.append({"action": "set-snapshot-ref", "ref-name": name,
                        **new.refs[name].to_json()})
    for name in sorted(base.refs):
        if name not in new.refs:
            ups.append({"action": "remove-snapshot-ref", "ref-name": name})
    props = {k: v for k, v in new.properties.items()
             if base.properties.get(k) != v}
    if props:
        ups.append({"action": "set-properties", "updates": props})
    gone = sorted(k for k in base.properties if k not in new.properties)
    if gone:
        ups.append({"action": "remove-properties", "removals": gone})
    if new.location != base.location:
        ups.append({"action": "set-location", "location": new.location})
    return ups


def check_table_requirements(requirements: list[dict],
                             current: TableMetadata) -> str | None:
    """Validate requirements against current metadata; returns None when
    all hold, else a human-readable reason (commit.rs:343-372 — every
    variant; null snapshot-id additionally means "ref must not exist",
    the REST-spec semantics the Rust i64 cannot express)."""
    for r in requirements:
        t = r.get("type")
        if t == "assert-create":
            continue  # existence is the route's concern (commit.rs:349)
        if t == "assert-table-uuid":
            if current.table_uuid != r.get("uuid"):
                return f"table uuid is {current.table_uuid}"
        elif t == "assert-ref-snapshot-id":
            ref = current.refs.get(r.get("ref"))
            want = r.get("snapshot-id")
            if want is None:
                if ref is not None:
                    return f"ref {r.get('ref')!r} already exists"
            elif ref is None or ref.snapshot_id != want:
                have = ref.snapshot_id if ref else None
                return f"ref {r.get('ref')!r} is at {have}, not {want}"
        elif t == "assert-last-assigned-field-id":
            if current.last_column_id != r.get("last-assigned-field-id"):
                return f"last-column-id is {current.last_column_id}"
        elif t == "assert-current-schema-id":
            if current.current_schema_id != r.get("current-schema-id"):
                return f"current-schema-id is {current.current_schema_id}"
        elif t == "assert-last-assigned-partition-id":
            if current.last_partition_id != r.get(
                    "last-assigned-partition-id"):
                return f"last-partition-id is {current.last_partition_id}"
        elif t == "assert-default-spec-id":
            if current.default_spec_id != r.get("default-spec-id"):
                return f"default-spec-id is {current.default_spec_id}"
        elif t == "assert-default-sort-order-id":
            if current.default_sort_order_id != r.get(
                    "default-sort-order-id"):
                return ("default-sort-order-id is "
                        f"{current.default_sort_order_id}")
        else:
            return f"unknown requirement type {t!r}"
    return None


def apply_table_updates(md: TableMetadata,
                        updates: list[dict]) -> TableMetadata:
    """Apply update actions in order (commit.rs:416-484): add-snapshot
    also appends the snapshot log and advances last-sequence-number,
    exactly as the reference's AddSnapshot arm does."""
    for u in updates:
        a = u.get("action")
        if a == "assign-uuid":
            md = _dc_replace(md, table_uuid=u["uuid"])
        elif a == "upgrade-format-version":
            md = _dc_replace(md, format_version=int(u["format-version"]))
        elif a == "add-schema":
            s = Schema.from_json(u["schema"])
            schemas = dict(md.schemas)
            schemas[s.schema_id] = s
            lc = u.get("last-column-id")
            md = _dc_replace(
                md, schemas=schemas,
                last_column_id=lc if lc is not None
                else max(md.last_column_id, s.highest_field_id()))
        elif a == "set-current-schema":
            md = _dc_replace(md, current_schema_id=int(u["schema-id"]))
        elif a in ("add-spec", "add-partition-spec"):
            p = PartitionSpec.from_json(u["spec"])
            specs = dict(md.partition_specs)
            specs[p.spec_id] = p
            md = _dc_replace(
                md, partition_specs=specs,
                last_partition_id=max(
                    [md.last_partition_id]
                    + [f.field_id for f in p.fields]))
        elif a == "set-default-spec":
            md = _dc_replace(md, default_spec_id=int(u["spec-id"]))
        elif a == "add-sort-order":
            o = SortOrder.from_json(u["sort-order"])
            orders = dict(md.sort_orders)
            orders[o.order_id] = o
            md = _dc_replace(md, sort_orders=orders)
        elif a == "set-default-sort-order":
            md = _dc_replace(md,
                             default_sort_order_id=int(u["sort-order-id"]))
        elif a == "add-snapshot":
            snap = Snapshot.from_json(u["snapshot"])
            snaps = dict(md.snapshots)
            snaps[snap.snapshot_id] = snap
            md = _dc_replace(
                md, snapshots=snaps,
                snapshot_log=md.snapshot_log + (
                    {"timestamp-ms": snap.timestamp_ms,
                     "snapshot-id": snap.snapshot_id},),
                last_sequence_number=max(md.last_sequence_number,
                                         snap.sequence_number),
                last_updated_ms=snap.timestamp_ms)
        elif a == "set-snapshot-ref":
            refs = dict(md.refs)
            refs[u["ref-name"]] = SnapshotReference.from_json(u)
            md = _dc_replace(md, refs=refs)
        elif a == "remove-snapshot-ref":
            refs = dict(md.refs)
            refs.pop(u["ref-name"], None)
            md = _dc_replace(md, refs=refs)
        elif a == "remove-snapshots":
            gone = set(u.get("snapshot-ids", ()))
            md = _dc_replace(
                md,
                snapshots={k: v for k, v in md.snapshots.items()
                           if k not in gone},
                snapshot_log=tuple(e for e in md.snapshot_log
                                   if e["snapshot-id"] not in gone))
        elif a == "set-location":
            md = _dc_replace(md, location=u["location"])
        elif a == "set-properties":
            props = dict(md.properties)
            props.update(u.get("updates", {}))
            md = _dc_replace(md, properties=props)
        elif a == "remove-properties":
            props = {k: v for k, v in md.properties.items()
                     if k not in set(u.get("removals", ()))}
            md = _dc_replace(md, properties=props)
        else:
            raise ValueError(f"unknown update action {a!r}")
    return md


def table_metadata_from_create(body: dict) -> TableMetadata:
    """Server-side CreateTableRequest materialization (the service's half
    of catalog.rs:300-318): the *server* assigns the table uuid and
    builds the initial metadata document from the request's schema /
    partition-spec / write-order."""
    schema = Schema.from_json(body["schema"])
    spec = PartitionSpec.from_json(body["partition-spec"]) \
        if body.get("partition-spec") else None
    order = SortOrder.from_json(body["write-order"]) \
        if body.get("write-order") else None
    return TableMetadata.new(body["location"], schema, spec, order,
                             body.get("properties"))


# --- views (CommitView<T>, commit.rs:67-73,262-320,391-397,515-552) ------

def _version_wire(md: ViewMetadata, ver: ViewVersion) -> dict:
    """Version<T> wire shape: MVs inline the storage-table identifier in
    the version (view_metadata.rs:307-336 ``storage_table: T``,
    skip-serialized when None)."""
    d = ver.to_json()
    if isinstance(md, MaterializedViewMetadata):
        d["storage-table"] = md.storage_table
    return d


def build_view_requirements(base: ViewMetadata) -> list[dict]:
    """AssertViewUuid is the only spec view requirement
    (commit.rs:323-330)."""
    return [{"type": "assert-view-uuid", "uuid": base.view_uuid}]


def build_view_updates(base: ViewMetadata,
                       new: ViewMetadata) -> list[dict]:
    """(base → new) delta as ViewUpdate actions (commit.rs:262-320)."""
    ups: list[dict] = []
    for sid in sorted(new.schemas):
        if sid not in base.schemas:
            ups.append({"action": "add-schema",
                        "schema": new.schemas[sid].to_json(),
                        "last-column-id": None})
    for vid in sorted(new.versions):
        if vid not in base.versions:
            ups.append({"action": "add-view-version",
                        "view-version":
                            _version_wire(new, new.versions[vid])})
    if new.current_version_id != base.current_version_id:
        ups.append({"action": "set-current-view-version",
                    "view-version-id": new.current_version_id})
    props = {k: v for k, v in new.properties.items()
             if base.properties.get(k) != v}
    if props:
        ups.append({"action": "set-properties", "updates": props})
    gone = sorted(k for k in base.properties if k not in new.properties)
    if gone:
        ups.append({"action": "remove-properties", "removals": gone})
    if new.location != base.location:
        ups.append({"action": "set-location", "location": new.location})
    return ups


def check_view_requirements(requirements: list[dict],
                            current: ViewMetadata) -> str | None:
    """commit.rs:391-397: AssertViewUuid is the whole check."""
    for r in requirements:
        t = r.get("type")
        if t == "assert-view-uuid":
            if current.view_uuid != r.get("uuid"):
                return f"view uuid is {current.view_uuid}"
        else:
            return f"unknown view requirement type {t!r}"
    return None


def apply_view_updates(md: ViewMetadata,
                       updates: list[dict]) -> ViewMetadata:
    """Apply ViewUpdate actions in order (commit.rs:515-552);
    SetCurrentViewVersion with -1 selects the last-added version, per the
    spec comment on the enum."""
    for u in updates:
        a = u.get("action")
        if a == "assign-uuid":
            md = _dc_replace(md, view_uuid=u["uuid"])
        elif a == "upgrade-format-version":
            md = _dc_replace(md, format_version=int(u["format-version"]))
        elif a == "add-schema":
            s = Schema.from_json(u["schema"])
            schemas = dict(md.schemas)
            schemas[s.schema_id] = s
            md = _dc_replace(md, schemas=schemas)
        elif a == "add-view-version":
            d = dict(u["view-version"])
            storage = d.pop("storage-table", None)
            ver = ViewVersion.from_json(d)
            versions = dict(md.versions)
            versions[ver.version_id] = ver
            md = _dc_replace(
                md, versions=versions,
                version_log=md.version_log + (
                    {"timestamp-ms": ver.timestamp_ms,
                     "version-id": ver.version_id},))
            if storage is not None \
                    and isinstance(md, MaterializedViewMetadata):
                md = _dc_replace(md, storage_table=storage)
        elif a == "set-current-view-version":
            vid = int(u["view-version-id"])
            if vid == -1:
                vid = max(md.versions)
            md = _dc_replace(md, current_version_id=vid)
        elif a == "set-location":
            md = _dc_replace(md, location=u["location"])
        elif a == "set-properties":
            props = dict(md.properties)
            props.update(u.get("updates", {}))
            md = _dc_replace(md, properties=props)
        elif a == "remove-properties":
            props = {k: v for k, v in md.properties.items()
                     if k not in set(u.get("removals", ()))}
            md = _dc_replace(md, properties=props)
        else:
            raise ValueError(f"unknown view update action {a!r}")
    return md


def view_metadata_from_create(body: dict) -> ViewMetadata:
    """Server-side CreateViewRequest materialization (create.rs:236-276
    TryInto<ViewMetadata>/<MaterializedViewMetadata>): fresh uuid, the
    request's version as version 1; a storage-table in the version makes
    it a materialized view."""
    import uuid as _uuid
    d = dict(body["view-version"])
    storage = d.pop("storage-table", None)
    ver = ViewVersion.from_json(d)
    schema = Schema.from_json(body["schema"])
    kwargs = dict(
        view_uuid=str(_uuid.uuid4()),
        location=body["location"].rstrip("/"),
        versions={ver.version_id: ver},
        current_version_id=ver.version_id,
        schemas={schema.schema_id: schema},
        version_log=({"timestamp-ms": ver.timestamp_ms,
                      "version-id": ver.version_id},),
        properties=dict(body.get("properties", {})))
    if storage is not None:
        return MaterializedViewMetadata(storage_table=storage, **kwargs)
    return ViewMetadata(**kwargs)
