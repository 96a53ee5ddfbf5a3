"""ACID transactions: append / equality-delete / replace commits
(iceberg-rust/src/table/transaction/operation.rs:91-547, mod.rs:56-384).

A transaction buffers operations, then ``commit()``:
1. builds the new manifests + manifest list (manifest bin-packing below),
2. writes a new Snapshot and a new metadata JSON document,
3. CAS-swaps the catalog pointer (requirement = pointer unchanged —
   ``AssertRefSnapshotId`` semantics, commit.rs:343-372).

Manifest bin-packing mirrors the reference heuristics (operation.rs:648-666,
append.rs:100-191): with ``limit = 4 + √(total_files)``, new files merge
into one same-content manifest while it stays under the limit, otherwise
they split into ``2^⌈log₂(n/limit)⌉`` fresh manifests. The merge target is
chosen the way the reference does: partitioned tables pick the manifest
whose partition bounding rectangle stays smallest after expanding with the
new files' rectangle, comparing dimension spans with earlier-spec-field
priority (append.rs:107-150 ``select_manifest_partitioned`` +
util/mod.rs ``Rectangle::cmp_with_priority``); unpartitioned tables pick
the fewest-rows manifest (append.rs:152-191
``select_manifest_unpartitioned``). Keeping manifests partition-local
preserves manifest-list pruning power over many commits.
"""

from __future__ import annotations

import math
import os
import random
import time
from dataclasses import replace as _dc_replace

from iceberg_rust_archive_spark.catalog.base import Catalog, CommitFailedError
from iceberg_rust_archive_spark.sources.manifests import (
    read_manifest, read_manifest_list, read_manifests, write_manifest,
    write_manifest_list,
)
from iceberg_rust_archive_spark.spec.manifest import (
    CONTENT_DATA, CONTENT_EQUALITY_DELETES, CONTENT_POSITION_DELETES,
    DataFile, ManifestEntry,
    STATUS_ADDED, STATUS_DELETED, STATUS_EXISTING,
)
from iceberg_rust_archive_spark.spec.schema import Schema
from iceberg_rust_archive_spark.spec.snapshot import MAIN_BRANCH, Snapshot
from iceberg_rust_archive_spark.spec.table_metadata import TableMetadata
from iceberg_rust_archive_spark.spec.view_metadata import REFRESH_STATE_KEY


def _remove_physical(paths) -> None:
    """Best-effort physical cleanup of replaced data files after a
    committed rewrite, through the object-store abstraction so
    memory:// and s3:// table locations are cleaned like local ones
    (a plain os.remove silently orphans them until
    remove_orphan_files). Failures are swallowed — the commit already
    happened; leftovers are orphans, not state."""
    from iceberg_rust_archive_spark.object_store import store_for
    for path in paths:
        try:
            store_for(path).remove(path)
        except Exception:  # noqa: BLE001 — cleanup is advisory
            pass


def new_snapshot_id() -> int:
    return random.getrandbits(62) | 1


# legal primitive type promotions (Iceberg spec §Schema Evolution:
# readers must widen, so old files stay readable under the new type)
_TYPE_PROMOTIONS = {("int", "long"), ("float", "double")}


def _walk_fields(t, out: dict) -> dict:
    """All (field_id -> (name, type)) pairs of a type, recursively —
    list element and map key/value ids count as fields (they occupy
    the same id space; spec 'Schemas and Data Types')."""
    from iceberg_rust_archive_spark.spec.types import (
        ListTypeSpec, MapTypeSpec, StructTypeSpec,
    )
    if isinstance(t, StructTypeSpec):
        for f in t.fields:
            out[f.field_id] = (f.name, f.field_type)
            _walk_fields(f.field_type, out)
    elif isinstance(t, ListTypeSpec):
        out[t.element_id] = ("element", t.element)
        _walk_fields(t.element, out)
    elif isinstance(t, MapTypeSpec):
        out[t.key_id] = ("key", t.key)
        out[t.value_id] = ("value", t.value)
        _walk_fields(t.key, out)
        _walk_fields(t.value, out)
    return out


def _validate_schema_evolution(old: Schema, new: Schema,
                               properties: dict | None = None,
                               md=None) -> None:
    """Refuse schema updates the spec forbids — they would corrupt
    reads silently rather than fail them (an int column re-typed to
    string reads garbage/NULL from every existing file; a field made
    REQUIRED lies about rows that already hold NULL). Field ids are
    the identity: ids never recycle (enforced against every historical
    schema and last_column_id when ``md`` is given), new fields take
    fresh ids, and a surviving id may only widen (int→long,
    float→double, decimal precision growth at the same scale) — at ANY
    nesting depth: struct members, list elements, and map keys/values
    validate per nested field id under the same promotion rules."""
    from iceberg_rust_archive_spark.spec.types import (
        ListTypeSpec, MapTypeSpec, StructTypeSpec,
    )

    def _dec(t):
        import re as _re
        m = _re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t) \
            if isinstance(t, str) else None
        return (int(m.group(1)), int(m.group(2))) if m else None

    # field-id recycling guard: a NEW field (id absent from the current
    # schema) reusing an id from any historical schema would resurrect
    # the dropped column's values via parquet field-id resolution in
    # old files. Allow only an exact re-add (same name AND type — an
    # intentional undrop, where that resurrection is the semantics).
    hist_by_id: dict[int, tuple] = {}
    max_hist_id = 0
    if md is not None:
        for s_ in md.schemas.values():
            _walk_fields(s_.struct, hist_by_id)
        max_hist_id = max([md.last_column_id, *hist_by_id], default=0)

    def _check_new_field(f, path):
        if f.required and getattr(f, "initial_default", None) is None:
            raise ValueError(
                f"cannot add REQUIRED column {path!r} without a "
                "default: existing rows have no value for it")
        if md is None:
            return
        # the new field's own id AND every id nested inside its type
        # must be fresh (or an exact historical match — an undrop)
        new_ids = {f.field_id: (f.name, f.field_type)}
        _walk_fields(f.field_type, new_ids)
        for fid, (nm, ft) in new_ids.items():
            prior = hist_by_id.get(fid)
            if prior is not None and (prior[0] != nm or prior[1] != ft):
                raise ValueError(
                    f"cannot add column {path!r} with recycled field id "
                    f"{fid}: a historical schema used that id for "
                    f"{prior[0]!r} ({prior[1]}); old files would "
                    "resurrect its values under the new column — use a "
                    "fresh id")
            if prior is None and fid <= max_hist_id:
                raise ValueError(
                    f"cannot add column {path!r} with field id "
                    f"{fid} <= last assigned id {max_hist_id}: "
                    "ids never recycle — use a fresh id")

    def _promote(ot, nt, path, fid):
        if ot == nt:
            return
        if isinstance(ot, str) and isinstance(nt, str):
            if (ot, nt) in _TYPE_PROMOTIONS:
                return
            od, nd = _dec(ot), _dec(nt)
            if od and nd and od[1] == nd[1] and nd[0] >= od[0]:
                return  # decimal precision widening, same scale
        elif isinstance(ot, StructTypeSpec) \
                and isinstance(nt, StructTypeSpec):
            _struct(ot, nt, path)
            return
        elif isinstance(ot, ListTypeSpec) and isinstance(nt, ListTypeSpec) \
                and ot.element_id == nt.element_id:
            if nt.element_required and not ot.element_required:
                raise ValueError(
                    f"cannot make list element of {path!r} required: "
                    "existing rows may hold NULL")
            _promote(ot.element, nt.element, f"{path}.element",
                     nt.element_id)
            return
        elif isinstance(ot, MapTypeSpec) and isinstance(nt, MapTypeSpec) \
                and ot.key_id == nt.key_id and ot.value_id == nt.value_id:
            if nt.value_required and not ot.value_required:
                raise ValueError(
                    f"cannot make map value of {path!r} required: "
                    "existing rows may hold NULL")
            _promote(ot.key, nt.key, f"{path}.key", nt.key_id)
            _promote(ot.value, nt.value, f"{path}.value", nt.value_id)
            return
        raise ValueError(
            f"illegal type change for column {path!r} "
            f"(field id {fid}): {ot} -> {nt}")

    def _struct(os_, ns_, path):
        for f in ns_.fields:
            prev = os_.field_by_id(f.field_id)
            fpath = f"{path}.{f.name}" if path else f.name
            if prev is not None and prev.name != f.name and path == "" \
                    and "schema.name-mapping.default" in (properties or {}):
                # add_files-registered external files carry NO embedded
                # field ids — this table's scans resolve columns BY
                # NAME, so a rename would silently read NULL from every
                # registered file. Refuse loudly (the documented caveat
                # in maintenance.add_files): rewrite the registered
                # files first (CALL system.rewrite_data_files / compact
                # embeds ids), then drop the name-mapping property and
                # rename.
                raise ValueError(
                    f"cannot rename column {prev.name!r} -> {f.name!r}: "
                    "this table carries schema.name-mapping.default "
                    "(add_files-registered files resolve by NAME); "
                    "rewrite the registered files first, then drop the "
                    "property")
            if prev is None:
                _check_new_field(f, fpath)
                continue
            if f.required and not prev.required:
                raise ValueError(
                    f"cannot make column {fpath!r} required: existing "
                    "rows may hold NULL")
            _promote(prev.field_type, f.field_type, fpath, f.field_id)

    _struct(StructTypeSpec(tuple(old.fields)),
            StructTypeSpec(tuple(new.fields)), "")


def _check_orc_evolution(md, new: Schema) -> None:
    """ORC files have no Spark-side field-id resolution (the parquet
    reader matches ``parquet.field.id`` metadata; ORC reads are
    name-based), so on a table holding LIVE ORC files a column RENAME
    silently reads NULL from every ORC file written under the old
    name, and DROPPING a column referenced by live equality-delete
    files breaks the hidden __hist_<fid> recovery for ORC data. The
    same drop hazard applies to NAME-MAPPING tables (add_files-
    registered files carry no embedded field ids, so reads resolve by
    name and __hist_<fid> can never match). All refuse loudly; rewrite
    the files to id-carrying parquet first (write.format.default +
    rewrite_data_files). Cost: one cached manifest sweep, only on
    rename/drop commits, short-circuited at the first ORC file."""
    name_mapped = "schema.name-mapping.default" in md.properties
    old = md.current_schema()
    renamed = [f for f in new.fields
               if (p := old.field_by_id(f.field_id)) is not None
               and p.name != f.name]
    new_ids = {f.field_id for f in new.fields}
    dropped = {f.field_id for f in old.fields} - new_ids
    if not renamed and not dropped:
        return
    snap = md.current_snapshot()
    if snap is None:
        return
    from iceberg_rust_archive_spark.spec.manifest import (
        CONTENT_EQUALITY_DELETES, STATUS_DELETED,
    )
    any_orc = False
    eq_refs: set[int] = set()
    for entries in read_manifests(
            [m.manifest_path for m in read_manifest_list(
                snap.manifest_list)]):
        for e in entries:
            if e.status == STATUS_DELETED:
                continue
            if (e.data_file.file_format or "").lower() == "orc":
                any_orc = True
            if e.data_file.content == CONTENT_EQUALITY_DELETES:
                eq_refs |= set(e.data_file.equality_ids or ())
        if any_orc and renamed:
            break
    if name_mapped and (dropped & eq_refs):
        raise ValueError(
            f"cannot drop column(s) with field id(s) "
            f"{sorted(dropped & eq_refs)}: live equality-delete files "
            "reference them and this table carries "
            "schema.name-mapping.default (reads resolve by NAME, so "
            "the dropped column cannot be recovered by field id) — "
            "compact the merge-on-read debt first")
    if not any_orc:
        return
    if renamed:
        raise ValueError(
            f"cannot rename column(s) {[f.name for f in renamed]!r}: "
            "the table holds live ORC files, which Spark resolves by "
            "NAME (no field-id metadata) — rewrite them to parquet "
            "first (rewrite_data_files)")
    broken = dropped & eq_refs
    if broken:
        raise ValueError(
            f"cannot drop column(s) with field id(s) {sorted(broken)}: "
            "live equality-delete files reference them and the table "
            "holds ORC files, which cannot resolve the dropped column "
            "by field id — compact the merge-on-read debt first")


class Transaction:
    def __init__(self, catalog: Catalog, identifier: str,
                 metadata: TableMetadata, branch: str | None = None,
                 base_location: str | None = None):
        self.catalog = catalog
        self.identifier = identifier
        self.base = metadata
        # the pointer this txn's base metadata was read from — the CAS
        # requirement; falling back to "current" is only safe when the
        # caller just loaded the metadata
        self.base_location = base_location \
            or catalog.metadata_location(identifier)
        self.branch = branch or MAIN_BRANCH
        self._appended: list[DataFile] = []
        self._deletes: list[DataFile] = []
        self._replacement: list[DataFile] | None = None
        self._rewrite_removed: set[str] | None = None
        self._rewrite_added: list[DataFile] = []
        self._rewrite_removed_deletes: set | None = None
        self._rewrite_seen_deletes: set | None = None
        self._deletes_valid_since: int | None = None
        self._new_schema: Schema | None = None
        self._new_spec_fields: list | None = None
        self._new_sort_order = None
        self._properties: dict = {}
        self._summary_extra: dict = {}
        self._statistics: dict | None = None
        self._partition_statistics: dict | None = None
        self._superseded_dvs: set[tuple[str, int]] = set()

    # --- operations (transaction/mod.rs:56-384) --------------------------
    def append_files(self, files: list[DataFile]) -> "Transaction":
        self._appended.extend(files)
        return self

    def append_delete_files(self, files: list[DataFile],
                            valid_since: int | None = None
                            ) -> "Transaction":
        """``valid_since`` (a snapshot id) marks POSITION-based delete
        content (parquet pairs / DVs) as planned against that
        snapshot's file layout. Positions are path-bound: if a replace
        commit (compaction, rewrite_partition, TRUNCATE) lands between
        that snapshot and this commit, the referenced files may no
        longer exist and the pairs would be silent no-ops — the
        deletion would be LOST. Commit walks the ancestry back to
        ``valid_since`` and raises CommitFailedError on any replace in
        between (or if the snapshot expired), forcing the caller to
        re-plan the hit set against the rewritten layout
        (``Table.delete_where_pos`` does so automatically). Equality
        deletes match by VALUE at a new sequence number and survive
        replaces, so they don't need this."""
        self._deletes.extend(files)
        if valid_since is not None:
            self._deletes_valid_since = valid_since
        return self

    def supersede_delete_files(self,
                               keys: set[tuple[str, int]]) -> "Transaction":
        """Mark prior deletion-vector entries replaced by a merged DV in
        this commit. ``keys`` are ``(puffin_path, content_offset)``
        pairs; matching content=1 manifest entries are dropped (the v3
        invariant: at most one DV per data file — writers must
        merge-and-replace, never accumulate). Keys no longer live are
        ignored so CAS retries stay safe."""
        self._superseded_dvs |= set(keys)
        return self

    def replace_files(self, files: list[DataFile]) -> "Transaction":
        """Full replace: drop every previous data/delete file
        (operation.rs:384-547)."""
        self._replacement = list(files)
        return self

    def rewrite_files(self, removed_paths, added: list[DataFile],
                      removed_deletes=None,
                      seen_deletes=None) -> "Transaction":
        """SELECTIVE rewrite (Iceberg's RewriteDataFiles / bin-pack
        shape): drop exactly ``removed_paths``, add ``added``, leave
        every other file untouched — manifests not naming a removed
        file carry over byte-identical; touched manifests are rewritten
        with their survivors as STATUS_EXISTING under their ORIGINAL
        sequence numbers.

        ``removed_deletes`` (``{(file_path, content_offset), …}``,
        offset None for non-DV files) names DELETE files absorbed by
        this rewrite — the partition-scoped delete-absorbing
        compaction (``maintenance.rewrite_partition``). When None
        (default), the table must hold no live delete files at all.
        Either way commit validates resurrection-freedom BOTH ways
        against the state it actually commits over:

        - a KEPT equality delete must not be scoped to (or global
          over) any rewritten file's partition — the rewritten rows'
          new, higher sequence number would escape it;
        - a REMOVED equality delete must not still apply to any KEPT
          data file — dropping it would resurrect that file's dead
          rows.

        ``seen_deletes`` (same key shape) names ALL delete entries that
        were live when the rewrite was PLANNED. Kept position deletes /
        DVs in that set are safe — the planner's merge-on-read scan
        already resolved them into the rewritten output, and a stale
        reference to a dropped path never matches again. A kept
        position delete or DV NOT in the set landed between plan and
        commit: if it references a removed data file, the rewritten
        output (planned pre-delete) would resurrect its rows, so
        commit raises CommitFailedError and the caller must RE-PLAN
        (a CAS retry that reuses the stale plan keeps failing by
        design). DV references come from the manifest; a race-landed
        parquet position delete's referenced paths are read from the
        (small) file itself, so deletes scoped to untouched files
        never force a re-plan.

        Racing commits that violate either rule fail the CAS-retry
        loop with CommitFailedError and the caller re-plans. A removed
        path that no longer exists raises too (a concurrent rewrite
        won the race)."""
        self._rewrite_removed = set(removed_paths)
        self._rewrite_added = list(added)
        self._rewrite_removed_deletes = (
            None if removed_deletes is None else set(removed_deletes))
        self._rewrite_seen_deletes = (
            None if seen_deletes is None else set(seen_deletes))
        return self

    def update_schema(self, schema: Schema) -> "Transaction":
        self._new_schema = schema
        return self

    def update_spec(self, fields) -> "Transaction":
        """Partition spec evolution (AddSpec + SetDefaultSpec,
        commit.rs: the two update actions the REST protocol carries for
        it). ``fields`` are PartitionFields whose field_id may be 0 —
        fresh ids are assigned past last_partition_id, and the new spec
        gets the next spec id. Existing data files keep their old-spec
        partition tuples (scan prunes each manifest under the spec it
        was written with); only NEW writes use the new layout."""
        self._new_spec_fields = list(fields)
        return self

    def update_sort_order(self, order) -> "Transaction":
        """Sort order evolution (AddSortOrder + SetDefaultSortOrder,
        the REST commit protocol's update actions for it):
        metadata-only — NEW writes sort by the new order (write_datafiles
        reads the default order at write time); existing files keep
        their layout, and their historical order ids stay resolvable in
        the sort-orders map."""
        self._new_sort_order = order
        return self

    def set_properties(self, props: dict) -> "Transaction":
        self._properties.update(props)
        return self

    def set_statistics(self, stats_entry: dict) -> "Transaction":
        """Register a Puffin statistics file (spec ``SetStatistics``
        update): replaces any previous entry for the same snapshot."""
        self._statistics = stats_entry
        return self

    def set_partition_statistics(self, stats_entry: dict) -> "Transaction":
        """Register a partition-statistics Parquet file (spec
        ``SetPartitionStatistics``): replaces the same-snapshot entry."""
        self._partition_statistics = stats_entry
        return self

    def set_refresh_state(self, refresh_state_json: str) -> "Transaction":
        """MV refresh state rides in the snapshot summary
        (materialized_view/transaction/mod.rs:66-133)."""
        self._summary_extra[REFRESH_STATE_KEY] = refresh_state_json
        return self

    def set_summary(self, key: str, value: str) -> "Transaction":
        """Attach an arbitrary snapshot-summary entry (same mechanism the
        MV refresh state uses; e.g. streaming sink batch ids)."""
        self._summary_extra[key] = value
        return self

    def _apply_statistics(self, md: TableMetadata) -> TableMetadata:
        if self._statistics is not None:
            sid = self._statistics.get("snapshot-id")
            stats = tuple(s for s in md.statistics
                          if s.get("snapshot-id") != sid) \
                + (self._statistics,)
            md = _dc_replace(md, statistics=stats)
        if self._partition_statistics is not None:
            sid = self._partition_statistics.get("snapshot-id")
            pstats = tuple(s for s in md.partition_statistics
                           if s.get("snapshot-id") != sid) \
                + (self._partition_statistics,)
            md = _dc_replace(md, partition_statistics=pstats)
        return md

    # --- commit ----------------------------------------------------------
    def commit(self) -> TableMetadata:
        """Single-table commit: prepare (write manifests + new metadata
        document content) then CAS the catalog pointer."""
        new_md, files_to_delete = self._prepare()
        if new_md is None:
            return self.base  # true no-op — nothing to commit
        self.catalog.update_tabular(self.identifier, new_md,
                                    expected_location=self.base_location)
        _remove_physical(files_to_delete)
        return new_md

    def _prepare(self):
        """Build this transaction's next TableMetadata WITHOUT touching
        the catalog pointer: manifests, manifest list, and snapshot are
        written (they are content-addressed by snapshot id, so an
        abandoned prepare leaves only orphans for remove_orphan_files),
        the pointer swap is left to the caller. Returns ``(new_md,
        files_to_delete)``; ``(None, [])`` means true no-op. This is
        the seam MultiTableTransaction uses to commit N tables behind
        ONE atomic catalog operation (the reference REST route
        ``v1/{prefix}/transactions/commit``)."""
        md = self.base
        metadata_dir = os.path.join(md.location, "metadata")
        seq = md.last_sequence_number + 1
        snap_id = new_snapshot_id()
        # a first write to a new branch forks from main's current state
        parent = md.current_snapshot(self.branch) \
            or md.current_snapshot(MAIN_BRANCH)
        spec = md.default_spec()
        pf_names = [f.name for f in spec.fields]

        if self._deletes_valid_since is not None \
                and parent is not None \
                and parent.snapshot_id != self._deletes_valid_since:
            # position-based delete content planned at an older
            # snapshot: any replace commit since then may have
            # rewritten the referenced files, turning the (path, pos)
            # pairs into silent no-ops — the deletion would be LOST.
            # Walk back to the planning snapshot; raise on a replace
            # in between (or if history no longer reaches it).
            s_ = parent
            while s_ is not None \
                    and s_.snapshot_id != self._deletes_valid_since:
                if (s_.summary or {}).get("operation") == "replace":
                    raise CommitFailedError(
                        "position deletes were planned at snapshot "
                        f"{self._deletes_valid_since} but a replace "
                        f"commit (snapshot {s_.snapshot_id}) rewrote "
                        "files since — the (path, pos) hit set is "
                        "stale; re-plan the delete")
                s_ = (md.snapshots.get(s_.parent_snapshot_id)
                      if s_.parent_snapshot_id is not None else None)
            if s_ is None:
                raise CommitFailedError(
                    "position deletes were planned at snapshot "
                    f"{self._deletes_valid_since}, which is no longer "
                    "in this branch's history — re-plan the delete")

        # v3 one-DV-per-file invariant under WRITER races: two
        # concurrent DV writers both merge from the same prior vector
        # set, so the later commit would land a SECOND live DV for a
        # data file (the union of pairs keeps OUR scan correct, but
        # spec-compliant foreign readers may resolve only one vector —
        # silent divergence). When this commit adds DVs and the parent
        # moved past the planning snapshot, verify no un-superseded
        # live DV references the same data files; conflict ⇒ re-plan
        # (the refreshed plan merges the racing vector).
        new_dv_refs = {f.referenced_data_file for f in self._deletes
                       if (f.file_format or "").lower() == "puffin"
                       and f.referenced_data_file is not None}
        if new_dv_refs and parent is not None \
                and self._deletes_valid_since is not None \
                and parent.snapshot_id != self._deletes_valid_since:
            from iceberg_rust_archive_spark.sources.manifests import (
                read_manifest_list as _rml, read_manifests as _rms,
            )
            for entries in _rms([m.manifest_path
                                 for m in _rml(parent.manifest_list)]):
                for e in entries:
                    df_ = e.data_file
                    if e.status == STATUS_DELETED \
                            or df_.content != CONTENT_POSITION_DELETES \
                            or (df_.file_format or "").lower() != "puffin":
                        continue
                    if df_.referenced_data_file in new_dv_refs \
                            and (df_.file_path, df_.content_offset) \
                            not in self._superseded_dvs:
                        raise CommitFailedError(
                            "a concurrent commit added a deletion "
                            f"vector for {df_.referenced_data_file}; "
                            "re-plan to merge (one live DV per data "
                            "file)")

        if self._new_schema is not None:
            _validate_schema_evolution(md.current_schema(),
                                       self._new_schema, md.properties,
                                       md=md)
            _check_orc_evolution(md, self._new_schema)
            schemas = dict(md.schemas)
            schemas[self._new_schema.schema_id] = self._new_schema
            md = _dc_replace(md, schemas=schemas,
                             current_schema_id=self._new_schema.schema_id,
                             last_column_id=max(
                                 md.last_column_id,
                                 self._new_schema.highest_field_id()))

        if self._new_spec_fields is not None:
            import dataclasses as _dc
            from iceberg_rust_archive_spark.spec.partition import (
                PartitionSpec,
            )
            # carried-over fields (id > 999) keep their ids; only fresh
            # fields (id 0) get the next ones — two passes so a fresh id
            # can never collide with a carried one
            next_fid = max([md.last_partition_id, 999]
                           + [pf.field_id for pf in self._new_spec_fields
                              if pf.field_id > 999])
            fields = []
            for pf in self._new_spec_fields:
                if pf.field_id > 999:
                    fields.append(pf)
                else:
                    next_fid += 1
                    fields.append(_dc.replace(pf, field_id=next_fid))
            new_spec = PartitionSpec(max(md.partition_specs, default=-1) + 1,
                                     tuple(fields))
            specs = dict(md.partition_specs)
            specs[new_spec.spec_id] = new_spec
            md = _dc_replace(md, partition_specs=specs,
                             default_spec_id=new_spec.spec_id,
                             last_partition_id=next_fid)
            spec = new_spec
            pf_names = [f.name for f in spec.fields]

        if self._new_sort_order is not None:
            import dataclasses as _dcs
            new_fields = self._new_sort_order.fields
            # spec reserves order-id 0 for the unsorted order (WRITE
            # UNORDERED), and re-applying an identical order reuses its
            # existing id instead of accumulating duplicates
            oid = next((i for i, o in md.sort_orders.items()
                        if o.fields == new_fields),
                       0 if not new_fields
                       else max(md.sort_orders, default=-1) + 1)
            orders = dict(md.sort_orders)
            if oid not in orders:
                orders[oid] = _dcs.replace(self._new_sort_order,
                                           order_id=oid)
            md = _dc_replace(md, sort_orders=orders,
                             default_sort_order_id=oid)

        # v3 gate (spec: deletion vectors and column default-values are
        # format-version-3 constructs): the first commit that writes a DV
        # (content file with file_format='puffin') or a schema field with
        # initial-default/write-default bumps format-version to 3 so a
        # compliant reader interprets the new manifest fields / schema
        # JSON correctly. A table explicitly pinned below 3 via the
        # 'format-version' property rejects the construct instead — a v2
        # reader would try to parse the Puffin blob as parquet delete
        # rows or silently return NULL where defaults apply. Evaluated
        # BEFORE manifests are written so v3 row-lineage assignment
        # below sees the final format version.
        _candidates = ((self._replacement or [])
                       + (self._rewrite_added or [])
                       + self._appended + self._deletes)
        needs_v3 = any(f.file_format == "puffin" for f in _candidates)
        if self._new_schema is not None:
            from iceberg_rust_archive_spark.spec.types import (
                contains_variant,
            )
            needs_v3 = needs_v3 or any(
                getattr(f, "initial_default", None) is not None
                or getattr(f, "write_default", None) is not None
                or contains_variant(f.field_type)
                for f in self._new_schema.fields)
        if needs_v3 and md.format_version < 3:
            pin = str(md.properties.get("format-version", "")
                      or self._properties.get("format-version", "")).strip()
            if pin and int(float(pin)) < 3:
                raise CommitFailedError(
                    "deletion vectors / column defaults require "
                    f"format-version 3, but the table pins {pin}; "
                    "unset the 'format-version' property or use "
                    "parquet position deletes / NULL defaults")
            md = _dc_replace(md, format_version=3)

        # v3 row lineage (spec §Row Lineage): every ADDED data file gets
        # first-row-id from the table's next-row-id counter, advancing
        # by its record count; the snapshot records the range start and
        # the committed metadata advances next-row-id past the range.
        # Rewritten/compacted files that already carry a first-row-id
        # (lineage-preserving rewrite) keep it. Delete files never get
        # row ids. Assignment happens here — before any manifest is
        # written — so the ids persist in the Avro entries.
        # CAVEAT: replace/rewrite commits assign FRESH ranges to their
        # output files (full lineage preservation requires
        # materializing _row_id into the rewritten parquet, which this
        # engine does not do) — consistent with the 'replace' operation
        # label's existing contract that row-level identity is not
        # derivable across it and incremental consumers resync.
        row_id_start = md.next_row_id
        _next_rid = [row_id_start]
        if md.format_version >= 3:
            def _assign_row_ids(files):
                out = []
                for f in files:
                    if f.content == CONTENT_DATA \
                            and f.first_row_id is None:
                        f = _dc_replace(f, first_row_id=_next_rid[0])
                        _next_rid[0] += f.record_count or 0
                    out.append(f)
                return out
            if self._replacement is not None:
                self._replacement = _assign_row_ids(self._replacement)
            if self._rewrite_added is not None:
                self._rewrite_added = _assign_row_ids(self._rewrite_added)
            self._appended = _assign_row_ids(self._appended)

        old_entries = list(read_manifest_list(parent.manifest_list)) \
            if parent else []
        files_to_delete: list[str] = []
        # current schema JSON rides in each manifest's container metadata
        # (bound decode by field id + external-reader context)
        import json as _json
        schema_json = _json.dumps(
            md.schemas[md.current_schema_id].to_json())

        # Replaced files are NOT deleted by default: the parent snapshot
        # still references them, so time travel / branch reads / a
        # pre-compaction incremental consumer must keep working until
        # expire_snapshots drops the snapshots and remove_orphan_files
        # reclaims the bytes (Iceberg's contract). The reference purges
        # immediately (transaction/mod.rs:377-379 → table/mod.rs:359-411)
        # — opt back into that with write.replace.purge-replaced-files
        # for eager space reclaim at the cost of readable history.
        purge = str(md.properties.get(
            "write.replace.purge-replaced-files", "false")).lower() == "true"

        if self._replacement is not None:
            if purge:
                for entries in read_manifests(
                        [m.manifest_path for m in old_entries]):
                    for e in entries:
                        files_to_delete.append(e.data_file.file_path)
            new_list = []
            if self._replacement:
                new_list.append(write_manifest(
                    metadata_dir,
                    [ManifestEntry(STATUS_ADDED, f, snap_id, seq, seq)
                     for f in self._replacement],
                    spec.spec_id, CONTENT_DATA, snap_id, seq, pf_names,
                    schema_json))
            # "replace": every prior file dropped and rewritten — the
            # one operation a row-level changelog CANNOT express from
            # delete files alone. Readers (Table.changes, the MV
            # changelog eligibility) key off this label; eq-delete +
            # append commits keep "overwrite".
            operation = "replace"
            added = self._replacement
        elif self._rewrite_removed is not None:
            removed = set(self._rewrite_removed)
            rm_del = self._rewrite_removed_deletes
            if rm_del is None and any(m.content == 1
                                      for m in old_entries):
                raise CommitFailedError(
                    "selective rewrite with live delete files would "
                    "resurrect deleted rows — compact first, or name "
                    "the absorbed deletes via removed_deletes "
                    "(maintenance.rewrite_partition)")
            import json as _jsn
            import re as _re

            def _pkey_of(df_):
                return _jsn.dumps(df_.partition, sort_keys=True,
                                  default=str)

            def _is_global_del(df_):
                return all(v is None for v in df_.partition.values())

            def _norm_path(p):
                return _re.sub(r"^file:/+", "/", p)

            removed_norm = {_norm_path(p) for p in removed}

            def _pos_delete_refs(df_):
                """Data paths a position delete / DV references — the
                manifest field for DVs, the (small) file's own
                file_path column for parquet pairs."""
                if df_.referenced_data_file is not None:
                    return {_norm_path(df_.referenced_data_file)}
                if (df_.file_format or "").lower() == "puffin":
                    return set()  # defensive: DV sans reference
                import io

                import pyarrow.parquet as pq

                from iceberg_rust_archive_spark.object_store import (
                    store_for,
                )
                buf = io.BytesIO(
                    store_for(df_.file_path).read_bytes(df_.file_path))
                col = pq.read_table(buf, columns=["file_path"])
                return {_norm_path(p)
                        for p in set(col.column("file_path").to_pylist())}

            manifest_entries = list(zip(
                old_entries,
                read_manifests([m.manifest_path
                                for m in old_entries])))
            found: set[str] = set()
            found_del: set = set()
            removed_parts: set[str] = set()   # partitions being rewritten
            kept_parts: set[str] = set()      # partitions with kept data
            any_kept_data = False
            new_list = []
            # data manifests first: learn which partitions move
            for mle, entries in manifest_entries:
                if mle.content == 1:
                    continue
                live = [e for e in entries if e.status != STATUS_DELETED]
                hit = [e for e in live
                       if e.data_file.file_path in removed]
                keep = [e for e in live
                        if e.data_file.file_path not in removed]
                kept_parts.update(_pkey_of(e.data_file) for e in keep)
                any_kept_data = any_kept_data or bool(keep)
                if not hit:
                    new_list.append(mle)  # untouched manifest carries over
                    continue
                found.update(e.data_file.file_path for e in hit)
                removed_parts.update(_pkey_of(e.data_file) for e in hit)
                survivors = [
                    ManifestEntry(STATUS_EXISTING, e.data_file,
                                  e.snapshot_id, e.sequence_number,
                                  e.file_sequence_number)
                    for e in keep]
                if survivors:
                    sp = md.partition_specs.get(mle.partition_spec_id,
                                                spec)
                    new_list.append(write_manifest(
                        metadata_dir, survivors, sp.spec_id,
                        CONTENT_DATA, snap_id, seq,
                        [f.name for f in sp.fields], schema_json))
            # delete manifests: drop absorbed entries, validate the
            # rest against the partitions that actually move — this
            # re-runs on every CAS retry against FRESH metadata, so a
            # delete that landed between plan and commit is caught
            for mle, entries in manifest_entries:
                if mle.content != 1:
                    continue
                live = [e for e in entries if e.status != STATUS_DELETED]
                hit_ids = set()
                for e in live:
                    key = (e.data_file.file_path,
                           e.data_file.content_offset)
                    if rm_del is not None and key in rm_del:
                        hit_ids.add(id(e))
                        found_del.add(key)
                        if e.data_file.content \
                                == CONTENT_EQUALITY_DELETES:
                            # removed eq-delete must not still apply
                            # to any KEPT data file
                            if _is_global_del(e.data_file):
                                if any_kept_data:
                                    raise CommitFailedError(
                                        "rewrite would resurrect rows:"
                                        " absorbing the GLOBAL "
                                        f"equality delete "
                                        f"{e.data_file.file_path} "
                                        "while data files remain")
                            elif _pkey_of(e.data_file) in kept_parts:
                                raise CommitFailedError(
                                    "rewrite would resurrect rows: "
                                    "absorbed equality delete "
                                    f"{e.data_file.file_path} still "
                                    "applies to a kept data file")
                        continue
                    if removed and e.data_file.content \
                            == CONTENT_EQUALITY_DELETES:
                        # kept eq-delete must not cover a rewritten
                        # partition — the rewritten rows' higher
                        # sequence number would escape it
                        if (_is_global_del(e.data_file)
                                or _pkey_of(e.data_file)
                                in removed_parts):
                            raise CommitFailedError(
                                "rewrite would resurrect rows: live "
                                "equality delete "
                                f"{e.data_file.file_path} still "
                                "applies to a rewritten partition — "
                                "absorb it or re-plan")
                    if removed and e.data_file.content \
                            == CONTENT_POSITION_DELETES:
                        # a kept position delete / DV the planner never
                        # SAW (it landed between plan and commit) that
                        # references a removed file would be silently
                        # voided — the rewritten output was planned
                        # pre-delete, so its rows would resurrect
                        seen = self._rewrite_seen_deletes
                        if (seen is None or key not in seen) \
                                and _pos_delete_refs(e.data_file) \
                                & removed_norm:
                            raise CommitFailedError(
                                "rewrite would resurrect rows: "
                                "position delete "
                                f"{e.data_file.file_path} landed "
                                "after the rewrite plan and "
                                "references a rewritten data file — "
                                "re-plan")
                if not hit_ids:
                    new_list.append(mle)
                    continue
                survivors = [
                    ManifestEntry(STATUS_EXISTING, e.data_file,
                                  e.snapshot_id, e.sequence_number,
                                  e.file_sequence_number)
                    for e in live if id(e) not in hit_ids]
                if survivors:
                    sp = md.partition_specs.get(mle.partition_spec_id,
                                                spec)
                    new_list.append(write_manifest(
                        metadata_dir, survivors, sp.spec_id, 1,
                        snap_id, seq, [f.name for f in sp.fields],
                        schema_json))
            if found != removed:
                raise CommitFailedError(
                    f"rewrite lost a race: {len(removed - found)} "
                    "removed file(s) are no longer live — re-plan")
            if rm_del is not None and found_del != rm_del:
                raise CommitFailedError(
                    f"rewrite lost a race: {len(rm_del - found_del)} "
                    "absorbed delete file(s) are no longer live — "
                    "re-plan")
            if self._rewrite_added:
                new_list.append(write_manifest(
                    metadata_dir,
                    [ManifestEntry(STATUS_ADDED, f, snap_id, seq, seq)
                     for f in self._rewrite_added],
                    spec.spec_id, CONTENT_DATA, snap_id, seq, pf_names,
                    schema_json))
            if purge:
                files_to_delete.extend(sorted(removed))
            # same label as full replace: row-level changes across a
            # rewrite are not derivable, incremental readers resync
            operation = "replace"
            added = self._rewrite_added
        else:
            new_list = list(old_entries)
            if self._superseded_dvs:
                new_list = self._drop_superseded_dvs(
                    metadata_dir, new_list, md, snap_id, seq, schema_json)
            # manifest-list content codes: 0=data, 1=deletes
            # (manifest_list.rs:47-52) — distinct from DataFile.content
            scoped_dels, glob_dels = list(self._deletes), []
            if spec.fields:
                scoped_dels = [f for f in self._deletes if f.partition]
                glob_dels = [f for f in self._deletes if not f.partition]
            packs = [(0, self._appended, spec.spec_id, pf_names),
                     (1, scoped_dels, spec.spec_id, pf_names)]
            if glob_dels:
                # Per the Iceberg spec a GLOBAL delete is expressed by
                # an UNPARTITIONED partition spec on its manifest; an
                # all-null tuple of the table's partitioned spec would
                # be read by a foreign engine (Spark/Trino/the
                # reference) as "scoped to the null partition" and
                # resurrect deleted rows. Reuse a field-less spec if
                # one exists, else register one — never as default.
                unpart = next((s for s in md.partition_specs.values()
                               if not s.fields), None)
                if unpart is None:
                    from iceberg_rust_archive_spark.spec.partition import (
                        PartitionSpec,
                    )
                    unpart = PartitionSpec(
                        max(md.partition_specs, default=-1) + 1, ())
                    md = _dc_replace(
                        md, partition_specs={**md.partition_specs,
                                             unpart.spec_id: unpart})
                packs.append((1, glob_dels, unpart.spec_id, []))
            for ml_content, files, sid, names in packs:
                if files:
                    new_list = self._pack_manifests(
                        metadata_dir, new_list, files, ml_content, snap_id,
                        seq, sid, names, schema_json)
            operation = "append" if not self._deletes else "delete" \
                if not self._appended else "overwrite"
            added = self._appended + self._deletes
            if not added and not self._summary_extra \
                    and self._new_schema is None:
                # (schema changes always ride a snapshot: branch reads
                # resolve their schema via the snapshot's schema-id,
                # table_metadata.rs:156-183)
                if not self._properties and self._new_spec_fields is None \
                        and self._new_sort_order is None \
                        and self._statistics is None \
                        and self._partition_statistics is None:
                    return None, []  # true no-op
                # metadata-only commit (spec/properties evolution): no
                # data changed, so no snapshot — just the new document
                if self._properties:
                    props = dict(md.properties)
                    props.update(self._properties)
                    md = _dc_replace(md, properties=props)
                md = self._apply_statistics(md)
                return md, []  # metadata-only: no snapshot, no cleanup

        summary = {"operation": operation,
                   "added-data-files": str(len(added or [])),
                   "added-records": str(sum(f.record_count
                                            for f in (added or [])))}
        # spec-standard running totals (Snapshots§Summary): derived from
        # the manifest-list counters already in hand — no manifest reads
        summary["total-data-files"] = str(sum(
            m.added_files_count + m.existing_files_count
            for m in new_list if m.content == 0))
        summary["total-delete-files"] = str(sum(
            m.added_files_count + m.existing_files_count
            for m in new_list if m.content == 1))
        summary["total-records"] = str(sum(
            m.added_rows_count + m.existing_rows_count
            for m in new_list if m.content == 0))
        summary.update(self._summary_extra)

        manifest_list_path = write_manifest_list(metadata_dir, snap_id,
                                                 new_list)
        snapshot = Snapshot(
            snapshot_id=snap_id, sequence_number=seq,
            timestamp_ms=int(time.time() * 1000),
            manifest_list=manifest_list_path, summary=summary,
            parent_snapshot_id=parent.snapshot_id if parent else None,
            schema_id=md.current_schema_id,
            first_row_id=(row_id_start
                          if md.format_version >= 3 else None))
        new_md = md.with_snapshot(snapshot, self.branch)
        if md.format_version >= 3:
            new_md = _dc_replace(new_md, next_row_id=_next_rid[0])
        if self._properties:
            props = dict(new_md.properties)
            props.update(self._properties)
            new_md = _dc_replace(new_md, properties=props)
        new_md = self._apply_statistics(new_md)
        new_md = _dc_replace(new_md, metadata_log=new_md.metadata_log + (
            {"timestamp-ms": snapshot.timestamp_ms,
             "metadata-file": self.catalog.metadata_location(
                 self.identifier) or ""},))

        # caller performs the atomic pointer CAS
        # (iceberg-sql-catalog/src/lib.rs:429-480 semantics)
        return new_md, files_to_delete

    def commit_with_retry(self, rebuild, attempts: int = 3) -> TableMetadata:
        """Optimistic retry: on CAS failure, reload and re-apply via
        ``rebuild(txn)`` against fresh metadata."""
        last: CommitFailedError | None = None
        txn: Transaction = self
        for _ in range(attempts):
            try:
                return txn.commit()
            except CommitFailedError as e:
                last = e
                fresh, loc = self.catalog.load_tabular_with_location(
                    self.identifier)
                txn = Transaction(self.catalog, self.identifier, fresh,
                                  self.branch, base_location=loc)
                rebuild(txn)
        raise last  # type: ignore[misc]

    # --- manifest bin-packing -------------------------------------------
    @staticmethod
    def _dim_span(lo, hi):
        """Width of one partition dimension as a comparable float
        (util/mod.rs ``Value::try_sub`` stand-in). Numeric partition
        values (identity int/long, bucket, year/month/day/hour,
        truncate-int) subtract directly; dates and strings go through a
        monotone surrogate so rectangle comparison still orders them.
        Unknown bounds sort last (``inf``) — a merge target without
        summaries never wins over one with them."""
        if lo is None or hi is None:
            return float("inf")
        try:
            return float(hi) - float(lo)
        except (TypeError, ValueError):
            pass
        if isinstance(lo, str) and isinstance(hi, str):
            try:  # ISO dates (identity date partition values)
                import datetime as _dt
                return float(_dt.date.fromisoformat(hi).toordinal()
                             - _dt.date.fromisoformat(lo).toordinal())
            except ValueError:
                # lexicographic surrogate: first 8 bytes as base-256
                def enc(s):
                    b = s.encode("utf-8")[:8].ljust(8, b"\0")
                    return int.from_bytes(b, "big")
                return float(enc(hi) - enc(lo))
        return float("inf")

    @staticmethod
    def _select_merge_target(same, new_files, pf_names):
        """Merge-target choice (append.rs:100-191): partitioned tables
        pick the manifest whose partition bounding rectangle is smallest
        after expanding with the new files' rectangle, comparing spans
        with earlier-spec-field priority (``select_manifest_partitioned``
        + Rectangle::cmp_with_priority); unpartitioned tables pick the
        fewest-rows manifest (``select_manifest_unpartitioned``)."""
        if not same:
            return None
        if not pf_names:
            return min(same, key=lambda m: (m.added_rows_count
                                            + m.existing_rows_count))
        new_lo: list = []
        new_hi: list = []
        for name in pf_names:
            vals = [f.partition.get(name) for f in new_files]
            nn = [v for v in vals if v is not None]
            new_lo.append(min(nn) if nn else None)
            new_hi.append(max(nn) if nn else None)

        def expanded_spans(m):
            spans = []
            for i in range(len(pf_names)):
                s = m.partitions[i] if i < len(m.partitions) else None
                lo = s.lower_bound if s else None
                hi = s.upper_bound if s else None
                if lo is None and hi is None:
                    # no summary for this dim: contents unknown — the
                    # reference errors here (summary_to_rectangle); we
                    # deprioritize instead so legacy manifests still work
                    spans.append(float("inf"))
                    continue
                try:
                    if new_lo[i] is not None:
                        lo = new_lo[i] if lo is None else min(lo, new_lo[i])
                    if new_hi[i] is not None:
                        hi = new_hi[i] if hi is None else max(hi, new_hi[i])
                    spans.append(Transaction._dim_span(lo, hi))
                except TypeError:  # mixed-type bounds (legacy manifests)
                    spans.append(float("inf"))
            return tuple(spans)

        return min(same, key=expanded_spans)

    def _drop_superseded_dvs(self, metadata_dir, existing_list, md,
                             snap_id, seq, schema_json):
        """Rewrite delete manifests dropping DV entries whose
        ``(puffin_path, content_offset)`` is in ``self._superseded_dvs``.
        Untouched manifests carry over byte-identical (their list rows
        are reused); survivors keep ORIGINAL sequence numbers as
        STATUS_EXISTING; a manifest left empty is dropped outright."""
        out = []
        for mle in existing_list:
            if mle.content != 1:
                out.append(mle)
                continue
            entries = list(read_manifest(mle.manifest_path))
            hit = [e for e in entries
                   if e.status != STATUS_DELETED
                   and (e.data_file.file_path,
                        e.data_file.content_offset)
                   in self._superseded_dvs]
            if not hit:
                out.append(mle)
                continue
            hitset = {id(e) for e in hit}
            survivors = [
                ManifestEntry(STATUS_EXISTING, e.data_file,
                              e.snapshot_id, e.sequence_number,
                              e.file_sequence_number)
                for e in entries
                if e.status != STATUS_DELETED and id(e) not in hitset]
            if survivors:
                sp = md.partition_specs.get(mle.partition_spec_id,
                                            md.default_spec())
                out.append(write_manifest(
                    metadata_dir, survivors, sp.spec_id, 1, snap_id,
                    seq, [f.name for f in sp.fields], schema_json))
        return out

    @staticmethod
    def _pack_manifests(metadata_dir, existing_list, new_files, content,
                        snap_id, seq, spec_id, pf_names, schema_json=None):
        # merge candidates must share content AND partition spec — after
        # spec evolution, old-layout manifests keep their spec id and new
        # entries' tuples must not mix into them
        same = [m for m in existing_list
                if m.content == content and m.partition_spec_id == spec_id]
        other = [m for m in existing_list
                if not (m.content == content
                        and m.partition_spec_id == spec_id)]
        total = sum(m.added_files_count + m.existing_files_count
                    for m in same) + len(new_files)
        limit = 4 + int(math.isqrt(total))  # operation.rs:648-666

        entries = [ManifestEntry(STATUS_ADDED, f, snap_id, seq, seq)
                   for f in new_files]
        target = Transaction._select_merge_target(same, new_files, pf_names)
        if target is not None and (target.added_files_count
                                   + target.existing_files_count
                                   + len(entries)) <= limit:
            carried = [ManifestEntry(STATUS_EXISTING, e.data_file,
                                     e.snapshot_id, e.sequence_number,
                                     e.file_sequence_number)
                       for e in read_manifest(target.manifest_path)]
            merged = write_manifest(metadata_dir, carried + entries, spec_id,
                                    content, snap_id, seq, pf_names,
                                    schema_json)
            return other + [m for m in same if m is not target] + [merged]

        n_splits = 1
        if len(entries) > limit:
            n_splits = 2 ** math.ceil(math.log2(len(entries) / limit))
        chunk = math.ceil(len(entries) / n_splits)
        news = [write_manifest(metadata_dir, entries[i:i + chunk], spec_id,
                               content, snap_id, seq, pf_names, schema_json)
                for i in range(0, len(entries), chunk)]
        return other + same + news


class MultiTableTransaction:
    """Atomic commit across SEVERAL tables of one catalog — the
    reference's ``v1/{prefix}/transactions/commit`` REST surface
    (catalogs/iceberg-rest-catalog/src/apis/catalog_api_api.rs) made
    available over every catalog:

        mtt = MultiTableTransaction(catalog)
        mtt.transaction(orders).append_files(f1)
        mtt.transaction(audit_log).append_files(f2)
        mtt.commit()   # both snapshots appear, or neither

    Each per-table transaction prepares independently (manifests,
    manifest list, snapshot, metadata document content — all
    content-addressed, so an abandoned prepare orphans bytes but never
    state); the single ``catalog.commit_transaction`` call then swaps
    every pointer together. SqlCatalog runs one database transaction
    (truly atomic); pointer catalogs CAS in identifier order and roll
    back on a lost race; RestCatalog ships the batch to the server.
    A table may appear at most once per transaction (two Transaction
    objects on one base would fork its history).

    Atomicity caveat (pointer catalogs only): FileCatalog's batch is
    optimistic-atomic, not crash-atomic — a process crash BETWEEN two
    pointer CASes (or a rollback CAS that itself loses a race) leaves
    the batch partially applied with no journal to recover from; the
    'both or neither' contract holds against concurrent committers,
    not against a crashed coordinator. SqlCatalog (one DB transaction)
    and RestCatalog (one server-side ``transactions/commit``) are
    atomic under crashes too — use those where the guarantee must
    survive a dying driver."""

    def __init__(self, catalog: Catalog):
        self.catalog = catalog
        self._txns: list[Transaction] = []

    def transaction(self, table, branch: str | None = None) -> Transaction:
        """Open (and register) the per-table transaction; chain the
        usual append_files/append_delete_files/... calls on it."""
        if any(t.identifier == table.identifier for t in self._txns):
            raise ValueError(
                f"{table.identifier} already participates in this "
                "multi-table transaction")
        txn = table.new_transaction(branch)
        self._txns.append(txn)
        return txn

    def commit(self) -> None:
        prepared = []
        for txn in self._txns:
            new_md, to_delete = txn._prepare()
            if new_md is not None:
                prepared.append((txn, new_md, to_delete))
        if not prepared:
            return
        self.catalog.commit_transaction(
            [(t.identifier, md, t.base_location)
             for t, md, _dels in prepared])
        for _t, _md, dels in prepared:
            _remove_physical(dels)

    def commit_with_retry(self, rebuild, attempts: int = 3) -> None:
        """Optimistic retry for the whole batch: on a lost CAS race,
        ``rebuild(mtt)`` re-registers every table (freshly loaded) and
        re-applies its operations on a NEW MultiTableTransaction —
        the multi-table analog of Transaction.commit_with_retry::

            def build(mtt):
                mtt.transaction(Table.load(cat, "db.a")).append_files(fa)
                mtt.transaction(Table.load(cat, "db.b")).append_files(fb)
            mtt = MultiTableTransaction(cat); build(mtt)
            mtt.commit_with_retry(build)
        """
        last: CommitFailedError | None = None
        mtt: MultiTableTransaction = self
        for _ in range(attempts):
            try:
                return mtt.commit()
            except CommitFailedError as e:
                last = e
                mtt = MultiTableTransaction(self.catalog)
                rebuild(mtt)
        raise last  # type: ignore[misc]
