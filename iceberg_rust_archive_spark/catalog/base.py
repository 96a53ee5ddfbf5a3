"""Catalog ABC (iceberg-rust/src/catalog/mod.rs:59-412).

A catalog maps ``namespace.table`` → current metadata-location pointer and
performs the atomic compare-and-swap at commit time. Tabulars are tables,
views, or materialized views (tabular.rs:36); we dispatch on the metadata
document's shape ("table-uuid" vs "view-uuid" / "storage-table").
"""

from __future__ import annotations

import json
import os
from abc import ABC, abstractmethod

from iceberg_rust_archive_spark.spec.table_metadata import TableMetadata
from iceberg_rust_archive_spark.spec.view_metadata import (
    MaterializedViewMetadata, ViewMetadata,
)


class NoSuchTableError(Exception):
    pass


class TableAlreadyExistsError(Exception):
    pass


class CommitFailedError(Exception):
    """Optimistic-concurrency conflict: the pointer moved under us
    (commit.rs:343-372 requirement failure)."""


def parse_identifier(identifier: str) -> tuple[str, str]:
    parts = identifier.split(".")
    if len(parts) < 2:
        raise ValueError(f"identifier must be namespace.name: {identifier!r}")
    return ".".join(parts[:-1]), parts[-1]


def metadata_from_json(doc: dict):
    if "storage-table" in doc:
        return MaterializedViewMetadata.from_json(doc)
    if "view-uuid" in doc:
        return ViewMetadata.from_json(doc)
    return TableMetadata.from_json(doc)


class Catalog(ABC):
    """Namespace + tabular CRUD with CAS update (catalog/mod.rs:59-412)."""

    # --- namespaces ------------------------------------------------------
    @abstractmethod
    def create_namespace(self, namespace: str) -> None: ...

    @abstractmethod
    def drop_namespace(self, namespace: str) -> None: ...

    @abstractmethod
    def list_namespaces(self) -> list[str]: ...

    # --- tabulars --------------------------------------------------------
    @abstractmethod
    def list_tabulars(self, namespace: str) -> list[str]: ...

    @abstractmethod
    def metadata_location(self, identifier: str) -> str | None:
        """Current pointer, or None if the tabular doesn't exist."""

    @abstractmethod
    def _set_pointer(self, identifier: str, new_location: str,
                     expected_old: str | None) -> None:
        """Atomically set pointer iff it currently equals ``expected_old``
        (None = must not exist). Raise CommitFailedError otherwise."""

    @abstractmethod
    def drop_tabular(self, identifier: str) -> None: ...

    # --- shared logic ----------------------------------------------------
    def table_exists(self, identifier: str) -> bool:
        return self.metadata_location(identifier) is not None

    def load_tabular(self, identifier: str):
        return self.load_tabular_with_location(identifier)[0]

    def load_tabular_with_location(self, identifier: str):
        """Read (metadata, pointer) as a consistent pair — the pointer is
        what a subsequent commit must CAS against."""
        loc = self.metadata_location(identifier)
        if loc is None:
            raise NoSuchTableError(identifier)
        from iceberg_rust_archive_spark.object_store import store_for
        doc = json.loads(store_for(loc).read_bytes(loc).decode("utf-8"))
        return metadata_from_json(doc), loc

    def create_tabular(self, identifier: str, metadata) -> None:
        if self.table_exists(identifier):
            raise TableAlreadyExistsError(identifier)
        loc = self._write_metadata_file(metadata)
        self._set_pointer(identifier, loc, expected_old=None)

    def register_table(self, identifier: str, metadata_location: str):
        """Register an EXISTING metadata document under a new catalog
        identifier (Iceberg's registerTable): the pointer is set to the
        given location without rewriting any metadata or data — the
        migration path for adopting tables written by another catalog
        (or recovered from a metadata-log entry). The document is read
        first so a bad path fails here, not at first query. Returns the
        loaded metadata."""
        if self.table_exists(identifier):
            raise TableAlreadyExistsError(identifier)
        from iceberg_rust_archive_spark.object_store import store_for
        doc = json.loads(store_for(metadata_location)
                         .read_bytes(metadata_location).decode("utf-8"))
        md = metadata_from_json(doc)
        self._set_pointer(identifier, metadata_location,
                          expected_old=None)
        return md

    def rename_tabular(self, from_identifier: str,
                       to_identifier: str) -> None:
        """Rename = catalog pointer move (Iceberg renameTable; the REST
        spec's ``v1/{prefix}/tables/rename`` route — reference client:
        catalogs/iceberg-rest-catalog/src/apis/catalog_api_api.rs). The
        table's location, UUID, snapshot history, and every data/
        metadata file stay exactly where they are — only the catalog
        identifier changes, so a rename is O(1) regardless of table
        size. Order of operations: the target pointer is created first
        (CAS: must-not-exist), then the source pointer is removed iff
        it still holds the value read at the start — a rename racing a
        commit on the old name fails (and rolls the target back)
        rather than silently losing that commit."""
        loc = self.metadata_location(from_identifier)
        if loc is None:
            raise NoSuchTableError(from_identifier)
        if from_identifier.lower() == to_identifier.lower():
            return
        if self.table_exists(to_identifier):
            raise TableAlreadyExistsError(to_identifier)
        self._set_pointer(to_identifier, loc, expected_old=None)
        try:
            self._remove_pointer(from_identifier, expected=loc)
        except CommitFailedError:
            import contextlib
            with contextlib.suppress(Exception):
                self._remove_pointer(to_identifier, expected=loc)
            raise

    def _remove_pointer(self, identifier: str, expected: str) -> None:
        """Remove the catalog pointer iff it still equals ``expected``.
        Default check-then-drop suits catalogs whose ``drop_tabular``
        removes only the catalog entry; catalogs that co-locate data
        under the entry (FileCatalog) or can CAS the delete
        (SqlCatalog) override."""
        if self.metadata_location(identifier) != expected:
            raise CommitFailedError(
                f"{identifier}: pointer moved during rename")
        self.drop_tabular(identifier)

    def update_tabular(self, identifier: str, new_metadata,
                       expected_location: str | None = None) -> str:
        """Write new metadata doc + CAS the pointer. Returns new location."""
        if expected_location is None:
            expected_location = self.metadata_location(identifier)
        loc = self._write_metadata_file(new_metadata)
        self._set_pointer(identifier, loc, expected_old=expected_location)
        return loc

    def commit_transaction(self, changes: list) -> None:
        """Multi-table atomic commit (the REST spec's
        ``v1/{prefix}/transactions/commit`` — reference client:
        catalogs/iceberg-rest-catalog/src/apis/catalog_api_api.rs).
        ``changes`` = ``[(identifier, new_metadata,
        expected_location), ...]``.

        Pointer-catalog realization: all metadata documents are
        written first (content-addressed, so failures orphan bytes —
        never state), then the pointers CAS in identifier order; a
        failed CAS rolls every already-moved pointer back to its
        expected location before re-raising, so concurrent readers
        never observe a partially-applied transaction for longer than
        the rollback window. SqlCatalog overrides with a single
        database transaction (truly atomic); RestCatalog ships the
        whole batch to the server."""
        import contextlib
        staged = [(ident, self._write_metadata_file(md), exp)
                  for ident, md, exp in changes]
        staged.sort(key=lambda c: c[0].lower())  # stable lock order
        done = []
        try:
            for ident, new_loc, exp in staged:
                self._set_pointer(ident, new_loc, expected_old=exp)
                done.append((ident, new_loc, exp))
        except CommitFailedError:
            for ident, new_loc, exp in reversed(done):
                with contextlib.suppress(Exception):
                    self._set_pointer(ident, exp, expected_old=new_loc)
            raise

    @staticmethod
    def _write_metadata_file(metadata) -> str:
        if isinstance(metadata, TableMetadata):
            loc = metadata.new_metadata_location()
        else:
            version = metadata.current_version_id
            loc = (f"{metadata.location}/metadata/v{version}-"
                   f"{metadata.view_uuid[:8]}.metadata.json")
        from iceberg_rust_archive_spark.object_store import store_for
        store_for(loc).write_bytes(
            loc, json.dumps(metadata.to_json()).encode("utf-8"))
        return loc
