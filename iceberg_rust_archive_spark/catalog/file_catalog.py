"""Filesystem/object-store catalog (catalogs/iceberg-file-catalog/src/lib.rs:49-580).

Layout: ``<root>/<namespace>/<name>/pointer.json`` holds the current
metadata location. CAS = read-check-write guarded by a same-directory
lock object created with create-exclusive semantics (O_EXCL locally,
conditional put on object stores).

All I/O goes through ``object_store.store_for(root)``, so the same
catalog serves ``/local/path``, ``memory://wh`` (tests), or
``s3://bucket/wh`` roots — the reference's file catalog gets this from
its object_store handle the same way (lib.rs:49-101). Namespaces are
directory prefixes; a ``.namespace`` marker object makes empty
namespaces listable on stores that have no directory notion."""

from __future__ import annotations

import contextlib
import json

from iceberg_rust_archive_spark.catalog.base import (
    Catalog, CommitFailedError, NoSuchTableError, parse_identifier,
)
from iceberg_rust_archive_spark.object_store import store_for


class FileCatalog(Catalog):
    def __init__(self, root: str, name: str = "file"):
        self.root = root.rstrip("/")
        self.name = name
        self.store = store_for(self.root)

    def _ns_dir(self, namespace: str) -> str:
        return f"{self.root}/{namespace}"

    def _tab_dir(self, identifier: str) -> str:
        ns, name = parse_identifier(identifier)
        return f"{self._ns_dir(ns)}/{name}"

    def _pointer_path(self, identifier: str) -> str:
        return f"{self._tab_dir(identifier)}/pointer.json"

    # --- namespaces ------------------------------------------------------
    def create_namespace(self, namespace: str) -> None:
        marker = f"{self._ns_dir(namespace)}/.namespace"
        if not self.store.exists(marker):
            self.store.write_bytes(marker, b"")

    def drop_namespace(self, namespace: str) -> None:
        under = [p for p in self.store.list(self._ns_dir(namespace))
                 if not p.endswith("/.namespace")]
        if under:
            raise ValueError(f"namespace {namespace!r} not empty")
        with contextlib.suppress(FileNotFoundError):
            self.store.remove(f"{self._ns_dir(namespace)}/.namespace")

    def list_namespaces(self) -> list[str]:
        out = set()
        for p in self.store.list(self.root):
            rel = p[len(self.root) + 1:]
            if "/" in rel:
                out.add(rel.split("/", 1)[0])
        return sorted(out)

    # --- tabulars --------------------------------------------------------
    def list_tabulars(self, namespace: str) -> list[str]:
        out = []
        prefix = self._ns_dir(namespace)
        for p in self.store.list(prefix):
            rel = p[len(prefix) + 1:]
            if rel.count("/") == 1 and rel.endswith("/pointer.json"):
                out.append(f"{namespace}.{rel.split('/', 1)[0]}")
        return sorted(out)

    def metadata_location(self, identifier: str) -> str | None:
        p = self._pointer_path(identifier)
        if not self.store.exists(p):
            return None
        return json.loads(self.store.read_bytes(p))["metadata-location"]

    def _set_pointer(self, identifier: str, new_location: str,
                     expected_old: str | None) -> None:
        lock = f"{self._tab_dir(identifier)}/.commit.lock"
        try:
            self.store.create_exclusive(lock)
        except FileExistsError:
            raise CommitFailedError(
                f"concurrent commit in flight for {identifier}") from None
        try:
            current = self.metadata_location(identifier)
            if current != expected_old:
                raise CommitFailedError(
                    f"{identifier}: pointer is {current}, expected "
                    f"{expected_old}")
            self.store.write_bytes(
                self._pointer_path(identifier),
                json.dumps({"metadata-location": new_location,
                            "previous-metadata-location": current})
                .encode("utf-8"))
        finally:
            with contextlib.suppress(OSError, FileNotFoundError):
                self.store.remove(lock)

    def _remove_pointer(self, identifier: str, expected: str) -> None:
        """Rename support: remove ONLY ``pointer.json`` (under the same
        commit lock as _set_pointer). The table's metadata/ and data/
        may be co-located in this very directory when the table was
        created with the default location — drop_tabular would delete
        them, turning a rename into data loss; the renamed table keeps
        reading them from the unchanged location."""
        lock = f"{self._tab_dir(identifier)}/.commit.lock"
        try:
            self.store.create_exclusive(lock)
        except FileExistsError:
            raise CommitFailedError(
                f"concurrent commit in flight for {identifier}") from None
        try:
            if self.metadata_location(identifier) != expected:
                raise CommitFailedError(
                    f"{identifier}: pointer moved during rename")
            self.store.remove(self._pointer_path(identifier))
        finally:
            with contextlib.suppress(OSError, FileNotFoundError):
                self.store.remove(lock)

    def drop_tabular(self, identifier: str) -> None:
        d = self._tab_dir(identifier)
        if not self.store.exists(f"{d}/pointer.json"):
            raise NoSuchTableError(identifier)
        for p in self.store.list(d):
            with contextlib.suppress(FileNotFoundError):
                self.store.remove(p)
