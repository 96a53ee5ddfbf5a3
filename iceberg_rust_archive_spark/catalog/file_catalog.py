"""Filesystem catalog (catalogs/iceberg-file-catalog/src/lib.rs:49-580).

Layout: ``<root>/<namespace>/<name>/pointer.json`` holds the current
metadata location. CAS = write temp + ``os.rename`` guarded by a
same-directory lock file created with O_EXCL (atomic on POSIX)."""

from __future__ import annotations

import contextlib
import json
import os
import shutil

from iceberg_rust_archive_spark.catalog.base import (
    Catalog, CommitFailedError, NoSuchTableError, parse_identifier,
)


class FileCatalog(Catalog):
    def __init__(self, root: str, name: str = "file"):
        self.root = root.rstrip("/")
        self.name = name
        os.makedirs(self.root, exist_ok=True)

    def _ns_dir(self, namespace: str) -> str:
        return os.path.join(self.root, namespace)

    def _tab_dir(self, identifier: str) -> str:
        ns, name = parse_identifier(identifier)
        return os.path.join(self._ns_dir(ns), name)

    def _pointer_path(self, identifier: str) -> str:
        return os.path.join(self._tab_dir(identifier), "pointer.json")

    # --- namespaces ------------------------------------------------------
    def create_namespace(self, namespace: str) -> None:
        os.makedirs(self._ns_dir(namespace), exist_ok=True)

    def drop_namespace(self, namespace: str) -> None:
        d = self._ns_dir(namespace)
        if os.path.isdir(d):
            if any(os.scandir(d)):
                raise ValueError(f"namespace {namespace!r} not empty")
            os.rmdir(d)

    def list_namespaces(self) -> list[str]:
        return sorted(e.name for e in os.scandir(self.root) if e.is_dir())

    # --- tabulars --------------------------------------------------------
    def list_tabulars(self, namespace: str) -> list[str]:
        d = self._ns_dir(namespace)
        if not os.path.isdir(d):
            return []
        return sorted(f"{namespace}.{e.name}" for e in os.scandir(d)
                      if e.is_dir() and
                      os.path.exists(os.path.join(e.path, "pointer.json")))

    def metadata_location(self, identifier: str) -> str | None:
        p = self._pointer_path(identifier)
        if not os.path.exists(p):
            return None
        with open(p, encoding="utf-8") as f:
            return json.load(f)["metadata-location"]

    def _set_pointer(self, identifier: str, new_location: str,
                     expected_old: str | None) -> None:
        d = self._tab_dir(identifier)
        os.makedirs(d, exist_ok=True)
        lock = os.path.join(d, ".commit.lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CommitFailedError(
                f"concurrent commit in flight for {identifier}") from None
        try:
            current = self.metadata_location(identifier)
            if current != expected_old:
                raise CommitFailedError(
                    f"{identifier}: pointer is {current}, expected "
                    f"{expected_old}")
            tmp = self._pointer_path(identifier) + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump({"metadata-location": new_location,
                           "previous-metadata-location": current}, f)
            os.rename(tmp, self._pointer_path(identifier))
        finally:
            os.close(fd)
            with contextlib.suppress(OSError):
                os.remove(lock)

    def drop_tabular(self, identifier: str) -> None:
        d = self._tab_dir(identifier)
        if not os.path.exists(os.path.join(d, "pointer.json")):
            raise NoSuchTableError(identifier)
        shutil.rmtree(d)
