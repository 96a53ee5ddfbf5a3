"""SQL catalog on sqlite (catalogs/iceberg-sql-catalog/src/lib.rs:43-640).

Same schema as the reference's ``iceberg_tables`` and the identical
optimistic CAS: ``UPDATE ... SET metadata_location = ? WHERE ... AND
metadata_location = <previous>`` with rowcount check (lib.rs:464-472)."""

from __future__ import annotations

import sqlite3
import threading

from iceberg_rust_archive_spark.catalog.base import (
    Catalog, CommitFailedError, NoSuchTableError, parse_identifier,
)

_DDL = """
CREATE TABLE IF NOT EXISTS iceberg_tables (
    catalog_name TEXT NOT NULL,
    table_namespace TEXT NOT NULL,
    table_name TEXT NOT NULL,
    metadata_location TEXT,
    previous_metadata_location TEXT,
    PRIMARY KEY (catalog_name, table_namespace, table_name)
);
CREATE TABLE IF NOT EXISTS iceberg_namespaces (
    catalog_name TEXT NOT NULL,
    namespace TEXT NOT NULL,
    PRIMARY KEY (catalog_name, namespace)
);
"""


class SqlCatalog(Catalog):
    def __init__(self, db_path: str, name: str = "sql"):
        self.db_path = db_path
        self.name = name
        self._lock = threading.Lock()
        with self._conn() as con:
            con.executescript(_DDL)

    def _conn(self) -> sqlite3.Connection:
        con = sqlite3.connect(self.db_path, timeout=30)
        con.isolation_level = None  # explicit transactions
        return con

    # --- namespaces ------------------------------------------------------
    def create_namespace(self, namespace: str) -> None:
        with self._conn() as con:
            con.execute(
                "INSERT OR IGNORE INTO iceberg_namespaces VALUES (?, ?)",
                (self.name, namespace))

    def drop_namespace(self, namespace: str) -> None:
        with self._conn() as con:
            n = con.execute(
                "SELECT count(*) FROM iceberg_tables WHERE catalog_name=? "
                "AND table_namespace=?", (self.name, namespace)).fetchone()[0]
            if n:
                raise ValueError(f"namespace {namespace!r} not empty")
            con.execute(
                "DELETE FROM iceberg_namespaces WHERE catalog_name=? AND "
                "namespace=?", (self.name, namespace))

    def list_namespaces(self) -> list[str]:
        with self._conn() as con:
            rows = con.execute(
                "SELECT namespace FROM iceberg_namespaces WHERE "
                "catalog_name=? ORDER BY namespace", (self.name,)).fetchall()
        return [r[0] for r in rows]

    # --- tabulars --------------------------------------------------------
    def list_tabulars(self, namespace: str) -> list[str]:
        with self._conn() as con:
            rows = con.execute(
                "SELECT table_name FROM iceberg_tables WHERE catalog_name=? "
                "AND table_namespace=? ORDER BY table_name",
                (self.name, namespace)).fetchall()
        return [f"{namespace}.{r[0]}" for r in rows]

    def metadata_location(self, identifier: str) -> str | None:
        ns, name = parse_identifier(identifier)
        with self._conn() as con:
            row = con.execute(
                "SELECT metadata_location FROM iceberg_tables WHERE "
                "catalog_name=? AND table_namespace=? AND table_name=?",
                (self.name, ns, name)).fetchone()
        return row[0] if row else None

    def _set_pointer(self, identifier: str, new_location: str,
                     expected_old: str | None) -> None:
        ns, name = parse_identifier(identifier)
        with self._lock, self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            try:
                if expected_old is None:
                    try:
                        con.execute(
                            "INSERT INTO iceberg_tables VALUES (?,?,?,?,NULL)",
                            (self.name, ns, name, new_location))
                    except sqlite3.IntegrityError:
                        raise CommitFailedError(
                            f"{identifier} already exists") from None
                else:
                    cur = con.execute(
                        "UPDATE iceberg_tables SET metadata_location=?, "
                        "previous_metadata_location=? WHERE catalog_name=? "
                        "AND table_namespace=? AND table_name=? AND "
                        "metadata_location=?",
                        (new_location, expected_old, self.name, ns, name,
                         expected_old))
                    if cur.rowcount != 1:
                        raise CommitFailedError(
                            f"{identifier}: expected pointer {expected_old} "
                            "moved (concurrent commit)")
                con.execute("COMMIT")
            except BaseException:
                con.execute("ROLLBACK")
                raise

    def commit_transaction(self, changes: list) -> None:
        """Truly atomic multi-table commit: every pointer CAS runs in
        ONE BEGIN IMMEDIATE transaction — all rows move or none do,
        with no rollback window for readers to observe."""
        staged = [(ident, self._write_metadata_file(md), exp)
                  for ident, md, exp in changes]
        with self._lock, self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            try:
                for ident, new_loc, exp in staged:
                    ns, name = parse_identifier(ident)
                    cur = con.execute(
                        "UPDATE iceberg_tables SET metadata_location=?, "
                        "previous_metadata_location=? WHERE "
                        "catalog_name=? AND table_namespace=? AND "
                        "table_name=? AND metadata_location=?",
                        (new_loc, exp, self.name, ns, name, exp))
                    if cur.rowcount != 1:
                        raise CommitFailedError(
                            f"{ident}: expected pointer {exp} moved "
                            "(concurrent commit)")
                con.execute("COMMIT")
            except BaseException:
                con.execute("ROLLBACK")
                raise

    def _remove_pointer(self, identifier: str, expected: str) -> None:
        """Rename support: CAS delete — the row goes only if it still
        points at the location read when the rename started."""
        ns, name = parse_identifier(identifier)
        with self._lock, self._conn() as con:
            cur = con.execute(
                "DELETE FROM iceberg_tables WHERE catalog_name=? AND "
                "table_namespace=? AND table_name=? AND "
                "metadata_location=?", (self.name, ns, name, expected))
            if cur.rowcount != 1:
                raise CommitFailedError(
                    f"{identifier}: pointer moved during rename")

    def drop_tabular(self, identifier: str) -> None:
        ns, name = parse_identifier(identifier)
        with self._conn() as con:
            cur = con.execute(
                "DELETE FROM iceberg_tables WHERE catalog_name=? AND "
                "table_namespace=? AND table_name=?", (self.name, ns, name))
            if cur.rowcount != 1:
                raise NoSuchTableError(identifier)
