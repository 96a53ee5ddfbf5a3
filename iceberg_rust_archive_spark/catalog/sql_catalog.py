"""SQL catalog over any DBAPI driver (catalogs/iceberg-sql-catalog/
src/lib.rs:43-640).

Same schema as the reference's ``iceberg_tables`` and the identical
optimistic CAS: ``UPDATE ... SET metadata_location = ? WHERE ... AND
metadata_location = <previous>`` with rowcount check (lib.rs:464-472).

The reference runs this on Postgres/MySQL/SQLite through sqlx's
any-driver (lib.rs:43-102). The Python analog is a DBAPI seam: pass
``connection_factory`` (a zero-arg callable returning a DBAPI
connection — psycopg2/pymysql/anything with cursors and rowcount) and
the driver's ``paramstyle``; the default remains embedded sqlite3 by
path. Every statement runs through a cursor, placeholders rewrite per
paramstyle, and transactions use BEGIN IMMEDIATE on sqlite (writer
lock upgrade at BEGIN, not first write) vs the driver's own
commit()/rollback() elsewhere — the CAS itself is dialect-free."""

from __future__ import annotations

import sqlite3
import threading
from contextlib import contextmanager

from iceberg_rust_archive_spark.catalog.base import (
    Catalog, CommitFailedError, NoSuchTableError, parse_identifier,
)

# VARCHAR key columns, not TEXT: MySQL/InnoDB rejects TEXT primary-key
# members outright (error 1170 needs a key length), sqlite treats
# VARCHAR(n) as TEXT affinity, and Postgres accepts both — the same
# widths the Iceberg JDBC catalog standardizes on.
_DDL = [
    """CREATE TABLE IF NOT EXISTS iceberg_tables (
    catalog_name VARCHAR(255) NOT NULL,
    table_namespace VARCHAR(255) NOT NULL,
    table_name VARCHAR(255) NOT NULL,
    metadata_location VARCHAR(1000),
    previous_metadata_location VARCHAR(1000),
    PRIMARY KEY (catalog_name, table_namespace, table_name)
)""",
    """CREATE TABLE IF NOT EXISTS iceberg_namespaces (
    catalog_name VARCHAR(255) NOT NULL,
    namespace VARCHAR(255) NOT NULL,
    PRIMARY KEY (catalog_name, namespace)
)""",
]


def _is_duplicate_key(exc: BaseException) -> bool:
    """DUPLICATE-KEY detection across drivers without importing them.
    Being an IntegrityError is necessary but NOT sufficient — NOT
    NULL/CHECK/FK violations subclass it too, and swallowing those as
    'already exists' would turn a schema error into a silent no-op or
    a futile commit-retry loop. Sufficient = a uniqueness-specific
    class (psycopg2 UniqueViolation) or a uniqueness-specific message
    (sqlite 'UNIQUE constraint failed', MySQL 1062 'Duplicate entry',
    generic 'primary key')."""
    if not any("IntegrityError" in c.__name__ for c in type(exc).__mro__):
        return False
    if any("UniqueViolation" in c.__name__ for c in type(exc).__mro__):
        return True
    # Driver-specific codes BEFORE the message heuristic — exact, so a
    # CHECK/FK violation whose human message happens to contain
    # 'unique'/'duplicate' can't be misclassified as already-exists
    # (r15 ADVICE). SQLSTATE 23505 = unique_violation (psycopg2 .pgcode
    # / psycopg3 .sqlstate); MySQL errno 1062 = ER_DUP_ENTRY
    # (pymysql/MySQLdb ship it as args[0]). A present-but-different
    # code is a definitive NO.
    code = getattr(exc, "pgcode", None) or getattr(exc, "sqlstate", None)
    if code is not None:
        return code == "23505"
    args = getattr(exc, "args", ())
    if args and isinstance(args[0], int):
        return args[0] == 1062
    import re as _re
    return bool(_re.search(r"unique|duplicate|primary key",
                           str(exc), _re.IGNORECASE))


class SqlCatalog(Catalog):
    def __init__(self, db_path: str | None = None, name: str = "sql", *,
                 connection_factory=None, paramstyle: str = "qmark",
                 dialect: str | None = None):
        if db_path is None and connection_factory is None:
            raise ValueError("need db_path or connection_factory")
        self.db_path = db_path
        self.name = name
        self._lock = threading.Lock()
        if connection_factory is None:
            self._factory = self._sqlite_conn
            self.dialect = "sqlite"
            self.paramstyle = "qmark"
        else:
            self._factory = connection_factory
            self.dialect = dialect or "generic"
            self.paramstyle = paramstyle
        with self._tx() as con:
            for ddl in _DDL:
                con.cursor().execute(ddl)

    def _sqlite_conn(self) -> sqlite3.Connection:
        con = sqlite3.connect(self.db_path, timeout=30)
        con.isolation_level = None  # explicit transactions
        return con

    def _q(self, sql: str) -> str:
        """qmark → the driver's placeholder style. The statements keep
        the reference's qmark spelling (lib.rs:429-480); format/
        pyformat drivers (psycopg2, pymysql) get %s. Quote-aware: a
        '?' inside a string literal is NOT a placeholder and stays
        verbatim, and a literal '%' anywhere must double to '%%' under
        format drivers (psycopg2 applies %-interpolation to the whole
        statement when params are present, quoted or not) — the blind
        str.replace this replaces would silently corrupt either (r15
        ADVICE)."""
        if self.paramstyle == "qmark":
            return sql
        from iceberg_rust_archive_spark.predicates import _mask_quoted
        masked = _mask_quoted(sql)
        fmt = self.paramstyle in ("format", "pyformat")
        out, n = [], 0
        for i, ch in enumerate(sql):
            if fmt and ch == "%":
                out.append("%%")
            elif ch == "?" and masked[i] == "?":
                if fmt:
                    out.append("%s")
                elif self.paramstyle == "numeric":
                    n += 1
                    out.append(f":{n}")
                else:
                    out.append(ch)
            else:
                out.append(ch)
        return "".join(out)

    @contextmanager
    def _tx(self, immediate: bool = False):
        """One transaction on a fresh connection: sqlite upgrades to
        the writer lock AT BEGIN when ``immediate`` (the CAS must not
        deadlock mid-transaction); DBAPI drivers open transactions
        implicitly and commit()/rollback() on the connection."""
        con = self._factory()
        try:
            if self.dialect == "sqlite" and immediate:
                con.cursor().execute("BEGIN IMMEDIATE")
            yield con
            if self.dialect == "sqlite":
                con.execute("COMMIT") if con.in_transaction else None
            else:
                con.commit()
        except BaseException:
            try:
                if self.dialect == "sqlite":
                    if con.in_transaction:
                        con.execute("ROLLBACK")
                else:
                    con.rollback()
            except Exception:  # noqa: BLE001 — surface the original
                pass
            raise
        finally:
            con.close()

    def _fetchall(self, sql: str, params=()) -> list:
        with self._tx() as con:
            cur = con.cursor()
            cur.execute(self._q(sql), params)
            return cur.fetchall()

    # --- namespaces ------------------------------------------------------
    def create_namespace(self, namespace: str) -> None:
        with self._tx() as con:
            try:
                con.cursor().execute(self._q(
                    "INSERT INTO iceberg_namespaces VALUES (?, ?)"),
                    (self.name, namespace))
            except Exception as e:  # noqa: BLE001 — driver-specific
                if not _is_duplicate_key(e):
                    raise
                # already exists — idempotent like INSERT OR IGNORE

    def drop_namespace(self, namespace: str) -> None:
        with self._tx(immediate=True) as con:
            cur = con.cursor()
            cur.execute(self._q(
                "SELECT count(*) FROM iceberg_tables WHERE catalog_name=? "
                "AND table_namespace=?"), (self.name, namespace))
            if cur.fetchone()[0]:
                raise ValueError(f"namespace {namespace!r} not empty")
            cur.execute(self._q(
                "DELETE FROM iceberg_namespaces WHERE catalog_name=? AND "
                "namespace=?"), (self.name, namespace))

    def list_namespaces(self) -> list[str]:
        rows = self._fetchall(
            "SELECT namespace FROM iceberg_namespaces WHERE "
            "catalog_name=? ORDER BY namespace", (self.name,))
        return [r[0] for r in rows]

    # --- tabulars --------------------------------------------------------
    def list_tabulars(self, namespace: str) -> list[str]:
        rows = self._fetchall(
            "SELECT table_name FROM iceberg_tables WHERE catalog_name=? "
            "AND table_namespace=? ORDER BY table_name",
            (self.name, namespace))
        return [f"{namespace}.{r[0]}" for r in rows]

    def metadata_location(self, identifier: str) -> str | None:
        ns, name = parse_identifier(identifier)
        rows = self._fetchall(
            "SELECT metadata_location FROM iceberg_tables WHERE "
            "catalog_name=? AND table_namespace=? AND table_name=?",
            (self.name, ns, name))
        return rows[0][0] if rows else None

    def _cas_update(self, cur, ident: str, new_loc: str,
                    expected_old: str) -> None:
        """The reference's CAS statement verbatim (lib.rs:464-472):
        conditional UPDATE + rowcount check. On Postgres/MySQL a
        concurrent commit makes the WHERE match zero rows — same
        rowcount signal as sqlite."""
        ns, name = parse_identifier(ident)
        cur.execute(self._q(
            "UPDATE iceberg_tables SET metadata_location=?, "
            "previous_metadata_location=? WHERE catalog_name=? "
            "AND table_namespace=? AND table_name=? AND "
            "metadata_location=?"),
            (new_loc, expected_old, self.name, ns, name, expected_old))
        if cur.rowcount != 1:
            raise CommitFailedError(
                f"{ident}: expected pointer {expected_old} moved "
                "(concurrent commit)")

    def _set_pointer(self, identifier: str, new_location: str,
                     expected_old: str | None) -> None:
        ns, name = parse_identifier(identifier)
        with self._lock, self._tx(immediate=True) as con:
            cur = con.cursor()
            if expected_old is None:
                try:
                    cur.execute(self._q(
                        "INSERT INTO iceberg_tables VALUES (?,?,?,?,NULL)"),
                        (self.name, ns, name, new_location))
                except Exception as e:  # noqa: BLE001 — driver-specific
                    if _is_duplicate_key(e):
                        raise CommitFailedError(
                            f"{identifier} already exists") from None
                    raise
            else:
                self._cas_update(cur, identifier, new_location,
                                 expected_old)

    def commit_transaction(self, changes: list) -> None:
        """Truly atomic multi-table commit: every pointer CAS runs in
        ONE transaction — all rows move or none do, with no rollback
        window for readers to observe."""
        staged = [(ident, self._write_metadata_file(md), exp)
                  for ident, md, exp in changes]
        with self._lock, self._tx(immediate=True) as con:
            cur = con.cursor()
            for ident, new_loc, exp in staged:
                self._cas_update(cur, ident, new_loc, exp)

    def _remove_pointer(self, identifier: str, expected: str) -> None:
        """Rename support: CAS delete — the row goes only if it still
        points at the location read when the rename started."""
        ns, name = parse_identifier(identifier)
        with self._lock, self._tx(immediate=True) as con:
            cur = con.cursor()
            cur.execute(self._q(
                "DELETE FROM iceberg_tables WHERE catalog_name=? AND "
                "table_namespace=? AND table_name=? AND "
                "metadata_location=?"), (self.name, ns, name, expected))
            if cur.rowcount != 1:
                raise CommitFailedError(
                    f"{identifier}: pointer moved during rename")

    def drop_tabular(self, identifier: str) -> None:
        ns, name = parse_identifier(identifier)
        with self._tx(immediate=True) as con:
            cur = con.cursor()
            cur.execute(self._q(
                "DELETE FROM iceberg_tables WHERE catalog_name=? AND "
                "table_namespace=? AND table_name=?"),
                (self.name, ns, name))
            if cur.rowcount != 1:
                raise NoSuchTableError(identifier)
