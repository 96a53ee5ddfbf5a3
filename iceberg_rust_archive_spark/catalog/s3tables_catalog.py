"""AWS S3 Tables catalog (catalogs/iceberg-s3tables-catalog/src/lib.rs:170-460).

S3 Tables is a managed Iceberg pointer store: the service owns the
table's current metadata location and CAS-advances it through
``update_table_metadata_location`` guarded by a ``versionToken``
(lib.rs:246, 321-333, 382-394) — a stale token means another writer
committed first, which surfaces as ``CommitFailedError`` for the
optimistic-retry loop. Unlike Glue there is no parameter map to manage;
the API *is* the pointer.

The boto3 ``s3tables`` client is injectable: tests drive the protocol
against a boto3-shaped fake; production passes nothing and gets
``boto3.client("s3tables")``.
"""

from __future__ import annotations

from iceberg_rust_archive_spark.catalog.base import (
    Catalog, CommitFailedError, NoSuchTableError, parse_identifier,
)


def _error_code(exc: Exception) -> str:
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        return resp.get("Error", {}).get("Code", "")
    return type(exc).__name__


class S3TablesCatalog(Catalog):
    def __init__(self, table_bucket_arn: str, client=None,
                 name: str = "s3tables"):
        if client is None:
            import boto3
            client = boto3.client("s3tables")
        self.client = client
        self.arn = table_bucket_arn
        self.name = name

    # --- namespaces ------------------------------------------------------
    def create_namespace(self, namespace: str) -> None:
        try:
            self.client.create_namespace(
                tableBucketARN=self.arn, namespace=[namespace])
        except Exception as e:  # noqa: BLE001
            if _error_code(e) != "ConflictException":
                raise

    def drop_namespace(self, namespace: str) -> None:
        self.client.delete_namespace(
            tableBucketARN=self.arn, namespace=namespace)

    def list_namespaces(self) -> list[str]:
        out, token = [], None
        while True:
            kw = {"tableBucketARN": self.arn}
            if token:
                kw["continuationToken"] = token
            page = self.client.list_namespaces(**kw)
            out.extend(n["namespace"][0]
                       for n in page.get("namespaces", []))
            token = page.get("continuationToken")
            if not token:
                return sorted(out)

    # --- tabulars --------------------------------------------------------
    def list_tabulars(self, namespace: str) -> list[str]:
        out, token = [], None
        while True:
            kw = {"tableBucketARN": self.arn, "namespace": namespace}
            if token:
                kw["continuationToken"] = token
            page = self.client.list_tables(**kw)
            out.extend(f"{namespace}.{t['name']}"
                       for t in page.get("tables", []))
            token = page.get("continuationToken")
            if not token:
                return sorted(out)

    def _get(self, identifier: str) -> dict | None:
        ns, name = parse_identifier(identifier)
        try:
            return self.client.get_table(
                tableBucketARN=self.arn, namespace=ns, name=name)
        except Exception as e:  # noqa: BLE001
            if _error_code(e) == "NotFoundException":
                return None
            raise

    def metadata_location(self, identifier: str) -> str | None:
        t = self._get(identifier)
        if t is None:
            return None
        return t.get("metadataLocation")

    def _set_pointer(self, identifier: str, new_location: str,
                     expected_old: str | None) -> None:
        ns, name = parse_identifier(identifier)
        if expected_old is None:
            try:
                self.client.create_table(
                    tableBucketARN=self.arn, namespace=ns, name=name,
                    format="ICEBERG")
            except Exception as e:  # noqa: BLE001
                if _error_code(e) == "ConflictException":
                    raise CommitFailedError(
                        f"{identifier} created concurrently") from e
                raise
        t = self._get(identifier)
        if t is None:
            raise NoSuchTableError(identifier)
        if t.get("metadataLocation") != expected_old \
                and expected_old is not None:
            raise CommitFailedError(
                f"{identifier}: pointer is {t.get('metadataLocation')}, "
                f"expected {expected_old}")
        try:
            self.client.update_table_metadata_location(
                tableBucketARN=self.arn, namespace=ns, name=name,
                versionToken=t["versionToken"],
                metadataLocation=new_location)
        except Exception as e:  # noqa: BLE001
            if _error_code(e) == "ConflictException":
                raise CommitFailedError(
                    f"concurrent commit on {identifier}") from e
            raise

    def drop_tabular(self, identifier: str) -> None:
        ns, name = parse_identifier(identifier)
        if self._get(identifier) is None:
            raise NoSuchTableError(identifier)
        self.client.delete_table(
            tableBucketARN=self.arn, namespace=ns, name=name)
