"""AWS Glue catalog (catalogs/iceberg-glue-catalog/src/lib.rs:44-580).

Mapping (same as the reference):
- namespace  → Glue database
- tabular    → Glue table with ``table_type: ICEBERG`` and the current
  pointer in ``Parameters["metadata_location"]`` (+ previous pointer in
  ``previous_metadata_location`` — utils::get_parameters)
- commit CAS → read the table's ``VersionId``, verify the parameter
  still equals the expected location, then ``update_table`` carrying
  that ``VersionId`` — Glue rejects a concurrent writer with
  ``ConcurrentModificationException`` (lib.rs:244-272, 346, 416), which
  surfaces as ``CommitFailedError`` for the optimistic-retry loop.

The boto3 client is injectable: tests drive the full protocol against a
boto3-shaped fake (no AWS account in the loop), production passes
nothing and gets ``boto3.client("glue")``.
"""

from __future__ import annotations

from iceberg_rust_archive_spark.catalog.base import (
    Catalog, CommitFailedError, NoSuchTableError, parse_identifier,
)

METADATA_LOCATION = "metadata_location"
PREV_METADATA_LOCATION = "previous_metadata_location"


def _error_code(exc: Exception) -> str:
    # boto3 ClientError carries .response["Error"]["Code"]; fakes raise
    # exceptions named like the AWS error code
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        return resp.get("Error", {}).get("Code", "")
    return type(exc).__name__


class GlueCatalog(Catalog):
    def __init__(self, client=None, name: str = "glue"):
        if client is None:
            import boto3
            client = boto3.client("glue")
        self.client = client
        self.name = name

    # --- namespaces ------------------------------------------------------
    def create_namespace(self, namespace: str) -> None:
        try:
            self.client.create_database(
                DatabaseInput={"Name": namespace})
        except Exception as e:  # noqa: BLE001
            if _error_code(e) != "AlreadyExistsException":
                raise

    def drop_namespace(self, namespace: str) -> None:
        self.client.delete_database(Name=namespace)

    def list_namespaces(self) -> list[str]:
        out, token = [], None
        while True:
            kw = {"NextToken": token} if token else {}
            page = self.client.get_databases(**kw)
            out.extend(d["Name"] for d in page.get("DatabaseList", []))
            token = page.get("NextToken")
            if not token:
                return sorted(out)

    # --- tabulars --------------------------------------------------------
    def list_tabulars(self, namespace: str) -> list[str]:
        out, token = [], None
        while True:
            kw = {"DatabaseName": namespace}
            if token:
                kw["NextToken"] = token
            page = self.client.get_tables(**kw)
            out.extend(f"{namespace}.{t['Name']}"
                       for t in page.get("TableList", []))
            token = page.get("NextToken")
            if not token:
                return sorted(out)

    def _get_table(self, identifier: str) -> dict | None:
        ns, name = parse_identifier(identifier)
        try:
            return self.client.get_table(
                DatabaseName=ns, Name=name)["Table"]
        except Exception as e:  # noqa: BLE001
            if _error_code(e) == "EntityNotFoundException":
                return None
            raise

    def metadata_location(self, identifier: str) -> str | None:
        t = self._get_table(identifier)
        if t is None:
            return None
        return t.get("Parameters", {}).get(METADATA_LOCATION)

    def _set_pointer(self, identifier: str, new_location: str,
                     expected_old: str | None) -> None:
        ns, name = parse_identifier(identifier)
        params = {METADATA_LOCATION: new_location,
                  "table_type": "ICEBERG"}
        if expected_old:
            params[PREV_METADATA_LOCATION] = expected_old
        table_input = {"Name": name, "Parameters": params}
        if expected_old is None:
            try:
                self.client.create_table(DatabaseName=ns,
                                         TableInput=table_input)
            except Exception as e:  # noqa: BLE001
                if _error_code(e) == "AlreadyExistsException":
                    raise CommitFailedError(
                        f"{identifier} created concurrently") from e
                raise
            return
        current = self._get_table(identifier)
        if current is None:
            raise NoSuchTableError(identifier)
        cur_loc = current.get("Parameters", {}).get(METADATA_LOCATION)
        if cur_loc != expected_old:
            raise CommitFailedError(
                f"{identifier}: pointer is {cur_loc}, expected "
                f"{expected_old}")
        try:
            self.client.update_table(
                DatabaseName=ns, TableInput=table_input,
                VersionId=current["VersionId"])
        except Exception as e:  # noqa: BLE001
            if _error_code(e) == "ConcurrentModificationException":
                raise CommitFailedError(
                    f"concurrent commit on {identifier}") from e
            raise

    def drop_tabular(self, identifier: str) -> None:
        ns, name = parse_identifier(identifier)
        if self._get_table(identifier) is None:
            raise NoSuchTableError(identifier)
        self.client.delete_table(DatabaseName=ns, Name=name)
