"""REST catalog client (SURVEY §2 A29; reference:
catalogs/iceberg-rest-catalog/src/catalog.rs).

Speaks an Iceberg-REST-shaped HTTP surface over the same pointer+CAS
model as the SQL/File catalogs: the server stores
``namespace.table → metadata-location`` and performs the conditional
update at commit time (the HTTP twin of iceberg-sql-catalog's
``UPDATE ... WHERE metadata_location = <prev>``, lib.rs:429-480).

Paths follow the Iceberg REST spec layout (/v1/namespaces,
/v1/namespaces/{ns}/tables/{tbl}); the commit body is the one
deliberate divergence — we transmit
``{"metadata-location", "expected-metadata-location"}`` instead of the
spec's updates/requirements list, because in this engine metadata
documents live on shared storage (like the File catalog) and only the
pointer is catalog state. A 409 response is the optimistic-concurrency
conflict (CommitFailedError).

stdlib urllib only — no extra dependencies; tests run an in-process
HTTP server (tests/test_rest_catalog.py).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from iceberg_rust_archive_spark.catalog.base import (
    Catalog, CommitFailedError, NoSuchTableError, parse_identifier,
)


class RestCatalog(Catalog):
    def __init__(self, base_url: str, token: str | None = None,
                 timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.token = token
        self.timeout = timeout

    # --- http plumbing ---------------------------------------------------
    def _request(self, method: str, path: str, body: dict | None = None,
                 ok_statuses: tuple[int, ...] = (200, 201, 204)):
        url = f"{self.base_url}/v1/{path}"
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                payload = resp.read()
                if resp.status not in ok_statuses:
                    raise RuntimeError(
                        f"{method} {url} -> {resp.status}: {payload[:200]}")
                return json.loads(payload) if payload else None
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise NoSuchTableError(path) from None
            if e.code == 409:
                raise CommitFailedError(path) from None
            raise RuntimeError(
                f"{method} {url} -> {e.code}: {e.read()[:200]}") from None

    # --- namespaces ------------------------------------------------------
    def create_namespace(self, namespace: str) -> None:
        self._request("POST", "namespaces",
                      {"namespace": namespace.split(".")})

    def drop_namespace(self, namespace: str) -> None:
        self._request("DELETE", f"namespaces/{namespace}")

    def list_namespaces(self) -> list[str]:
        out = self._request("GET", "namespaces")
        return [".".join(ns) for ns in out.get("namespaces", [])]

    # --- tabulars --------------------------------------------------------
    def list_tabulars(self, namespace: str) -> list[str]:
        out = self._request("GET", f"namespaces/{namespace}/tables")
        return [f"{'.'.join(ident['namespace'])}.{ident['name']}"
                for ident in out.get("identifiers", [])]

    def metadata_location(self, identifier: str) -> str | None:
        ns, name = parse_identifier(identifier)
        try:
            out = self._request("GET", f"namespaces/{ns}/tables/{name}")
        except NoSuchTableError:
            return None
        return out.get("metadata-location")

    def _set_pointer(self, identifier: str, new_location: str,
                     expected_old: str | None) -> None:
        ns, name = parse_identifier(identifier)
        self._request("POST", f"namespaces/{ns}/tables/{name}", {
            "metadata-location": new_location,
            "expected-metadata-location": expected_old,
        })

    def drop_tabular(self, identifier: str) -> None:
        ns, name = parse_identifier(identifier)
        self._request("DELETE", f"namespaces/{ns}/tables/{name}")
