"""REST catalog client (SURVEY §2 A29; reference:
catalogs/iceberg-rest-catalog/src/catalog.rs).

Speaks the Iceberg REST protocol. Tables:

- ``GET  /v1/namespaces/{ns}/tables/{tbl}`` → LoadTableResult
  (``metadata-location`` + inline ``metadata``; falls back to reading
  the document from shared storage for pointer-only servers),
- ``POST /v1/namespaces/{ns}/tables`` → CreateTableRequest (name,
  location, schema, partition-spec, write-order, properties) — the
  *server* materializes the metadata, assigns the table uuid, and
  returns it (catalog.rs:300-318),
- ``POST /v1/namespaces/{ns}/tables/{tbl}`` → CommitTableRequest with
  the spec's **requirements + updates** lists (catalog.rs:320-339,
  iceberg-rust/src/catalog/commit.rs:94-260). The server validates every
  requirement (``assert-table-uuid``, ``assert-ref-snapshot-id``, ...)
  against its current metadata and answers 409 on conflict
  (CommitFailedError → the transaction layer's optimistic retry).

Views and MVs ride the spec's ``/views`` routes, mirroring the
reference's create_view / replace_view (catalog.rs:340-389,391-455):

- ``POST /v1/namespaces/{ns}/views`` → CreateViewRequest (name,
  location, schema, view-version, properties); an MV inlines its
  storage-table identifier in the view-version
  (view_metadata.rs:307-336),
- ``GET  /v1/namespaces/{ns}/views/{view}`` → LoadViewResult,
- ``POST /v1/namespaces/{ns}/views/{view}`` → CommitViewRequest with
  ``assert-view-uuid`` + ViewUpdate actions (commit.rs:67-73,262-330).

Identifier → tabular-kind is resolved by trying the table route first
and falling back to the view route on 404, exactly like the reference's
load_tabular probing (catalog.rs:257-296).

stdlib urllib only — no extra dependencies; tests run an in-process
HTTP server (tests/test_rest_catalog.py) that materializes create
requests and enforces commit requirements via
``catalog.commit.check_table_requirements`` the way
Polaris/Lakekeeper do.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from iceberg_rust_archive_spark.catalog.base import (
    Catalog, CommitFailedError, NoSuchTableError, TableAlreadyExistsError,
    metadata_from_json, parse_identifier,
)
from iceberg_rust_archive_spark.catalog.commit import (
    _version_wire, build_table_requirements, build_table_updates,
    build_view_requirements, build_view_updates,
)
from iceberg_rust_archive_spark.spec.table_metadata import TableMetadata
from iceberg_rust_archive_spark.spec.view_metadata import ViewMetadata


class RestCatalog(Catalog):
    def __init__(self, base_url: str, token: str | None = None,
                 timeout: float = 10.0, root: str | None = None,
                 credential: str | None = None,
                 scope: str = "catalog",
                 oauth2_server_uri: str | None = None,
                 page_size: int | None = None):
        """``token``: static bearer token. ``credential``
        ("client_id:client_secret"): OAuth2 client-credentials flow —
        the token is fetched from ``oauth2_server_uri`` (default: the
        spec's ``/v1/oauth/tokens`` endpoint on this catalog) lazily and
        re-fetched once on a 401, the refresh path real REST catalogs
        (Polaris/Tabular-style) require. Mirrors the reference client's
        oauth_access_token/bearer_access_token split
        (catalogs/iceberg-rest-catalog/src/catalog.rs:595-596)."""
        self.base_url = base_url.rstrip("/")
        self.token = token
        self.credential = credential
        self.scope = scope
        self.oauth2_server_uri = (oauth2_server_uri
                                  or f"{self.base_url}/v1/oauth/tokens")
        self.timeout = timeout
        # optional spec pagination hint for listing routes; listings
        # always drain next-page-token regardless (servers choose their
        # own page size when this is None)
        self.page_size = page_size
        if root is not None:
            # warehouse root for default table/view locations (the role
            # the service's warehouse config plays for real catalogs)
            self.root = root

    # --- http plumbing ---------------------------------------------------
    def _fetch_token(self) -> None:
        """OAuth2 client-credentials exchange (RFC 6749 §4.4, the
        form-encoded request the Iceberg REST spec's tokens endpoint
        accepts) → bearer token for subsequent requests."""
        import urllib.parse
        cid, _, secret = (self.credential or "").partition(":")
        form = urllib.parse.urlencode({
            "grant_type": "client_credentials",
            "client_id": cid, "client_secret": secret,
            "scope": self.scope,
        })
        req = urllib.request.Request(self.oauth2_server_uri,
                                     data=form.encode(), method="POST")
        req.add_header("Content-Type",
                       "application/x-www-form-urlencoded")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                out = json.loads(resp.read())
        except urllib.error.HTTPError as e:
            raise RuntimeError(
                f"OAuth2 token exchange failed: {e.code} "
                f"{e.read()[:300]!r}") from None
        self.token = out["access_token"]

    @staticmethod
    def _error_detail(raw: bytes) -> str:
        """Spec ErrorModel conformance: error responses carry
        ``{"error": {"message", "type", "code"}}`` (rest-catalog-open-
        api.yaml ErrorModel; catalog.rs surfaces the same struct).
        Returns ``"Type: message"`` when the body conforms, the raw
        bytes otherwise (legacy/non-spec servers)."""
        try:
            doc = json.loads(raw)
            err = doc.get("error")
            if isinstance(err, dict):
                typ = err.get("type") or ""
                msg = err.get("message") or ""
                return f"{typ}: {msg}".strip(": ") or repr(raw[:300])
        except (ValueError, AttributeError):
            pass
        return repr(raw[:300])

    def _request(self, method: str, path: str, body: dict | None = None,
                 conflict_exc: type[Exception] = CommitFailedError,
                 params: dict | None = None):
        import urllib.parse
        url = f"{self.base_url}/v1/{path}"
        if params:
            url += "?" + urllib.parse.urlencode(
                {k: v for k, v in params.items() if v is not None})
        data = json.dumps(body).encode() if body is not None else None
        if self.token is None and self.credential:
            self._fetch_token()
        for attempt in (0, 1):
            req = urllib.request.Request(url, data=data, method=method)
            req.add_header("Content-Type", "application/json")
            if self.token:
                req.add_header("Authorization", f"Bearer {self.token}")
            try:
                with urllib.request.urlopen(req,
                                            timeout=self.timeout) as resp:
                    payload = resp.read()
                    return json.loads(payload) if payload else None
            except urllib.error.HTTPError as e:
                detail = self._error_detail(e.read())
                if e.code == 401 and self.credential and attempt == 0:
                    # token expired/revoked server-side: one refresh +
                    # replay, then surface the failure
                    self._fetch_token()
                    continue
                if e.code == 404:
                    raise NoSuchTableError(f"{path}: {detail}") from None
                if e.code == 409:
                    raise conflict_exc(f"{path}: {detail}") from None
                raise RuntimeError(
                    f"{method} {url} -> {e.code}: {detail}") from None

    def _paged(self, path: str, key: str) -> list:
        """Drain a paginated listing route: follow ``next-page-token``
        until the server stops returning one (catalog.rs's generated
        client loops the same way; servers that ignore pagination just
        answer everything with no token — one round trip)."""
        out: list = []
        token = None
        while True:
            resp = self._request("GET", path, params={
                "pageToken": token, "pageSize": self.page_size}) or {}
            out.extend(resp.get(key, []))
            token = resp.get("next-page-token")
            if not token:
                return out

    # --- namespaces ------------------------------------------------------
    def create_namespace(self, namespace: str) -> None:
        self._request("POST", "namespaces",
                      {"namespace": namespace.split(".")})

    def drop_namespace(self, namespace: str) -> None:
        self._request("DELETE", f"namespaces/{namespace}")

    def list_namespaces(self) -> list[str]:
        return [".".join(ns)
                for ns in self._paged("namespaces", "namespaces")]

    def load_namespace_properties(self, namespace: str) -> dict:
        """GET /v1/namespaces/{ns} → GetNamespaceResponse properties."""
        out = self._request("GET", f"namespaces/{namespace}") or {}
        return out.get("properties", {})

    def update_namespace_properties(self, namespace: str,
                                    updates: dict | None = None,
                                    removals: list[str] | None = None
                                    ) -> dict:
        """POST /v1/namespaces/{ns}/properties
        (UpdateNamespacePropertiesRequest). Returns the spec response
        ``{"updated": [...], "removed": [...], "missing": [...]}`` —
        ``missing`` lists requested removals that did not exist."""
        return self._request(
            "POST", f"namespaces/{namespace}/properties",
            {"updates": updates or {}, "removals": removals or []})

    # --- tabulars --------------------------------------------------------
    def list_tabulars(self, namespace: str) -> list[str]:
        names = []
        for route in ("tables", "views"):
            names += [f"{'.'.join(ident['namespace'])}.{ident['name']}"
                      for ident in self._paged(
                          f"namespaces/{namespace}/{route}",
                          "identifiers")]
        return sorted(names)

    def _load_result(self, identifier: str) -> dict | None:
        """LoadTableResult / LoadViewResult: probe the table route, fall
        back to the view route (catalog.rs:257-296)."""
        ns, name = parse_identifier(identifier)
        for route in ("tables", "views"):
            try:
                return self._request(
                    "GET", f"namespaces/{ns}/{route}/{name}")
            except NoSuchTableError:
                continue
        return None

    def metadata_location(self, identifier: str) -> str | None:
        out = self._load_result(identifier)
        return out.get("metadata-location") if out else None

    def load_tabular_with_location(self, identifier: str):
        """Prefer the inline ``metadata`` document the spec returns; fall
        back to the shared-storage read for pointer-only servers."""
        out = self._load_result(identifier)
        if out is None or out.get("metadata-location") is None:
            raise NoSuchTableError(identifier)
        loc = out["metadata-location"]
        if out.get("metadata") is not None:
            return metadata_from_json(out["metadata"]), loc
        from iceberg_rust_archive_spark.object_store import store_for
        doc = json.loads(store_for(loc).read_bytes(loc).decode("utf-8"))
        return metadata_from_json(doc), loc

    # --- create ----------------------------------------------------------
    def create_tabular(self, identifier: str, metadata) -> None:
        ns, name = parse_identifier(identifier)
        if isinstance(metadata, TableMetadata):
            # spec CreateTableRequest — the server owns metadata
            # materialization and uuid assignment (catalog.rs:300-318,
            # CreateTable struct in catalog/create.rs:57-81). Callers
            # must reload to observe the server-assigned identity
            # (Table.create refreshes).
            schema = metadata.schemas[metadata.current_schema_id]
            body = {
                "name": name,
                "location": metadata.location,
                "schema": schema.to_json(),
                "partition-spec": metadata.default_spec().to_json(),
                "write-order": metadata.sort_orders[
                    metadata.default_sort_order_id].to_json(),
                "stage-create": False,
                "properties": metadata.properties,
            }
            self._request("POST", f"namespaces/{ns}/tables", body,
                          conflict_exc=TableAlreadyExistsError)
            return
        # views / MVs: spec CreateViewRequest (catalog.rs:340-364;
        # create.rs:179-194). MV storage table rides in the version.
        ver = metadata.current_version()
        body = {
            "name": name,
            "location": metadata.location,
            "schema": metadata.schemas[ver.schema_id].to_json(),
            "view-version": _version_wire(metadata, ver),
            "properties": metadata.properties,
        }
        self._request("POST", f"namespaces/{ns}/views", body,
                      conflict_exc=TableAlreadyExistsError)

    def register_table(self, identifier: str, metadata_location: str):
        """Spec RegisterTableRequest (POST
        /v1/namespaces/{ns}/register): the server adopts an existing
        metadata document under the new name — no metadata rewrite."""
        ns, name = parse_identifier(identifier)
        resp = self._request(
            "POST", f"namespaces/{ns}/register",
            {"name": name, "metadata-location": metadata_location},
            conflict_exc=TableAlreadyExistsError)
        from iceberg_rust_archive_spark.catalog.base import (
            metadata_from_json,
        )
        return metadata_from_json(resp["metadata"])

    # --- commit ----------------------------------------------------------
    def update_tabular(self, identifier: str, new_metadata,
                       expected_location: str | None = None) -> str:
        ns, name = parse_identifier(identifier)
        if expected_location is None:
            expected_location = self.metadata_location(identifier)
        # Diff against the base the WRITER read (the document at the
        # expected location), not a fresh GET — a concurrent commit
        # must surface as a requirement failure, not fold into the delta.
        from iceberg_rust_archive_spark.object_store import store_for
        base = metadata_from_json(json.loads(
            store_for(expected_location)
            .read_bytes(expected_location).decode("utf-8")))
        if isinstance(new_metadata, TableMetadata):
            body = {
                "identifier": {"namespace": ns.split("."), "name": name},
                "requirements": build_table_requirements(base, new_metadata),
                "updates": build_table_updates(base, new_metadata),
            }
            out = self._request("POST", f"namespaces/{ns}/tables/{name}",
                                body)
            return out.get("metadata-location", "")
        if not isinstance(new_metadata, ViewMetadata):
            raise TypeError(f"unsupported metadata {type(new_metadata)}")
        body = {
            "identifier": {"namespace": ns.split("."), "name": name},
            "requirements": build_view_requirements(base),
            "updates": build_view_updates(base, new_metadata),
        }
        out = self._request("POST", f"namespaces/{ns}/views/{name}", body)
        return out.get("metadata-location", "")

    def commit_transaction(self, changes: list) -> None:
        """POST /v1/transactions/commit (CommitTransactionRequest — the
        reference client's ``v1/{prefix}/transactions/commit`` route):
        one request carrying every table's requirements + updates; the
        SERVER applies them atomically (any failed requirement → 409
        and nothing commits)."""
        from iceberg_rust_archive_spark.object_store import store_for
        table_changes = []
        for identifier, new_metadata, expected_location in changes:
            if not isinstance(new_metadata, TableMetadata):
                raise TypeError(
                    "transactions/commit carries tables only")
            ns, name = parse_identifier(identifier)
            if expected_location is None:
                expected_location = self.metadata_location(identifier)
            base = metadata_from_json(json.loads(
                store_for(expected_location)
                .read_bytes(expected_location).decode("utf-8")))
            table_changes.append({
                "identifier": {"namespace": ns.split("."), "name": name},
                "requirements": build_table_requirements(base,
                                                         new_metadata),
                "updates": build_table_updates(base, new_metadata),
            })
        self._request("POST", "transactions/commit",
                      {"table-changes": table_changes})

    def _set_pointer(self, identifier: str, new_location: str,
                     expected_old: str | None) -> None:
        raise NotImplementedError(
            "RestCatalog speaks the spec commit protocol, not pointer CAS")

    def rename_tabular(self, from_identifier: str,
                       to_identifier: str) -> None:
        """POST /v1/tables/rename (RenameTableRequest — the reference
        client's ``v1/{prefix}/tables/rename`` route,
        catalogs/iceberg-rest-catalog/src/apis/catalog_api_api.rs):
        the SERVER performs the atomic pointer move; spec answers are
        404 (source missing → NoSuchTableError) and 409 (destination
        exists → CommitFailedError via the shared error mapping).
        A 404 on the table route retries the spec's ``views/rename``
        twin so view/MV identifiers rename too (same probing order as
        load_tabular)."""
        ns_s, name_s = parse_identifier(from_identifier)
        ns_d, name_d = parse_identifier(to_identifier)
        body = {
            "source": {"namespace": ns_s.split("."), "name": name_s},
            "destination": {"namespace": ns_d.split("."), "name": name_d},
        }
        try:
            self._request("POST", "tables/rename", body)
        except NoSuchTableError:
            self._request("POST", "views/rename", body)

    def drop_tabular(self, identifier: str) -> None:
        ns, name = parse_identifier(identifier)
        try:
            self._request("DELETE", f"namespaces/{ns}/tables/{name}")
        except NoSuchTableError:
            self._request("DELETE", f"namespaces/{ns}/views/{name}")

    def load_credentials(self, identifier: str) -> list[dict]:
        """GET /v1/namespaces/{ns}/tables/{tbl}/credentials
        (LoadCredentialsResponse — the reference client's
        ``load_credentials``, the one route of
        catalogs/iceberg-rest-catalog/src/apis/catalog_api_api.rs this
        engine had not yet covered): vended, scoped storage
        credentials for the table's location. Returns the spec's
        ``storage-credentials`` list —
        ``[{"prefix": "s3://…", "config": {"s3.access-key-id": …}}]``.
        404 means the table is unknown OR the server doesn't vend."""
        ns, name = parse_identifier(identifier)
        out = self._request(
            "GET", f"namespaces/{ns}/tables/{name}/credentials")
        return (out or {}).get("storage-credentials", [])

    def apply_vended_credentials(self, identifier: str) -> int:
        """Fetch vended credentials and register a scoped S3 session
        per credential prefix (``object_store.register_store``), so
        every subsequent read/write under that prefix — manifests,
        data, Puffin — uses the vended keys without threading a
        session through callers. Returns the number of prefixes
        registered. Non-s3 prefixes are skipped (local/memory stores
        need no credentials).

        Scope note: the registry is DRIVER-side module state. That
        covers all catalog/commit/manifest/Puffin I/O (driver-issued
        through ``object_store``); bulk data reads go through Spark's
        Hadoop S3A connector, which carries its own credential chain
        (set ``spark.hadoop.fs.s3a.*`` from the same vended config).
        Executor-side ``store_for`` calls (deletion-vector decode,
        distributed manifest planning) fall back to the ambient boto3
        chain — vend at the environment level for those paths."""
        from iceberg_rust_archive_spark.object_store import (
            ExpiringStore, register_store,
        )
        n = 0
        for cred in self.load_credentials(identifier):
            prefix = cred.get("prefix", "")
            if not prefix.startswith("s3://"):
                continue
            store, expires = _vended_s3_store(cred.get("config", {}))
            if expires is not None:
                # the vend carries an expiry (spec
                # s3.session-token-expires-at-ms): wrap so operations
                # past it re-fetch scoped credentials instead of
                # failing with opaque S3 errors mid-scan
                store = ExpiringStore(
                    store, expires,
                    self._credential_refresher(identifier, prefix))
            register_store(prefix, store)
            n += 1
        return n

    def _credential_refresher(self, identifier: str, prefix: str):
        """Refresh callback for ExpiringStore: re-vend and rebuild the
        scoped session for ONE prefix; raises loudly when the catalog
        no longer vends for it."""
        def refresh():
            for cred in self.load_credentials(identifier):
                if cred.get("prefix", "") == prefix:
                    store, expires = _vended_s3_store(
                        cred.get("config", {}))
                    return store, (float("inf") if expires is None
                                   else expires)
            raise RuntimeError(
                f"vended credentials for {identifier!r} expired and "
                f"the catalog no longer vends for prefix {prefix!r} — "
                "cannot refresh the scoped session")
        return refresh

    def report_metrics(self, identifier: str, report: dict) -> None:
        """POST /v1/namespaces/{ns}/tables/{tbl}/metrics
        (ReportMetricsRequest): ship a scan report — the dict
        ``Table.scan(report=...)`` fills maps onto the spec's
        scan-report shape — so REST servers aggregate planning metrics
        across engines. Fire-and-forget semantics: metrics must never
        fail a read, so transport/HTTP errors are swallowed (the spec
        marks the route best-effort; a 404 just means the server
        doesn't implement it)."""
        ns, name = parse_identifier(identifier)
        body = {
            "report-type": "scan-report",
            "table-name": name,
            "snapshot-id": report.get("snapshot_id") or -1,
            "filter": report.get("filter", "true"),
            "schema-id": report.get("schema_id", 0),
            "projected-field-ids": report.get("projected_field_ids", []),
            "projected-field-names": report.get("projected_field_names",
                                                []),
            # non-metric scalar keys already mapped to top-level fields
            # above must not leak in as bogus count metrics
            "metrics": {
                k.replace("_", "-"): {"unit": "count", "value": int(v)}
                for k, v in report.items()
                if k not in ("snapshot_id", "schema_id")
                and isinstance(v, (int, float))
                and not isinstance(v, bool)
            },
        }
        try:
            self._request("POST",
                          f"namespaces/{ns}/tables/{name}/metrics", body)
        except Exception:  # noqa: BLE001 — metrics are best-effort
            pass


_CRED_KEY_MAP = {"s3.access-key-id": "aws_access_key_id",
                 "s3.secret-access-key": "aws_secret_access_key",
                 "s3.session-token": "aws_session_token",
                 "s3.region": "region_name",
                 "s3.endpoint": "endpoint_url"}


def _vended_s3_store(config: dict):
    """One vended storage-credential config → (scoped S3Store,
    expires_at_ms | None). Expiry comes from the spec's
    ``s3.session-token-expires-at-ms`` property."""
    import boto3

    from iceberg_rust_archive_spark.object_store import S3Store
    kwargs = {v: config[k] for k, v in _CRED_KEY_MAP.items()
              if k in config}
    exp = config.get("s3.session-token-expires-at-ms")
    return (S3Store(boto3.client("s3", **kwargs)),
            int(exp) if exp is not None else None)
