"""REST catalog tests: an in-process HTTP server implements the
pointer-store endpoints (the role Trino/LocalStack's REST fixture plays
in the reference's tests/integration_trino.rs), and the client runs the
same CRUD + CAS + engine-roundtrip scenarios as the other catalogs."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from iceberg_rust_archive_spark.catalog import (
    CommitFailedError, RestCatalog,
)


class _State:
    def __init__(self):
        self.lock = threading.Lock()
        self.namespaces = set()
        self.tables = {}  # (ns, name) -> metadata-location


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body=None):
            payload = json.dumps(body).encode() if body is not None else b""
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _parts(self):
            # /v1/namespaces[/{ns}[/tables[/{tbl}]]]
            return [p for p in self.path.split("/") if p][1:]

        def do_GET(self):
            p = self._parts()
            with state.lock:
                if p == ["namespaces"]:
                    self._send(200, {"namespaces": [
                        ns.split(".") for ns in sorted(state.namespaces)]})
                elif len(p) == 3 and p[2] == "tables":
                    ns = p[1]
                    self._send(200, {"identifiers": [
                        {"namespace": k[0].split("."), "name": k[1]}
                        for k in sorted(state.tables) if k[0] == ns]})
                elif len(p) == 4 and p[2] == "tables":
                    loc = state.tables.get((p[1], p[3]))
                    if loc is None:
                        self._send(404, {"error": "no such table"})
                    else:
                        self._send(200, {"metadata-location": loc})
                else:
                    self._send(400, {"error": "bad path"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n)) if n else {}
            p = self._parts()
            with state.lock:
                if p == ["namespaces"]:
                    state.namespaces.add(".".join(body["namespace"]))
                    self._send(200, {})
                elif len(p) == 4 and p[2] == "tables":
                    key = (p[1], p[3])
                    expected = body.get("expected-metadata-location")
                    current = state.tables.get(key)
                    if current != expected:
                        self._send(409, {"error": "conflict"})
                        return
                    state.tables[key] = body["metadata-location"]
                    self._send(200, {})
                else:
                    self._send(400, {"error": "bad path"})

        def do_DELETE(self):
            p = self._parts()
            with state.lock:
                if len(p) == 2:
                    state.namespaces.discard(p[1])
                    self._send(204)
                elif len(p) == 4 and p[2] == "tables":
                    if state.tables.pop((p[1], p[3]), None) is None:
                        self._send(404, {"error": "no such table"})
                    else:
                        self._send(204)
                else:
                    self._send(400, {"error": "bad path"})

    return Handler


@pytest.fixture(scope="module")
def rest_server():
    state = _State()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_rest_namespace_and_pointer_crud(rest_server):
    cat = RestCatalog(rest_server)
    cat.create_namespace("db")
    assert "db" in cat.list_namespaces()

    assert cat.metadata_location("db.t1") is None
    cat._set_pointer("db.t1", "/tmp/v1.json", expected_old=None)
    assert cat.metadata_location("db.t1") == "/tmp/v1.json"
    assert cat.list_tabulars("db") == ["db.t1"]

    # CAS: correct expected succeeds, stale expected conflicts
    cat._set_pointer("db.t1", "/tmp/v2.json", expected_old="/tmp/v1.json")
    with pytest.raises(CommitFailedError):
        cat._set_pointer("db.t1", "/tmp/v3.json",
                         expected_old="/tmp/v1.json")
    assert cat.metadata_location("db.t1") == "/tmp/v2.json"

    cat.drop_tabular("db.t1")
    assert cat.metadata_location("db.t1") is None


def test_rest_engine_roundtrip(rest_server, spark, tmp_path):
    """Full engine path through the REST catalog: create, append twice,
    scan, time-travel — read-your-writes across commits (the reference's
    Trino interop assertion, scaled down)."""
    from iceberg_rust_archive_spark.spec import (
        NestedField, PartitionSpec, Schema, StructTypeSpec,
    )
    from iceberg_rust_archive_spark.table import Table

    cat = RestCatalog(rest_server)
    cat.create_namespace("rt")
    schema = Schema(0, StructTypeSpec((
        NestedField(1, "k", "long", True),
        NestedField(2, "v", "string", True))))
    t = Table.create(cat, "rt.tbl", schema, PartitionSpec(0, ()),
                     location=str(tmp_path / "rt_tbl"))
    t.append(spark, spark.createDataFrame([(1, "a"), (2, "b")],
                                          "k long, v string"))
    snap1 = t.metadata.current_snapshot().snapshot_id
    t.append(spark, spark.createDataFrame([(3, "c")], "k long, v string"))

    assert t.scan(spark).count() == 3
    assert t.scan(spark, snapshot_id=snap1).count() == 2

    # a second client sees the committed state (read-your-writes)
    t2 = Table.load(RestCatalog(rest_server), "rt.tbl")
    assert t2.scan(spark).count() == 3
