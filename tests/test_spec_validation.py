"""Independent metadata validation (r5 verdict missing #1 substitute).

The reference proves interop by having Trino read its tables
(datafusion_iceberg/tests/integration_trino.rs:1-323); this sandbox has
no containers and no pyiceberg, so the nearest meaningful equivalents:

1. validate every written ``vN.metadata.json`` against a vendored JSON
   Schema derived from the public Iceberg v2 table spec (catches
   spec-field drift structurally — this is how the missing
   ``current-snapshot-id`` emission was found),
2. cross-field invariants JSON Schema can't express (current-schema-id
   resolves, ref targets exist, sequence numbers are consistent),
3. drive the STOCK Java Avro reader over the manifest list and check
   the FieldSummary partition bounds it decodes (extending
   test_avro_interop.py to the pruning-critical fields).
"""

import datetime as dt
import json
import os

import pytest

from iceberg_rust_archive_spark.catalog import FileCatalog
from iceberg_rust_archive_spark.spec import (
    NestedField, PartitionField, PartitionSpec, Schema, StructTypeSpec,
)
from iceberg_rust_archive_spark.spec.types import ListTypeSpec
from iceberg_rust_archive_spark.table import Table, create_branch, create_tag

jsonschema = pytest.importorskip("jsonschema")

_SCHEMA_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "iceberg_rust_archive_spark", "spec", "table_metadata_v2.schema.json")

# every primitive the engine writes + a nested list, partitioned by every
# transform family at once (identity, bucket, truncate, year/month/day,
# hour) so the metadata document exercises the full transform grammar
WIDE_SCHEMA = Schema(0, StructTypeSpec((
    NestedField(1, "id", "long", True),
    NestedField(2, "flag", "boolean", True),
    NestedField(3, "small", "int", True),
    NestedField(4, "ratio", "float", True),
    NestedField(5, "amount", "double", True),
    NestedField(6, "day", "date", True),
    NestedField(7, "ts", "timestamp", True),
    NestedField(8, "name", "string", True),
    NestedField(9, "tags", ListTypeSpec(10, "string"), True),
)))

WIDE_SPEC = PartitionSpec(0, (
    PartitionField(8, 1000, "name_ident", "identity"),
    PartitionField(1, 1001, "id_bucket", "bucket[4]"),
    PartitionField(3, 1002, "small_trunc", "truncate[10]"),
    PartitionField(6, 1003, "day_month", "month"),
    PartitionField(7, 1004, "ts_hour", "hour"),
))

ROWS = [
    (i, i % 2 == 0, 10 * i, float(i) / 3, 2.5 * i,
     dt.date(2021, 1 + i % 3, 1 + i),
     dt.datetime(2021, 1, 1, i % 24, 30),
     f"n{i % 2}", [f"t{i}", "common"])
    for i in range(8)
]
COLS = ["id", "flag", "small", "ratio", "amount", "day", "ts", "name",
        "tags"]


@pytest.fixture()
def table(spark, tmp_path):
    cat = FileCatalog(str(tmp_path / "wh"))
    t = Table.create(cat, "db.wide", WIDE_SCHEMA, WIDE_SPEC)
    t = t.append(spark, spark.createDataFrame(ROWS[:4], COLS))
    t = t.append(spark, spark.createDataFrame(ROWS[4:], COLS))
    t = create_branch(t, "dev", min_snapshots_to_keep=2)
    t = create_tag(t, "v1")
    return t


def _latest_metadata_json(t: Table) -> dict:
    assert t.metadata_location.endswith(".metadata.json")
    with open(t.metadata_location) as fh:
        return json.load(fh)


def test_metadata_json_conforms_to_spec_schema(table):
    with open(_SCHEMA_PATH) as fh:
        spec_schema = json.load(fh)
    doc = _latest_metadata_json(table)
    jsonschema.validate(doc, spec_schema)  # raises on any drift

    # cross-field invariants the JSON Schema can't express
    schema_ids = {s["schema-id"] for s in doc["schemas"]}
    assert doc["current-schema-id"] in schema_ids
    spec_ids = {s["spec-id"] for s in doc["partition-specs"]}
    assert doc["default-spec-id"] in spec_ids
    order_ids = {s["order-id"] for s in doc["sort-orders"]}
    assert doc["default-sort-order-id"] in order_ids
    snap_ids = {s["snapshot-id"] for s in doc.get("snapshots", [])}
    assert doc["current-snapshot-id"] in snap_ids
    for name, ref in doc.get("refs", {}).items():
        assert ref["snapshot-id"] in snap_ids, name
    assert doc["refs"]["main"]["snapshot-id"] == doc["current-snapshot-id"]
    # dev branch carries its configured retention in the document
    assert doc["refs"]["dev"]["min-snapshots-to-keep"] == 2
    for s in doc.get("snapshots", []):
        assert s["sequence-number"] <= doc["last-sequence-number"]
    for entry in doc.get("snapshot-log", []):
        assert entry["snapshot-id"] in snap_ids
    # every partition field id is covered by last-partition-id
    for spec in doc["partition-specs"]:
        for f in spec["fields"]:
            assert f["field-id"] <= doc["last-partition-id"]
    # column ids are covered by last-column-id (incl. nested element ids)
    def max_id(t):
        if isinstance(t, dict):
            if t["type"] == "struct":
                return max(max(f["id"], max_id(f["type"]))
                           for f in t["fields"])
            if t["type"] == "list":
                return max(t["element-id"], max_id(t["element"]))
            if t["type"] == "map":
                return max(t["key-id"], t["value-id"],
                           max_id(t["key"]), max_id(t["value"]))
        return 0
    for s in doc["schemas"]:
        assert max_id(s) <= doc["last-column-id"]


def test_metadata_roundtrips_through_external_shape(table):
    """A reader that only honors current-snapshot-id (no refs) must
    resolve the same current snapshot."""
    from iceberg_rust_archive_spark.spec.table_metadata import TableMetadata
    doc = _latest_metadata_json(table)
    head = doc["current-snapshot-id"]
    doc.pop("refs")
    md = TableMetadata.from_json(doc)
    assert md.current_snapshot().snapshot_id == head


def test_java_avro_reads_field_summary_bounds(spark, table):
    """Manifest-list FieldSummary bounds through the stock Java Avro
    reader: the pruning-critical lower/upper bounds must decode to the
    same bytes our reader sees, for every partition field."""
    from iceberg_rust_archive_spark.sources.manifests import (
        read_manifest_list,
    )
    mlist_path = table.metadata.current_snapshot().manifest_list
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(mlist_path),
        jvm.org.apache.avro.generic.GenericDatumReader())
    jrecs = []
    while reader.hasNext():
        jrecs.append(reader.next())
    ours = read_manifest_list(mlist_path)
    assert len(jrecs) == len(ours) >= 2  # two appends

    import json as _json

    from iceberg_rust_archive_spark.sources.manifests import _ocf_metadata
    from iceberg_rust_archive_spark.sources.manifest_avro import (
        encode_bound,
    )
    ptypes = _json.loads(
        _ocf_metadata(mlist_path).get("partition-types", "[]"))
    assert len(ptypes) == len(WIDE_SPEC.fields)

    def jbytes(buf):
        # py4j passes arrays by value, so ByteBuffer.get(byte[]) fills a
        # JVM-side copy — extract via Arrays.copyOfRange instead
        if buf is None:
            return None
        start = buf.arrayOffset() + buf.position()
        out = jvm.java.util.Arrays.copyOfRange(
            buf.array(), start, start + buf.remaining())
        return bytes(out)

    for jr, m in zip(jrecs, ours):
        jparts = jr.get("partitions")
        assert jparts is not None and jparts.size() == len(m.partitions) \
            == len(WIDE_SPEC.fields)
        for i in range(jparts.size()):
            js, fs, t = jparts.get(i), m.partitions[i], ptypes[i]
            assert bool(js.get("contains_null")) == bool(fs.contains_null)
            want_lo = encode_bound(fs.lower_bound, t) \
                if fs.lower_bound is not None else None
            want_hi = encode_bound(fs.upper_bound, t) \
                if fs.upper_bound is not None else None
            assert jbytes(js.get("lower_bound")) == want_lo, \
                f"field {i} ({t}) lower bound drift"
            assert jbytes(js.get("upper_bound")) == want_hi, \
                f"field {i} ({t}) upper bound drift"
