"""Cross-implementation interop for the Avro metadata encoding.

The reference proves its manifests interoperate by having Trino read
tables it wrote (datafusion_iceberg/tests/integration_trino.rs:1-323).
No external Iceberg reader ships in this container, so the nearest
meaningful equivalent is driving the STOCK JAVA AVRO implementation
(avro-1.12.1.jar, bundled with Spark) over our manifest and
manifest-list files through the JVM gateway: if org.apache.avro parses
them and sees the spec's field names and values, the container framing
and binary encoding are spec-conformant — the layer our previous JSONL
encoding failed entirely.
"""

import datetime as dt

import pytest

from iceberg_rust_archive_spark.catalog import FileCatalog
from iceberg_rust_archive_spark.sources.avro_io import read_ocf, write_ocf
from iceberg_rust_archive_spark.sources.manifests import (
    read_manifest, read_manifest_list,
)
from iceberg_rust_archive_spark.spec import (
    NestedField, PartitionField, PartitionSpec, Schema, StructTypeSpec,
)
from iceberg_rust_archive_spark.table import Table

ORDERS_SCHEMA = Schema(0, StructTypeSpec((
    NestedField(1, "id", "long", True),
    NestedField(2, "customer_id", "long", True),
    NestedField(3, "product_id", "long", True),
    NestedField(4, "date", "date", True),
    NestedField(5, "amount", "int", True),
)))
DAY_SPEC = PartitionSpec(0, (PartitionField(4, 1000, "date_day", "day"),))
BATCH = [(1, 1, 1, dt.date(2020, 1, 1), 1), (2, 2, 1, dt.date(2020, 1, 1), 1),
         (3, 3, 1, dt.date(2020, 2, 2), 3), (4, 1, 2, dt.date(2020, 2, 2), 1)]
COLS = ["id", "customer_id", "product_id", "date", "amount"]


@pytest.fixture()
def table(spark, tmp_path):
    cat = FileCatalog(str(tmp_path / "warehouse"))
    t = Table.create(cat, "db.orders_avro", ORDERS_SCHEMA, DAY_SPEC)
    t.append(spark, spark.createDataFrame(BATCH, COLS))
    return t


def _jvm_read(spark, path):
    """Read an OCF with the stock Java Avro library; returns
    (schema, [GenericRecord])."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader())
    records = []
    while reader.hasNext():
        records.append(reader.next())
    return reader.getSchema(), records


def test_java_avro_reads_manifest_list(spark, table):
    mlist_path = table.metadata.current_snapshot().manifest_list
    assert mlist_path.endswith(".avro")
    jschema, jrecs = _jvm_read(spark, mlist_path)
    ours = read_manifest_list(mlist_path)

    assert jschema.getName() == "manifest_file"
    names = {f.name() for f in jschema.getFields()}
    # the spec's manifest_file surface
    assert {"manifest_path", "manifest_length", "partition_spec_id",
            "content", "sequence_number", "min_sequence_number",
            "added_snapshot_id", "added_files_count", "added_rows_count",
            "partitions"} <= names
    assert len(jrecs) == len(ours) >= 1
    for jr, m in zip(jrecs, ours):
        assert str(jr.get("manifest_path")) == m.manifest_path
        assert jr.get("manifest_length") == m.manifest_length
        assert jr.get("added_snapshot_id") == m.added_snapshot_id
        assert jr.get("added_rows_count") == m.added_rows_count


def test_java_avro_reads_manifest(spark, table):
    mlist = read_manifest_list(table.metadata.current_snapshot().manifest_list)
    mpath = mlist[0].manifest_path
    assert mpath.endswith(".avro")
    jschema, jrecs = _jvm_read(spark, mpath)
    ours = read_manifest(mpath)

    assert jschema.getName() == "manifest_entry"
    top = {f.name() for f in jschema.getFields()}
    assert {"status", "snapshot_id", "sequence_number",
            "file_sequence_number", "data_file"} <= top
    assert len(jrecs) == len(ours) >= 1
    for jr, e in zip(jrecs, ours):
        jdf = jr.get("data_file")
        assert str(jdf.get("file_path")) == e.data_file.file_path
        assert jdf.get("record_count") == e.data_file.record_count
        assert jr.get("status") == e.status
        # partition record carries the transformed day value
        jpart = jdf.get("partition")
        assert str(jpart.get("date_day")) == str(
            e.data_file.partition["date_day"])


def test_java_avro_field_ids_survive(spark, table):
    """Iceberg readers resolve by the field-id schema attributes."""
    mlist = read_manifest_list(table.metadata.current_snapshot().manifest_list)
    jschema, _ = _jvm_read(spark, mlist[0].manifest_path)
    def fid(f):
        # numeric schema props surface via getObjectProps, not getProp
        return f.getObjectProps().get("field-id")

    by_name = {f.name(): f for f in jschema.getFields()}
    assert fid(by_name["status"]) == 0
    assert fid(by_name["data_file"]) == 2
    df_schema = by_name["data_file"].schema()
    df_fields = {f.name(): f for f in df_schema.getFields()}
    assert fid(df_fields["file_path"]) == 100
    assert fid(df_fields["record_count"]) == 103


def test_bounds_roundtrip_through_avro(spark, table):
    """Column bounds survive the single-value binary serialization:
    re-read stats must still prune files (the behavior bounds exist
    for)."""
    mlist = read_manifest_list(table.metadata.current_snapshot().manifest_list)
    entries = [e for m in mlist for e in read_manifest(m.manifest_path)]
    assert entries
    for e in entries:
        lo, hi = e.data_file.lower_bounds, e.data_file.upper_bounds
        assert lo.get(1) is not None and hi.get(1) is not None
        assert lo[1] <= hi[1]
        # date-typed field restored to its ISO-string in-memory form
        assert isinstance(lo[4], str) and lo[4].startswith("2020-")


def test_ocf_roundtrip_unions_and_maps():
    schema = {"type": "record", "name": "t", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": {"type": "array", "items": "double"}},
        {"name": "d", "type": ["null", {"type": "map", "values": "long"}]},
        {"name": "e", "type": "bytes"},
        {"name": "f", "type": "boolean"}]}
    recs = [{"a": -(2 ** 62), "b": None, "c": [1.5, -2.25],
             "d": {"x": 7, "y": -1}, "e": b"\x00\x01\xff", "f": True},
            {"a": 2 ** 62, "b": "hello", "c": [], "d": None, "e": b"",
             "f": False}]
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".avro") as f:
        write_ocf(f.name, schema, recs)
        _, out = read_ocf(f.name)
    assert out == recs


def test_java_avro_reads_orc_table_manifest(spark, tmp_path):
    """An ORC-format table's manifests must record file_format='orc'
    in spec Avro, readable by the stock Java implementation — external
    readers dispatch their data-file reader on this field."""
    cat = FileCatalog(str(tmp_path / "wh_orc"))
    t = Table.create(cat, "db.orders_orc_avro", ORDERS_SCHEMA, DAY_SPEC,
                     properties={"write.format.default": "orc"})
    t.append(spark, spark.createDataFrame(BATCH, COLS))
    snap = t.refresh().metadata.current_snapshot()
    mle = read_manifest_list(snap.manifest_list)[0]
    _schema, records = _jvm_read(spark, mle.manifest_path)
    assert records
    for rec in records:
        df = rec.get("data_file")
        fmt = str(df.get("file_format"))
        assert fmt == "ORC"  # spec enum casing on the wire
        assert str(df.get("file_path")).endswith(".orc")
