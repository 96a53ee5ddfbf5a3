"""Schema evolution × merge-on-read interplay: a column DROP / RENAME /
ADD between a delete commit and the read must not change which rows are
live (reference resolves everything by field id — iceberg-rust-spec
schema evolution keeps ids stable; our scan recovers dropped eq-delete
fields from historical schemas as hidden __hist_<fid> columns)."""

import pytest

from iceberg_rust_archive_spark.catalog import FileCatalog
from iceberg_rust_archive_spark.spec import (
    NestedField, PartitionSpec, Schema, StructTypeSpec,
)
from iceberg_rust_archive_spark.table import Table


def _mk(tmp_path, name="db.t", extra_fields=()):
    cat = FileCatalog(str(tmp_path / "wh"))
    schema = Schema(0, StructTypeSpec((
        NestedField(1, "k", "long", True),
        NestedField(2, "v", "long", False)) + tuple(extra_fields)))
    return Table.create(cat, name, schema, PartitionSpec(0, ()))


def _evolve(t, fields):
    old = t.metadata.current_schema()
    ns = Schema(old.schema_id + 1, StructTypeSpec(tuple(fields)))
    t.new_transaction().update_schema(ns).commit_with_retry(
        lambda x: x.update_schema(ns))
    return t.refresh()


def test_eq_delete_survives_column_drop(spark, tmp_path):
    """Dropping the equality column must NOT resurrect deleted rows:
    the scan recovers the field from schema history and resolves it by
    field id in both the delete and the data files."""
    t = _mk(tmp_path)
    t.append(spark, spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"))
    t = t.refresh()
    t.delete_where_equal(spark, spark.createDataFrame([(20,)], ["v"]),
                         ["v"])
    t = t.refresh()
    assert sorted(r.k for r in t.scan(spark).collect()) == [1, 3]
    t = _evolve(t, [f for f in t.metadata.current_schema().fields
                    if f.name != "v"])
    got = t.scan(spark)
    assert got.columns == ["k"]          # helper columns must not leak
    assert sorted(r.k for r in got.collect()) == [1, 3]
    # appends after the drop land in the newer-than-every-delete branch
    t.append(spark, spark.createDataFrame([(9,)], "k long"))
    assert sorted(r.k for r in t.refresh().scan(spark).collect()) \
        == [1, 3, 9]


def test_eq_delete_partial_column_drop_does_not_overdelete(spark,
                                                           tmp_path):
    """Two-column eq set with ONE column dropped: resolving only the
    surviving column would delete every row sharing it — the dropped
    half must still participate in the match."""
    t = _mk(tmp_path)
    t.append(spark, spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10)], "k long, v long"))
    t = t.refresh()
    t.delete_where_equal(
        spark, spark.createDataFrame([(1, 10)], "k long, v long"),
        ["k", "v"])
    t = t.refresh()
    t = _evolve(t, [f for f in t.metadata.current_schema().fields
                    if f.name != "v"])
    # only (1,10) died; (1,20) and (2,10) survive even though they
    # share k=1 / v=10 with the delete row
    assert sorted(r.k for r in t.scan(spark).collect()) == [1, 2]


def test_changelog_emits_delete_after_column_drop(spark, tmp_path):
    t = _mk(tmp_path)
    t.append(spark, spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, v long"))
    t = t.refresh()
    t.delete_where_equal(spark, spark.createDataFrame([(20,)], ["v"]),
                         ["v"])
    t = t.refresh()
    t = _evolve(t, [f for f in t.metadata.current_schema().fields
                    if f.name != "v"])
    ev = sorted((r["k"], r["_change_type"])
                for r in t.changes(spark).collect())
    assert ev == [(1, "insert"), (2, "delete"), (2, "insert")]


def test_changelog_survives_add_column(spark, tmp_path):
    """A commit predating an ADD COLUMN projects to the current layout
    (new column NULL) instead of failing analysis."""
    t = _mk(tmp_path)
    t.append(spark, spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, v long"))
    t = t.refresh()
    t.delete_where_equal(spark, spark.createDataFrame([(20,)], ["v"]),
                         ["v"])
    t = t.refresh()
    t = _evolve(t, tuple(t.metadata.current_schema().fields)
                + (NestedField(3, "c", "long", False),))
    t.append(spark, spark.createDataFrame(
        [(5, 50, 500)], "k long, v long, c long"))
    t = t.refresh()
    ev = sorted(((r["k"], r["c"], r["_change_type"])
                 for r in t.changes(spark).collect()), key=str)
    assert ev == [(1, None, "insert"), (2, None, "delete"),
                  (2, None, "insert"), (5, 500, "insert")]


def test_changelog_rename_resolves_by_field_id(spark, tmp_path):
    t = _mk(tmp_path)
    t.append(spark, spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, v long"))
    t = t.refresh()
    old = t.metadata.current_schema()
    t = _evolve(t, [
        NestedField(f.field_id, "w" if f.name == "v" else f.name,
                    f.field_type, f.required) for f in old.fields])
    t.delete_where_equal(spark, spark.createDataFrame([(20,)], ["w"]),
                         ["w"])
    t = t.refresh()
    ev = sorted(((r["k"], r["w"], r["_change_type"])
                 for r in t.changes(spark).collect()), key=str)
    assert ev == [(1, 10, "insert"), (2, 20, "delete"),
                  (2, 20, "insert")]


@pytest.mark.parametrize("evolution", ["rename", "drop", "add"])
def test_stream_initial_batch_after_evolution(spark, tmp_path,
                                              evolution):
    """The streaming source's initial MoR batch resolves data AND
    delete-file columns by field id from each file's own schema, so a
    rename/drop/add between the commits and the stream start yields
    the same rows as Table.scan."""
    t = _mk(tmp_path)
    t.append(spark, spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"))
    t = t.refresh()
    t.delete_where_equal(spark, spark.createDataFrame([(20,)], ["v"]),
                         ["v"])
    t = t.refresh()
    fields = list(t.metadata.current_schema().fields)
    if evolution == "rename":
        t = _evolve(t, [
            NestedField(f.field_id, "w" if f.name == "v" else f.name,
                        f.field_type, f.required) for f in fields])
    elif evolution == "drop":
        t = _evolve(t, [f for f in fields if f.name != "v"])
    else:
        t = _evolve(t, fields + [NestedField(3, "c", "long", False)])
        t.append(spark, spark.createDataFrame(
            [(5, 50, 500)], "k long, v long, c long"))
        t = t.refresh()

    from iceberg_rust_archive_spark.streaming.source import (
        IcebergStreamSource,
    )
    spark.dataSource.register(IcebergStreamSource)
    import tempfile
    ckpt = tempfile.mkdtemp(dir=str(tmp_path))
    df = (spark.readStream.format("iceberg-archive")
          .option("catalog_root", str(tmp_path / "wh"))
          .option("identifier", "db.t").load())
    name = f"evo_stream_{evolution}"
    q = (df.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in
                 spark.sql(f"SELECT * FROM {name}").collect())
    want = sorted(tuple(r) for r in t.scan(spark).collect())
    assert got == want
