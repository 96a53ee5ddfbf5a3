"""Independent-engine read-back (the role Trino plays in the
reference's tests/integration_trino.rs:1-323): pyiceberg — a reader
this repo shares zero code with — loads an engine-written table from
its metadata.json alone and must agree on row count, a column sum, and
partition pruning.

pyiceberg is not installed in this sandbox, so the module skips with a
visible reason; it runs unmodified wherever ``pip install pyiceberg``
is possible. Everything it exercises is the on-disk contract the other
interop tests pin piecewise (Java-Avro manifest round-trip in
test_avro_interop.py, vendored spec JSON-schema validation in
test_spec_validation.py) — this is the end-to-end composition:
metadata.json → manifest list → manifests → parquet data.
"""

import datetime as dt

import pytest

pyiceberg = pytest.importorskip(
    "pyiceberg",
    reason="pyiceberg not installed in this sandbox — install it to run "
           "the independent-engine read-back gate")

from pyspark.sql import functions as F  # noqa: E402

from iceberg_rust_archive_spark.catalog import FileCatalog  # noqa: E402


@pytest.fixture()
def catalog(tmp_path):
    return FileCatalog(str(tmp_path / "warehouse"))


def _static_table(metadata_location):
    from pyiceberg.table import StaticTable
    return StaticTable.from_metadata(metadata_location)


def test_pyiceberg_reads_partitioned_append(spark, catalog):
    from test_engine import BATCH1, BATCH2, COLS, _mk_table

    t = _mk_table(catalog, "orders_pyiceberg")
    t.append(spark, spark.createDataFrame(BATCH1, COLS))
    t.append(spark, spark.createDataFrame(BATCH2, COLS))

    pt = _static_table(t.metadata_location)
    scanned = pt.scan().to_arrow()
    assert scanned.num_rows == len(BATCH1) + len(BATCH2)
    import pyarrow.compute as pc
    assert pc.sum(scanned["amount"]).as_py() == sum(
        r[4] for r in BATCH1 + BATCH2)

    # partition pruning through the day() transform the engine wrote
    pruned = pt.scan(row_filter="date >= '2020-02-01'").to_arrow()
    assert pruned.num_rows == sum(
        1 for r in BATCH1 + BATCH2 if r[3] >= dt.date(2020, 2, 1))


def test_pyiceberg_applies_deletes(spark, catalog):
    from test_engine import BATCH1, COLS, _mk_table

    t = _mk_table(catalog, "orders_pyiceberg_del")
    t.append(spark, spark.createDataFrame(BATCH1, COLS))
    t.delete_where_equal(spark, spark.createDataFrame([(1,), (4,)], ["id"]),
                         ["id"])
    t.delete_where_pos(spark, F.col("id") == 2)

    pt = _static_table(t.metadata_location)
    got = sorted(pt.scan().to_arrow()["id"].to_pylist())
    assert got == [3, 5, 6]


def test_pyiceberg_reads_deletion_vectors(spark, catalog):
    """v3 DV read-back: requires a pyiceberg version with deletion-
    vector support; the spec blob framing (magic, CRC, portable-64
    roaring) is what test_deletion_vectors.py pins byte-level."""
    from test_engine import BATCH1, COLS, _mk_table

    t = _mk_table(catalog, "orders_pyiceberg_dv")
    t.append(spark, spark.createDataFrame(BATCH1, COLS))
    t.delete_where_pos(spark, F.col("id") <= 2, use_dv=True)

    pt = _static_table(t.metadata_location)
    got = sorted(pt.scan().to_arrow()["id"].to_pylist())
    assert got == [3, 4, 5, 6]
