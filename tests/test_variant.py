"""Iceberg v3 ``variant`` columns (spec §Variant; Spark VariantType).

The engine stores variant values through Spark's native parquet variant
encoding (binary metadata/value, optionally shredded). pyarrow 16 cannot
parse footers carrying the VARIANT logical type, so stats harvesting
degrades to a stats-less DataFile whose record count comes from
``_parquet_num_rows`` — a dependency-free thrift-compact footer walker
(also covered here against pyarrow on ordinary files).
"""

import glob

import pytest

from tests.conftest import SF_DIR

from iceberg_rust_archive_spark.catalog.file_catalog import FileCatalog
from iceberg_rust_archive_spark.plans.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, FileCatalog(str(tmp_path / "wh")))
    e.sql("CREATE SCHEMA db")
    return e


def test_parquet_num_rows_matches_pyarrow():
    import pyarrow.parquet as pq

    from iceberg_rust_archive_spark.sources.stats import _parquet_num_rows

    paths = sorted(glob.glob(f"{SF_DIR}/*.parquet"))
    assert paths
    for p in paths:
        assert _parquet_num_rows(p) == pq.ParquetFile(p).metadata.num_rows


def test_variant_roundtrip_and_v3_gate(eng):
    eng.sql("CREATE TABLE db.vt (k BIGINT, payload VARIANT)")
    t = eng.load_table("db.vt")
    assert t.metadata.format_version == 3  # variant is a v3 construct
    assert t.metadata.current_schema().field_by_name(
        "payload").field_type == "variant"

    eng.sql("INSERT INTO db.vt SELECT 1, "
            "parse_json('{\"a\": 1, \"tags\": [\"x\",\"y\"]}')")
    eng.sql("INSERT INTO db.vt SELECT 2, parse_json('{\"a\": 5}')")
    got = {r.k: (r.a, r.t0) for r in eng.sql(
        "SELECT k, variant_get(payload, '$.a', 'int') AS a, "
        "variant_get(payload, '$.tags[0]', 'string') AS t0 "
        "FROM db.vt").collect()}
    assert got == {1: (1, "x"), 2: (5, None)}
    # predicates over variant_get + count(*) (stats-less files still
    # count correctly through the thrift num_rows fallback)
    assert [r.k for r in eng.sql(
        "SELECT k FROM db.vt "
        "WHERE variant_get(payload, '$.a', 'int') > 2").collect()] == [2]
    assert eng.sql("SELECT count(*) AS n FROM db.vt").collect()[0].n == 2


def test_variant_table_harvests_real_stats_and_prunes(eng):
    """Files whose footer pyarrow can't parse (VARIANT annotation) now
    harvest per-column bounds through the thrift footer walker — so
    file pruning and the metadata-only count engage on the NON-variant
    columns. At 100 TB the alternative (stats-less fallback) full-scans
    a variant table on every predicate."""
    from iceberg_rust_archive_spark.predicates import Pred
    from iceberg_rust_archive_spark.sources.manifests import (
        read_manifest, read_manifest_list)

    eng.sql("CREATE TABLE db.vs (k BIGINT, d DATE, payload VARIANT)")
    eng.sql("INSERT INTO db.vs SELECT 1, DATE'2020-01-05', "
            "parse_json('{\"a\": 1}')")
    eng.sql("INSERT INTO db.vs SELECT 900, DATE'2024-06-05', "
            "parse_json('{\"a\": 5}')")
    t = eng.load_table("db.vs")
    snap = t.metadata.current_snapshot()
    files = [en.data_file
             for mle in read_manifest_list(snap.manifest_list)
             for en in read_manifest(mle.manifest_path)]
    assert len(files) == 2
    sch = t.metadata.current_schema()
    k_id = sch.field_by_name("k").field_id
    d_id = sch.field_by_name("d").field_id
    v_id = sch.field_by_name("payload").field_id
    for f in files:
        # non-variant columns: real bounds + null counts
        assert f.lower_bounds[k_id] == f.upper_bounds[k_id]
        assert f.lower_bounds[d_id].startswith("202")
        assert f.null_value_counts[k_id] == 0
        # the variant column itself: value_counts recorded (default-fill
        # field-presence probe), no bounds (no defined order)
        assert f.value_counts[v_id] == 1
        assert v_id not in f.lower_bounds
    # a selective predicate PLANS fewer files — both on the bigint and
    # on the date column (scan report counter)
    for preds in ([Pred("k", ">", 100)], [Pred("d", ">", "2023-01-01")]):
        rep = {}
        df = t.scan(eng.spark, filter=preds, report=rep)
        assert rep["data_files_planned"] == 1
        assert df.count() == 1
    # metadata-only count engages again on variant tables
    assert t.count(eng.spark, filter=[Pred("k", ">", 100)]) == 1


def test_variant_dml_routes_positionally(eng):
    """Equality deletes cannot key on a variant column — DELETE and
    UPDATE on variant-carrying tables ride the position-delete path
    and stay exact; time travel to the pre-DML snapshot still works."""
    eng.sql("CREATE TABLE db.vd (k BIGINT, p VARIANT)")
    for i, j in [(1, 1), (2, 5), (3, 9)]:
        eng.sql(f"INSERT INTO db.vd SELECT {i}, parse_json('{{\"a\": {j}}}')")
    pre = eng.load_table("db.vd").metadata.current_snapshot().snapshot_id
    eng.sql("DELETE FROM db.vd WHERE variant_get(p, '$.a', 'int') = 5")
    assert sorted(r.k for r in
                  eng.sql("SELECT k FROM db.vd").collect()) == [1, 3]
    eng.sql("UPDATE db.vd SET p = parse_json('{\"a\": 99}') WHERE k = 3")
    got = {r.k: r.a for r in eng.sql(
        "SELECT k, variant_get(p,'$.a','int') AS a FROM db.vd").collect()}
    assert got == {1: 1, 3: 99}
    n = eng.sql(f"SELECT count(*) AS n FROM db.vd "
                f"VERSION AS OF {pre}").collect()[0].n
    assert n == 3
    # subquery DML refuses loudly instead of falling back to an
    # equality delete it cannot express
    with pytest.raises(ValueError, match="variant"):
        eng.sql("DELETE FROM db.vd "
                "WHERE k IN (SELECT k FROM db.vd WHERE k = 1)")


def test_merge_refuses_variant_join_key(eng):
    """MERGE join keys become equality-delete key field ids; a variant
    key has no defined equality semantics — both MERGE forms refuse
    loudly (mirrors the UPDATE/DELETE guards)."""
    eng.sql("CREATE TABLE db.mv1 (k BIGINT, p VARIANT)")
    eng.sql("INSERT INTO db.mv1 SELECT 1, parse_json('1')")
    with pytest.raises(ValueError, match="variant"):
        eng.sql("MERGE INTO db.mv1 t USING "
                "(SELECT parse_json('1') AS p, 2 AS k) s ON t.p = s.p "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *")
    with pytest.raises(ValueError, match="variant"):
        eng.sql("MERGE INTO db.mv1 t USING "
                "(SELECT parse_json('1') AS p, 2 AS k) s ON t.p = s.p "
                "WHEN MATCHED AND t.k > 0 THEN DELETE")
    # joining on the NON-variant key still works
    eng.sql("MERGE INTO db.mv1 t USING "
            "(SELECT 1 AS k, parse_json('9') AS p) s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET *")
    got = eng.sql("SELECT variant_get(p,'$','int') AS v "
                  "FROM db.mv1").collect()
    assert [r.v for r in got] == [9]


def test_variant_add_column_and_old_files_null_fill(eng):
    eng.sql("CREATE TABLE db.v2 (k BIGINT)")
    eng.sql("INSERT INTO db.v2 VALUES (1)")
    assert eng.load_table("db.v2").metadata.format_version == 2
    eng.sql("ALTER TABLE db.v2 ADD COLUMNS (p VARIANT)")
    assert eng.load_table("db.v2").metadata.format_version == 3
    eng.sql("INSERT INTO db.v2 SELECT 2, parse_json('3.14')")
    got = {r.k: r.d for r in eng.sql(
        "SELECT k, cast(variant_get(p,'$','double') AS DOUBLE) AS d "
        "FROM db.v2").collect()}
    assert got == {1: None, 2: 3.14}


def test_variant_refusals(eng):
    # pinned v2 refuses at CREATE with a clear message
    with pytest.raises(ValueError, match="format-version 3"):
        eng.sql("CREATE TABLE db.pin (k BIGINT, p VARIANT) "
                "TBLPROPERTIES ('format-version'='2')")
    # variant cannot be a partition source
    with pytest.raises(ValueError, match="partition source"):
        eng.sql("CREATE TABLE db.pv (k BIGINT, p VARIANT) "
                "PARTITIONED BY (p)")
    # ORC data format cannot hold variant
    eng.sql("CREATE TABLE db.vo (k BIGINT, p VARIANT) "
            "TBLPROPERTIES ('write.format.default'='orc')")
    with pytest.raises(ValueError, match="parquet"):
        eng.sql("INSERT INTO db.vo SELECT 1, parse_json('1')")


def test_create_table_tblproperties(eng):
    eng.sql("CREATE TABLE db.tp (k BIGINT) "
            "TBLPROPERTIES ('write.delete.format'='dv', 'a.b'='c')")
    props = eng.load_table("db.tp").metadata.properties
    assert props.get("write.delete.format") == "dv"
    assert props.get("a.b") == "c"


def test_insert_select_maps_by_ordinal(eng):
    """Standard SQL: INSERT INTO t SELECT maps by ordinal — unaliased
    expressions insert, and same-named-but-reordered outputs keep
    positional semantics."""
    eng.sql("CREATE TABLE db.po (a BIGINT, b BIGINT)")
    eng.sql("INSERT INTO db.po SELECT 1 + 1, 10")          # unaliased
    eng.sql("INSERT INTO db.po SELECT b, a FROM (SELECT 99 AS a, 3 AS b)")
    got = sorted((r.a, r.b) for r in
                 eng.sql("SELECT * FROM db.po").collect())
    assert got == [(2, 10), (3, 99)]


def test_variant_maintenance_and_changelog(eng, spark):
    """Variant tables through the lifecycle surfaces: positional DELETE,
    compaction (absorbs the DV debt, rewrites variant files), changelog
    resolution of the deleted row, and snapshot expiry."""
    from iceberg_rust_archive_spark.maintenance import expire_snapshots

    eng.sql("CREATE TABLE db.vm (k BIGINT, p VARIANT)")
    for i in range(4):
        eng.sql(f"INSERT INTO db.vm SELECT {i}, "
                f"parse_json('{{\"n\": {i * 10}}}')")
    first = sorted(eng.load_table("db.vm").metadata.snapshots.values(),
                   key=lambda s: s.sequence_number)[0].snapshot_id
    eng.sql("DELETE FROM db.vm WHERE k = 1")
    t = eng.load_table("db.vm")
    pre_compact = t.metadata.current_snapshot().snapshot_id

    events = sorted((r._change_type, r.k) for r in t.changes(
        spark, first, pre_compact).select("_change_type", "k").collect())
    assert events == [("delete", 1), ("insert", 1), ("insert", 2),
                      ("insert", 3)]

    eng.sql("CALL system.compact('db.vm')")
    assert sorted(r.k for r in
                  eng.sql("SELECT k FROM db.vm").collect()) == [0, 2, 3]
    t = expire_snapshots(eng.load_table("db.vm"),
                         older_than_ms=int(1e18))
    assert len(t.metadata.snapshots) == 1
    got = {r.k: r.n for r in eng.sql(
        "SELECT k, variant_get(p,'$.n','int') AS n FROM db.vm").collect()}
    assert got == {0: 0, 2: 20, 3: 30}


def test_variant_table_add_column_default_fills_old_files(eng):
    """The stats-less footer fallback must still record value_counts
    per written field: the v3 initial-default fill detects pre-column
    files by a field id ABSENT from harvested stats, so an empty map
    would silently null-fill rows that should read the DEFAULT."""
    eng.sql("CREATE TABLE db.vdf (k BIGINT, p VARIANT)")
    eng.sql("INSERT INTO db.vdf SELECT 1, parse_json('1')")  # pre-add
    eng.sql("ALTER TABLE db.vdf ADD COLUMNS (x BIGINT DEFAULT 7)")
    eng.sql("INSERT INTO db.vdf SELECT 2, parse_json('2'), NULL")
    eng.sql("INSERT INTO db.vdf SELECT 3, parse_json('3'), 11")
    rows = sorted((r.k, r.x) for r in
                  eng.sql("SELECT k, x FROM db.vdf").collect())
    assert rows == [(1, 7), (2, None), (3, 11)]


def test_show_create_roundtrip_variant_props_default(eng):
    """SHOW CREATE TABLE emits re-runnable DDL for the r12 surface:
    VARIANT columns, DEFAULT values, and TBLPROPERTIES all survive a
    create → SHOW CREATE → create roundtrip."""
    eng.sql("CREATE TABLE db.src (id BIGINT NOT NULL, p VARIANT, "
            "x BIGINT DEFAULT 7) PARTITIONED BY (bucket(4, id)) "
            "TBLPROPERTIES ('write.delete.format'='dv')")
    ddl = eng.sql("SHOW CREATE TABLE db.src").collect()[0][0]
    assert "p VARIANT" in ddl and "DEFAULT 7" in ddl \
        and "'write.delete.format'='dv'" in ddl
    eng.sql(ddl.replace("db.src", "db.clone"))
    a = [tuple(r) for r in eng.sql("DESCRIBE db.src").collect()]
    b = [tuple(r) for r in eng.sql("DESCRIBE db.clone").collect()]
    assert a == b
    clone = eng.load_table("db.clone").metadata
    assert clone.properties.get("write.delete.format") == "dv"
    assert clone.current_schema().field_by_name("x").initial_default == 7
    assert clone.format_version == 3
