"""Engine-roundtrip queries for the correctness gate.

Each builds a real Iceberg table (write → commit → scan) from driver
testdata and returns a result that a plain-SQL oracle over the *source*
parquet reproduces — proving the engine's write/read/delete/time-travel
paths preserve data exactly (the reference's test style: golden values
after table mutations, SURVEY §5.3).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rust_archive_spark.catalog import FileCatalog
from iceberg_rust_archive_spark.session import materialize_local
from iceberg_rust_archive_spark.predicates import Pred
from iceberg_rust_archive_spark.spec import (
    NestedField, PartitionField, PartitionSpec, Schema, StructTypeSpec,
)
from iceberg_rust_archive_spark.table import Table

ORDERS_SCHEMA = Schema(0, StructTypeSpec((
    NestedField(1, "o_orderkey", "long", True),
    NestedField(2, "o_custkey", "long", True),
    NestedField(3, "o_orderstatus", "string", True),
    NestedField(4, "o_totalprice", "double", True),
    NestedField(5, "o_orderdate", "timestamp", True),
    NestedField(6, "o_orderpriority", "string", True),
)))
MONTH_SPEC = PartitionSpec(0, (PartitionField(5, 1000, "o_orderdate_month",
                                              "month"),))


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def _tmp_catalog():
    d = tempfile.mkdtemp(prefix="iceberg-q-")
    return FileCatalog(os.path.join(d, "wh")), d


def iceberg_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two labeled branches over ONE month-partitioned Iceberg table:

    ``agg``: write orders, scan back with a pruned date-range filter,
    aggregate (A1+A2+A3+A10-A14).

    ``meta`` (r14): ``SELECT count/min/max … WHERE <month-boundary
    predicate>`` through ``engine.sql``, answered by the metadata
    aggregate fast path (A9) from manifest bounds alone — the entry
    wraps the call in a Spark job group and RAISES if any job was
    scheduled, so the green oracle row itself certifies the zero-job
    property (at 100 TB this is an instant answer vs a cluster scan)."""
    cat, d = _tmp_catalog()
    try:
        t = Table.create(cat, "db.orders", ORDERS_SCHEMA, MONTH_SPEC)
        t.append(spark, _orders(spark, sf_dir))
        import datetime as dt
        df = t.scan(spark, filter=[
            Pred("o_orderdate", ">=", dt.datetime(1996, 1, 1)),
            Pred("o_orderdate", "<", dt.datetime(1997, 1, 1))])
        agg = (df.groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n_orders"),
                    F.round(F.sum("o_totalprice"), 2).alias("total"))
               .orderBy("o_orderstatus")
               .select(F.lit("agg").alias("mode"),
                       F.col("o_orderstatus").alias("key"),
                       "n_orders", "total"))

        from iceberg_rust_archive_spark.plans.engine import Engine
        eng = Engine(spark, cat)
        sc = spark.sparkContext
        sc.setJobGroup("meta_fast_path", "metadata aggregate fast path")
        try:
            meta = eng.sql(
                "SELECT count(*) AS n, min(o_totalprice) AS mn, "
                "max(o_totalprice) AS mx, min(o_orderdate) AS dmn, "
                "max(o_orderdate) AS dmx FROM db.orders "
                "WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00'")
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)
        if sc.statusTracker().getJobIdsForGroup("meta_fast_path"):
            raise RuntimeError(
                "metadata aggregate fast path scheduled Spark jobs — "
                "it must answer from manifest bounds alone")
        # jobs-while-answering is only half the guard: a silent
        # fast-path regression returns a LAZY scan plan whose jobs
        # land at collect, outside the group — so also require the
        # RESULT to be a driver-local relation with no file scan
        plan = meta._jdf.queryExecution().executedPlan().toString()
        local = "LocalTableScan" in plan or "Scan ExistingRDD" in plan
        if not local or "parquet" in plan.lower() or "FileScan" in plan:
            raise RuntimeError(
                "metadata aggregate answer is not a local relation — "
                "the fast path fell back to a scan:\n" + plan)
        day = "datediff(CAST({c} AS DATE), DATE '1970-01-01')"
        mrows = None
        for key, n_expr, t_expr in [
                ("count", "n", "CAST(NULL AS DOUBLE)"),
                ("min_price", "CAST(NULL AS BIGINT)", "mn"),
                ("max_price", "CAST(NULL AS BIGINT)", "mx"),
                ("min_date", day.format(c="dmn"), "CAST(NULL AS DOUBLE)"),
                ("max_date", day.format(c="dmx"), "CAST(NULL AS DOUBLE)")]:
            r = meta.selectExpr(
                "'meta' AS mode", f"'{key}' AS key",
                f"CAST({n_expr} AS BIGINT) AS n_orders",
                f"CAST({t_expr} AS DOUBLE) AS total")
            mrows = r if mrows is None else mrows.unionByName(r)
        return materialize_local(spark, agg.unionByName(mrows))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def iceberg_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two labeled branches, separately hash-graded:

    ``rename``: append half the orders, rename o_totalprice → price by
    field id (AddSchema/SetCurrentSchema, commit.rs:94,416), append the
    rest under the new name, scan — files from BOTH schema versions
    must resolve through field id 4 into one column (SURVEY §1.2).

    ``variant``: a v3 VARIANT column roundtrip through the full engine
    write path — a slice of orders encodes to variant payloads
    ({status, cents}), lands in an Iceberg table (format-version 3,
    stats-less footer fallback), and is read back via variant_get into
    an aggregate the oracle recomputes from the raw rows. Prices ride
    as integer CENTS (floor(x*100+0.5) in both engines) so the hash
    cannot flap on float repr."""
    cat, d = _tmp_catalog()
    try:
        t = Table.create(cat, "db.orders_evo", ORDERS_SCHEMA,
                         PartitionSpec(0, ()))
        src = _orders(spark, sf_dir)
        t.append(spark, src.filter(F.col("o_orderkey") % 2 == 0))
        renamed = Schema(1, StructTypeSpec(tuple(
            f if f.field_id != 4
            else NestedField(4, "price", "double", True)
            for f in ORDERS_SCHEMA.fields)))
        t.new_transaction().update_schema(renamed).commit()
        t.refresh()
        t.append(spark, src.filter(F.col("o_orderkey") % 2 == 1)
                 .withColumnRenamed("o_totalprice", "price"))
        out = (t.scan(spark).groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n_orders"),
                    F.round(F.sum("price"), 2).alias("total_price"))
               .orderBy("o_orderstatus")
               .select(F.lit("rename").alias("mode"), "o_orderstatus",
                       "n_orders", "total_price"))

        vschema = Schema(0, StructTypeSpec((
            NestedField(1, "k", "long", True),
            NestedField(2, "payload", "variant", False))))
        tv = Table.create(cat, "db.orders_var", vschema,
                          PartitionSpec(0, ()))
        vdf = (src.filter(F.col("o_orderkey") % 5 == 2)
               .selectExpr(
                   "o_orderkey AS k",
                   "parse_json(to_json(struct("
                   "o_orderstatus AS status, "
                   "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
                   " AS cents))) AS payload"))
        tv.append(spark, vdf)
        vout = (tv.scan(spark)
                .selectExpr(
                    "variant_get(payload, '$.status', 'string')"
                    " AS o_orderstatus",
                    "variant_get(payload, '$.cents', 'long') AS cents")
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n_orders"),
                     F.round(F.sum("cents") / 100.0, 2)
                      .alias("total_price"))
                .select(F.lit("variant").alias("mode"), "o_orderstatus",
                        "n_orders", "total_price"))
        out = out.unionByName(vout)
        return materialize_local(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def iceberg_equality_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two equality-delete shapes, branch-labeled (A16+A5):

    - ``flat``: unpartitioned table, delete customers with
      ``o_custkey % 10 == 3`` keyed on o_orderkey.
    - ``part_global`` (r13): bucket(4, o_orderkey)-partitioned table,
      delete keyed on o_custkey — NOT derivable from the partition
      source, so the delete file is GLOBAL and must ride an
      UNPARTITIONED spec on its manifest (Iceberg spec; an all-null
      tuple of the partitioned spec would scope it to the null
      partition in a foreign reader and resurrect rows —
      manifest_list.rs:88 partition summaries). The DuckDB oracle
      hash-grades the post-delete table state, so the spec-routing is
      value-checked end-to-end."""
    cat, d = _tmp_catalog()
    try:
        src = _orders(spark, sf_dir)

        t = Table.create(cat, "db.orders_del", ORDERS_SCHEMA,
                         PartitionSpec(0, ()))
        t.append(spark, src)
        t.delete_where_equal(spark, src.filter(F.col("o_custkey") % 10 == 3),
                             ["o_orderkey"])
        flat = (t.scan(spark).groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n_orders"))
                .withColumn("branch", F.lit("flat")))

        okey_bucket_spec = PartitionSpec(
            0, (PartitionField(1, 1000, "o_orderkey_bucket", "bucket[4]"),))
        tp = Table.create(cat, "db.orders_del_part", ORDERS_SCHEMA,
                          okey_bucket_spec)
        tp.append(spark, src)
        tp = tp.delete_where_equal(
            spark,
            src.filter(F.col("o_custkey") % 10 == 7)
               .select("o_custkey").distinct(),
            ["o_custkey"])
        assert any(not s.fields
                   for s in tp.metadata.partition_specs.values()), \
            "global delete must register the unpartitioned spec"
        part = (tp.scan(spark).groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n_orders"))
                .withColumn("branch", F.lit("part_global")))

        out = (flat.unionByName(part)
               .select("branch", "o_orderstatus", "n_orders")
               .orderBy("branch", "o_orderstatus"))
        return materialize_local(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def iceberg_position_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append all orders, position-delete high-price rows as a
    **deletion vector** (content=1, v3 shape: one roaring bitmap per
    referenced data file in a Puffin sidecar, decoded executor-side and
    anti-joined), THEN equality-delete a custkey slice so both delete
    content types coexist in one scan — the reference panics on
    content=1 (datafusion_iceberg/src/table.rs:422-425); this is a
    parity superset. The DuckDB oracle grades the resulting table
    state, so the whole DV encode→commit→decode→merge path is
    hash-checked end-to-end."""
    cat, d = _tmp_catalog()
    try:
        t = Table.create(cat, "db.orders_pdel", ORDERS_SCHEMA,
                         PartitionSpec(0, ()))
        src = _orders(spark, sf_dir)
        t.append(spark, src)
        t.delete_where_pos(spark, F.col("o_totalprice") > 200000.0,
                           use_dv=True)
        t.delete_where_equal(spark, src.filter(F.col("o_custkey") % 10 == 3),
                             ["o_orderkey"])
        out = (t.scan(spark).groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n_orders"),
                    F.round(F.sum("o_totalprice"), 2).alias("total"))
               .orderBy("o_orderstatus"))
        return materialize_local(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def iceberg_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two appends (even keys, then odd); read the first snapshot (A35)."""
    cat, d = _tmp_catalog()
    try:
        t = Table.create(cat, "db.orders_tt", ORDERS_SCHEMA,
                         PartitionSpec(0, ()))
        src = _orders(spark, sf_dir)
        t.append(spark, src.filter(F.col("o_orderkey") % 2 == 0))
        snap1 = t.metadata.current_snapshot().snapshot_id
        t.append(spark, src.filter(F.col("o_orderkey") % 2 == 1))
        out = (t.scan(spark, snapshot_id=snap1)
               .groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n_orders"),
                    F.round(F.sum("o_totalprice"), 2).alias("total"))
               .orderBy("o_orderstatus"))
        out = materialize_local(spark, out)
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship scenario (delta_queries/mod.rs:1199-1517):
    seed table → create aggregate MV → full refresh → append more source
    rows → INCREMENTAL refresh (only the snapshot delta is scanned,
    A21-A24) → then DELETE source rows → CHANGELOG refresh (signed
    retraction weights over Table.changes — beyond the reference, which
    must recompute here) → MV contents must equal a full recompute."""
    from iceberg_rust_archive_spark.plans.engine import Engine
    from iceberg_rust_archive_spark.plans.mv import CHANGELOG_AGG, INCR_AGG

    cat, d = _tmp_catalog()
    try:
        eng = Engine(spark, cat)
        t = Table.create(cat, "db.orders_mv", ORDERS_SCHEMA,
                         PartitionSpec(0, ()))
        src = _orders(spark, sf_dir)
        t.append(spark, src.filter(F.col("o_orderkey") % 3 != 0))
        eng.create_materialized_view(
            "db.omv",
            "SELECT sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
            "THEN 1 ELSE 0 END) AS high_line_count, "
            "count(*) AS n_orders, o_orderstatus "
            "FROM db.orders_mv GROUP BY o_orderstatus")
        eng.refresh_materialized_view("db.omv")
        t.append(spark, src.filter(F.col("o_orderkey") % 3 == 0))
        strategy = eng.refresh_materialized_view("db.omv")
        assert strategy == INCR_AGG, strategy
        eng.sql("DELETE FROM db.orders_mv WHERE o_custkey % 7 = 2")
        strategy = eng.refresh_materialized_view("db.omv")
        assert strategy == CHANGELOG_AGG, strategy
        out = eng.sql("SELECT high_line_count, n_orders, o_orderstatus "
                      "FROM db.omv").orderBy("o_orderstatus")
        return materialize_local(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def mv_union_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental UNION ALL MV (δ(∪ᵢ Bᵢ) = ∪ᵢ δBᵢ — delta_queries/
    transform.rs:85-100): two source tables seeded with disjoint orders
    slices, a UNION ALL MV with a different filter per branch, then an
    append to EACH source — both refreshes must classify
    IncrementalAppend (the per-branch delta passes scan only the
    appended snapshot ranges; a full-branch re-scan would double rows
    and break the oracle hash). Returns the MV aggregated per status."""
    from iceberg_rust_archive_spark.plans.engine import Engine
    from iceberg_rust_archive_spark.plans.mv import INCR_APPEND

    cat, d = _tmp_catalog()
    try:
        eng = Engine(spark, cat)
        src = _orders(spark, sf_dir)
        t1 = Table.create(cat, "db.orders_u1", ORDERS_SCHEMA,
                          PartitionSpec(0, ()))
        t2 = Table.create(cat, "db.orders_u2", ORDERS_SCHEMA,
                          PartitionSpec(0, ()))
        t1.append(spark, src.filter(F.col("o_orderkey") % 4 == 0))
        t2.append(spark, src.filter(F.col("o_orderkey") % 4 == 1))
        eng.create_materialized_view(
            "db.umv",
            "SELECT o_orderstatus, o_totalprice FROM db.orders_u1 "
            "WHERE o_totalprice > 150000 "
            "UNION ALL "
            "SELECT o_orderstatus, o_totalprice FROM db.orders_u2 "
            "WHERE o_orderpriority IN ('1-URGENT','2-HIGH')")
        eng.refresh_materialized_view("db.umv")  # bootstrap: FULL
        t2.refresh().append(spark,
                            src.filter(F.col("o_orderkey") % 4 == 3))
        strategy = eng.refresh_materialized_view("db.umv")
        assert strategy == INCR_APPEND, strategy
        t1.refresh().append(spark,
                            src.filter(F.col("o_orderkey") % 4 == 2))
        strategy = eng.refresh_materialized_view("db.umv")
        assert strategy == INCR_APPEND, strategy
        out = (eng.sql("SELECT * FROM db.umv")
               .groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.round(F.sum("o_totalprice"), 2).alias("total"))
               .orderBy("o_orderstatus"))
        return materialize_local(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def iceberg_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-range delta read (A4): only rows appended after snap1."""
    cat, d = _tmp_catalog()
    try:
        t = Table.create(cat, "db.orders_inc", ORDERS_SCHEMA,
                         PartitionSpec(0, ()))
        src = _orders(spark, sf_dir)
        t.append(spark, src.filter(F.col("o_orderkey") % 2 == 0))
        snap1 = t.metadata.current_snapshot().snapshot_id
        t.append(spark, src.filter(F.col("o_orderkey") % 2 == 1))
        out = (t.scan(spark, from_snapshot_id=snap1)
               .groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n_orders"))
               .orderBy("o_orderstatus"))
        out = materialize_local(spark, out)
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV external source → Iceberg table → pruned scan → aggregate.

    Mirrors the reference's CSV seeding path (`examples/insert_csv.rs`,
    `delta_queries/mod.rs:1233-1249`: CREATE EXTERNAL TABLE ... STORED AS
    CSV then INSERT INTO iceberg SELECT): driver testdata is exported to
    headerless CSV, read back with an explicit schema (no inference scan
    at 100 TB), appended into an Iceberg table, and aggregated off a
    snapshot scan."""
    cat, d = _tmp_catalog()
    try:
        csv_dir = os.path.join(d, "csv")
        src = _orders(spark, sf_dir).withColumn(
            "o_orderdate",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
        src.repartition(spark.sparkContext.defaultParallelism) \
           .write.option("header", "false").csv(csv_dir)
        from pyspark.sql.types import (
            DoubleType, LongType, StringType, StructField, StructType,
        )
        csv_schema = StructType([
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", StringType()),
            StructField("o_orderpriority", StringType()),
        ])
        loaded = (spark.read.schema(csv_schema)
                  .option("header", "false").csv(csv_dir)
                  .withColumn("o_orderdate",
                              F.to_timestamp("o_orderdate",
                                             "yyyy-MM-dd HH:mm:ss")))
        t = Table.create(cat, "db.orders_csv", ORDERS_SCHEMA, MONTH_SPEC)
        t.append(spark, loaded)
        import datetime as dt
        out = (t.scan(spark, filter=[
                   Pred("o_orderdate", ">=", dt.datetime(1996, 6, 1))])
               .groupBy("o_orderpriority")
               .agg(F.count(F.lit(1)).alias("n_orders"),
                    F.round(F.sum("o_totalprice"), 2).alias("total"))
               .orderBy("o_orderpriority"))
        return materialize_local(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


LINEITEM_SCHEMA = Schema(0, StructTypeSpec((
    NestedField(1, "l_orderkey", "long", True),
    NestedField(2, "l_partkey", "long", True),
    NestedField(3, "l_suppkey", "long", True),
    NestedField(4, "l_linenumber", "int", True),
    NestedField(5, "l_quantity", "double", True),
    NestedField(6, "l_extendedprice", "double", True),
    NestedField(7, "l_discount", "double", True),
    NestedField(8, "l_tax", "double", True),
    NestedField(9, "l_returnflag", "string", True),
    NestedField(10, "l_linestatus", "string", True),
    NestedField(11, "l_shipdate", "timestamp", True),
)))
L_MONTH_SPEC = PartitionSpec(0, (PartitionField(11, 1000,
                                                "l_shipdate_month", "month"),))


def iceberg_lineitem_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE B1+B3 at bench scale: bulk-append the full lineitem table
    into a month(l_shipdate)-partitioned Iceberg table (repartition by
    transform → parquet → footer-stats harvest → manifest commit), then a
    date-range scan that must prune to 3 of ~84 month partitions before
    Spark ever sees a file list."""
    import datetime as dt
    cat, d = _tmp_catalog()
    try:
        t = Table.create(cat, "db.lineitem", LINEITEM_SCHEMA, L_MONTH_SPEC)
        t.append(spark, spark.read.parquet(
            os.path.join(sf_dir, "lineitem.parquet")))
        df = t.scan(spark, filter=[
            Pred("l_shipdate", ">=", dt.datetime(1996, 6, 1)),
            Pred("l_shipdate", "<", dt.datetime(1996, 9, 1))])
        out = (df.groupBy("l_returnflag")
               .agg(F.count(F.lit(1)).alias("n_lines"),
                    F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
               .orderBy("l_returnflag"))
        return materialize_local(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


BUCKET_SPEC = PartitionSpec(0, (PartitionField(2, 1000,
                                               "o_custkey_bucket",
                                               "bucket[8]"),))


def iceberg_bucket_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-partitioned write + point-lookup pruning: orders hashed
    into bucket[8](o_custkey) partitions (murmur3 of the Iceberg
    single-value serialization — values.rs:360-364 semantics, verified
    against reference vectors in tests/test_spec.py), then an equality
    predicate prunes the scan to the single matching bucket before
    Spark reads any file."""
    cat, d = _tmp_catalog()
    try:
        t = Table.create(cat, "db.orders_bkt", ORDERS_SCHEMA, BUCKET_SPEC)
        t = t.append(spark, _orders(spark, sf_dir))
        keys = (11, 42, 77)
        # ONE scan with an IN predicate (r5 verdict #6 — the per-key scan
        # loop paid 3× metadata resolution): partition-space rewrite
        # prunes to the union of the 3 buckets before any file is read
        df = t.scan(spark, filter=[Pred("o_custkey", "in", list(keys))])
        # pruning evidence: every planned input file's partition tuple is
        # one of the expected bucket values (metadata-only check)
        from iceberg_rust_archive_spark.functions.transforms import (
            transform_value,
        )
        from iceberg_rust_archive_spark.sources.manifests import (
            read_manifest, read_manifest_list,
        )
        want_buckets = {transform_value("bucket[8]", k, "long")
                        for k in keys}
        from urllib.parse import urlparse

        def _norm(p: str) -> str:
            # inputFiles() may render file:/tmp/x or file:///tmp/x
            # depending on session confs; manifests store bare paths
            return os.path.normpath(urlparse(p).path or p)
        planned = {_norm(p) for p in df.inputFiles()}
        by_path = {_norm(e.data_file.file_path): e.data_file.partition
                   for mle in read_manifest_list(
                       t.metadata.current_snapshot().manifest_list)
                   for e in read_manifest(mle.manifest_path)}
        assert planned and all(
            by_path[p]["o_custkey_bucket"] in want_buckets
            for p in planned), "scan read a file outside the IN buckets"
        out = (df.filter(F.col("o_custkey").isin(*keys))
               .groupBy("o_custkey")
               .agg(F.count(F.lit(1)).alias("n_orders"),
                    F.round(F.sum("o_totalprice"), 2).alias("total"))
               .orderBy("o_custkey"))
        return materialize_local(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


TRUNCATE_SPEC = PartitionSpec(0, (PartitionField(2, 1000,
                                                 "o_custkey_trunc",
                                                 "truncate[100]"),))


def iceberg_truncate_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """truncate[100]-partitioned write + range pruning: truncate is
    order-preserving (values.rs:365-376 — i - i.rem_euclid(w)), so a
    custkey range predicate prunes to the covering truncated partitions
    before any file is read."""
    cat, d = _tmp_catalog()
    try:
        t = Table.create(cat, "db.orders_tr", ORDERS_SCHEMA, TRUNCATE_SPEC)
        t.append(spark, _orders(spark, sf_dir))
        df = t.scan(spark, filter=[Pred("o_custkey", ">=", 200),
                                   Pred("o_custkey", "<", 400)])
        out = (df.filter((F.col("o_custkey") >= 200)
                         & (F.col("o_custkey") < 400))
               .groupBy((F.col("o_custkey") % 100).alias("ckey_mod"))
               .agg(F.count(F.lit(1)).alias("n_orders"))
               .orderBy("ckey_mod"))
        return materialize_local(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def iceberg_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL DML roundtrip: DELETE FROM → UPDATE ... SET → MERGE INTO
    (upsert), all through the engine's SQL surface, then aggregate the
    final table state.

    The reference exposes deletes only through its API (README.md:20-56
    lists equality deletes as a format capability, no SQL DML); this
    entry proves the same delete writers (A16) + merge-on-read scan
    (A5) compose into the full DML triple: DELETE = **deletion
    vectors** (the table opts in via ``write.delete.format=dv``, so
    the SQL DELETE routes through the position-delete path — r9;
    DVs and equality deletes then coexist in one scan chain),
    UPDATE = eq-delete + re-insert in one commit, MERGE = Table.upsert
    (key-scoped eq-delete + data files at one sequence number). The
    oracle replays the three statements as set algebra over the source
    parquet, so every row the engine keeps/rewrites is value-checked."""
    from iceberg_rust_archive_spark.plans.engine import Engine

    cat, d = _tmp_catalog()
    try:
        eng = Engine(spark, cat)
        t = Table.create(cat, "db.orders_dml", ORDERS_SCHEMA,
                         PartitionSpec(0, ()),
                         properties={"write.delete.format": "dv"})
        src = _orders(spark, sf_dir)
        t.append(spark, src)
        eng.sql("DELETE FROM db.orders_dml "
                "WHERE o_orderstatus = 'F' AND o_totalprice < 50000")
        eng.sql("UPDATE db.orders_dml SET o_totalprice = o_totalprice + 1.0 "
                "WHERE o_orderpriority = '1-URGENT'")
        msrc = src.filter(F.col("o_orderkey") % 100 == 7).select(
            "o_orderkey", "o_custkey",
            F.lit("X").alias("o_orderstatus"), "o_totalprice",
            "o_orderdate", "o_orderpriority"
        ).unionByName(src.filter(F.col("o_orderkey") % 100 == 13).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            "o_custkey", F.lit("Y").alias("o_orderstatus"),
            "o_totalprice", "o_orderdate", "o_orderpriority"))
        msrc.createOrReplaceTempView("dml_merge_src")
        eng.sql("MERGE INTO db.orders_dml t USING dml_merge_src m "
                "ON t.o_orderkey = m.o_orderkey "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *")
        # second MERGE exercises the GENERAL clause path (guarded
        # DELETE, guarded cross-alias UPDATE, INSERT *) — oracle-graded
        m2 = src.filter(F.col("o_orderkey") % 100 == 21).select(
            "o_orderkey", "o_custkey",
            F.lit("Z").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
            "o_orderdate", "o_orderpriority"
        ).unionByName(src.filter(F.col("o_orderkey") % 100 == 23).select(
            (F.col("o_orderkey") + 200000000).alias("o_orderkey"),
            "o_custkey", F.lit("W").alias("o_orderstatus"),
            "o_totalprice", "o_orderdate", "o_orderpriority"))
        m2.createOrReplaceTempView("dml_merge_src2")
        eng.sql("MERGE INTO db.orders_dml t USING dml_merge_src2 m "
                "ON t.o_orderkey = m.o_orderkey "
                "WHEN MATCHED AND t.o_totalprice < 100000 THEN DELETE "
                "WHEN MATCHED THEN UPDATE SET "
                "o_totalprice = t.o_totalprice + m.o_totalprice, "
                "o_orderstatus = m.o_orderstatus "
                "WHEN NOT MATCHED THEN INSERT *")
        # compact away the five DML commits' merge-on-read debt; the
        # oracle grading the post-compaction aggregate certifies that
        # compaction preserves DML semantics exactly
        eng.sql("CALL system.compact('db.orders_dml')")
        out = eng.sql(
            "SELECT o_orderstatus, count(o_orderkey) AS n_orders, "
            "round(sum(o_totalprice), 2) AS total "
            "FROM db.orders_dml GROUP BY o_orderstatus "
            "ORDER BY o_orderstatus")
        return materialize_local(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


EVENTS_TZ_SCHEMA = Schema(0, StructTypeSpec((
    NestedField(1, "event_id", "long", True),
    NestedField(2, "ts", "timestamptz", True),
    NestedField(3, "value", "double", True),
)))
TZ_DAY_SPEC = PartitionSpec(0, (PartitionField(2, 1000, "ts_day", "day"),))


def _events_instants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → (event_id, ts AS timestamptz instant, value) where the
    parquet's naive wall times are read AS UTC — session-independently,
    so lazy evaluation inside a non-UTC conf window cannot shift values.
    ``convert_timezone(UTC → current_timezone)`` then a cast reads the
    wall time back as an instant; both steps cancel any session zone."""
    import pyarrow.parquet as pq

    from iceberg_rust_archive_spark.session import ensure_read_confs
    path = os.path.join(sf_dir, "events.parquet")
    kind = str(pq.read_schema(path).field("ts").type)
    if kind.startswith("int"):  # INT64 nanos drop: already an instant count
        ensure_read_confs(spark)  # nanosAsLong on a vanilla driver session
        df = spark.read.parquet(path)
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        df = (spark.read
              .schema("event_id long, ts timestamp_ntz, user_id long, "
                      "event_type string, value double, props string")
              .parquet(path))
        # BOTH zone-sensitive steps freeze the BUILD-time session zone:
        # Cast(ntz → timestamp) binds its zoneId at ANALYSIS (DataFrame
        # construction), so pairing it with runtime current_timezone()
        # desyncs when the caller mutates the session zone between
        # build and execution — the pair must come from the same moment
        sess_tz = spark.conf.get(
            "spark.sql.session.timeZone", "UTC") or "UTC"
        ts = F.convert_timezone(
            F.lit("UTC"), F.lit(sess_tz), F.col("ts")).cast("timestamp")
    return df.select("event_id", ts.alias("ts"), "value")


def iceberg_tz_day_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """day(timestamptz) partitioning written and scanned under a NON-UTC
    session (America/New_York), proving the r13 timezone-proofing end to
    end: partition tuples are the spec's UTC day ordinals (epoch-space
    transforms, never session-zone field extraction), pruning plans only
    the predicate's days, and the result matches a DuckDB oracle that
    computes the same UTC calendar — any session-zone leak shifts rows
    across day boundaries (the events range crosses midnight constantly)
    and the value hash catches it."""
    from iceberg_rust_archive_spark.functions.transforms import (
        transform_column,
    )
    cat, d = _tmp_catalog()
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        t = Table.create(cat, "db.events_tz", EVENTS_TZ_SCHEMA, TZ_DAY_SPEC)
        src = _events_instants(spark, sf_dir)
        import datetime as dt
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        t.append(spark, src)
        report: dict = {}
        df = t.scan(spark, filter=[Pred(
            "ts", ">=",
            dt.datetime(2024, 1, 25, tzinfo=dt.timezone.utc))],
            report=report)
        out = (df.groupBy(transform_column("day", "ts", "timestamptz")
                          .cast("long").alias("key"))
               .agg(F.count(F.lit(1)).alias("n_orders"),
                    F.round(F.sum("value"), 2).alias("total"))
               .orderBy("key"))
        rows = out.collect()
        # pruning evidence: the 30-day January table plans only the
        # predicate's tail days (metadata-only check, graded rows above)
        assert 0 < report["data_files_planned"] <= len(rows) + 1, report
        return materialize_local(spark, out, rows)
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
        shutil.rmtree(d, ignore_errors=True)


NAN_SCHEMA = Schema(0, StructTypeSpec((
    NestedField(1, "event_id", "long", True),
    NestedField(2, "value", "double", True),
)))


def iceberg_nan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-NaN proofs from footers (r13): two appends — one NaN-free
    with values capped at 100, one carrying injected NaNs — then
    ``value > 150``. The clean file's harvested nan_value_counts=0 lets
    its bounds refute the predicate (the NaN-blind rule otherwise keeps
    every float file for ``>``); the NaN file must stay planned because
    Spark and DuckDB both order NaN above every number — the graded
    rows split matched rows into NaN and numeric groups."""
    cat, d = _tmp_catalog()
    try:
        t = Table.create(cat, "db.events_nan", NAN_SCHEMA,
                         PartitionSpec(0, ()))
        src = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")).select(
            "event_id", F.col("value").cast("double").alias("value"))
        t.append(spark, src.filter(F.col("event_id") % 2 == 0)
                 .withColumn("value", F.least("value", F.lit(100.0))))
        t.append(spark, src.filter(F.col("event_id") % 2 == 1)
                 .withColumn("value", F.when(
                     F.col("event_id") % 97 == 3,
                     F.lit(float("nan"))).otherwise(F.col("value"))))
        full: dict = {}
        t.scan(spark, report=full)
        report: dict = {}
        df = t.scan(spark, filter=[Pred("value", ">", 150.0)],
                    report=report)
        assert report["data_files_planned"] < full["data_files_planned"], \
            (report, full)  # the capped NaN-free file(s) pruned away
        out = (df.select(F.isnan("value").alias("nn"), "value")
               .groupBy("nn")
               .agg(F.count(F.lit(1)).alias("n_orders"),
                    F.round(F.sum("value"), 2).alias("_t"))
               .select(F.when(F.col("nn"), F.lit("nan_gt:nan"))
                       .otherwise(F.lit("nan_gt:num")).alias("transform"),
                       F.lit(None).cast("long").alias("key"),
                       "n_orders",
                       F.when(F.col("nn"), F.lit(None).cast("double"))
                       .otherwise(F.col("_t")).alias("total")))
        return materialize_local(spark, out)
    finally:
        shutil.rmtree(d, ignore_errors=True)
