"""Storage-partitioned bucket-wise join: correctness vs a plain join,
the zero-shuffle plan property, and every fallback path."""

import pytest
from pyspark.sql import functions as F

from iceberg_rust_archive_spark.catalog import FileCatalog
from iceberg_rust_archive_spark.operators.bucketjoin import (
    bucket_join_plan_report, bucketed_join,
)
from iceberg_rust_archive_spark.spec import (
    NestedField, PartitionField, PartitionSpec, Schema, StructTypeSpec,
)
from iceberg_rust_archive_spark.table import Table

FACT_SCHEMA = Schema(0, StructTypeSpec((
    NestedField(1, "k", "long", True),
    NestedField(2, "amount", "int", True))))
DIM_SCHEMA = Schema(0, StructTypeSpec((
    NestedField(1, "k", "long", True),
    NestedField(2, "label", "string", True))))


def _bucket_spec(n):
    return PartitionSpec(0, (PartitionField(1, 1000, "k_bucket",
                                            f"bucket[{n}]"),))


@pytest.fixture()
def catalog(tmp_path):
    return FileCatalog(str(tmp_path / "wh"))


def _mk_pair(spark, catalog, n_left=4, n_right=4):
    fact = Table.create(catalog, "db.fact", FACT_SCHEMA, _bucket_spec(n_left))
    dim = Table.create(catalog, "db.dim", DIM_SCHEMA, _bucket_spec(n_right))
    fact.append(spark, spark.createDataFrame(
        [(i % 37, i) for i in range(2000)], ["k", "amount"]))
    dim.append(spark, spark.createDataFrame(
        [(k, f"label{k}") for k in range(0, 37, 2)], ["k", "label"]))
    return fact, dim


def _expected(spark, fact, dim):
    return sorted((r.k, r.amount, r.label) for r in fact.scan(spark)
                  .join(dim.scan(spark), "k").collect())


def test_bucketed_join_matches_plain_join(spark, catalog):
    fact, dim = _mk_pair(spark, catalog)
    out = bucketed_join(spark, fact, dim, "k")
    got = sorted((r.k, r.amount, r.label) for r in out.collect())
    assert got == _expected(spark, fact, dim)
    assert len(got) > 0


def test_bucketed_join_plans_zero_shuffles(spark, catalog):
    """The point of the operator: co-located broadcastable buckets must
    plan as pure broadcast joins — no shuffle of either side."""
    fact, dim = _mk_pair(spark, catalog)
    out = bucketed_join(spark, fact, dim, "k")
    out.count()  # let AQE finalize
    rep = bucket_join_plan_report(out)
    assert rep["shuffle_exchanges"] == 0
    assert rep["broadcast_joins"] >= 1
    assert rep["sort_merge_joins"] == 0


def test_bucketed_join_fallback_on_mismatched_n(spark, catalog):
    """bucket[4] ⋈ bucket[8] is NOT co-located; must fall back to the
    plain scan join and still return correct rows."""
    fact, dim = _mk_pair(spark, catalog, n_left=4, n_right=8)
    out = bucketed_join(spark, fact, dim, "k")
    got = sorted((r.k, r.amount, r.label) for r in out.collect())
    assert got == _expected(spark, fact, dim)


def test_bucketed_join_fallback_on_deletes(spark, catalog):
    """Live delete files make raw file groups unsound: the operator
    must take the merge-on-read scan path and NOT resurrect deleted
    rows."""
    fact, dim = _mk_pair(spark, catalog)
    fact.delete_where_equal(
        spark, spark.createDataFrame([(0,)], "k long"), ["k"])
    out = bucketed_join(spark, fact, dim, "k")
    assert not [r for r in out.collect() if r.k == 0]
    assert out.count() == len(_expected(spark, fact, dim))


def test_bucketed_join_unpartitioned_fallback(spark, catalog):
    """A side without the bucket layout falls back cleanly."""
    fact, _ = _mk_pair(spark, catalog)
    plain = Table.create(catalog, "db.plain_dim", DIM_SCHEMA,
                         PartitionSpec(0, ()))
    plain.append(spark, spark.createDataFrame(
        [(k, f"label{k}") for k in range(0, 37, 2)], ["k", "label"]))
    out = bucketed_join(spark, fact, plain, "k")
    assert out.count() == len(_expected(spark, fact, plain))
