"""Physical-plan regression guards.

Correctness tests can stay green while a plan silently degrades (a
broadcast becomes a shuffle, a filter stops pushing down, a cartesian
sneaks in). These guards pin the SHAPE of representative plans at
sf0.001 — cheap to evaluate (plans only, minimal execution) and loud
when an optimizer interaction regresses the 100 TB story."""

import os

import pytest

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entries(spark):
    import __spark_entry__ as m
    return m.queries(), spark


def test_no_cartesian_products_anywhere(entries):
    """No queries() entry may plan a CartesianProduct / BroadcastNested
    LoopJoin over data-proportional inputs (scale killer #1). The known
    single-row × single-row cross joins plan as BroadcastNestedLoop
    with a 1-row side — allow only when 'LocalTableScan' or a Limit-1
    aggregate feeds it; simplest robust check: no CartesianProduct."""
    qs, spark = entries
    for name in ("q3_shipping_priority", "q5_local_supplier_volume",
                 "q7_nation_volume", "q9_profit_by_nation_year",
                 "q18_large_orders", "q21_waiting_suppliers"):
        plan = _plan(qs[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name


def test_small_dims_broadcast_in_join_queries(entries):
    """Multi-table TPC-H shapes must join the small dimensions via
    broadcast, not sort-merge-shuffle (region/nation are KBs; a
    sort-merge there shuffles the fact table for nothing)."""
    qs, spark = entries
    for name in ("q5_local_supplier_volume", "q7_nation_volume",
                 "q9_profit_by_nation_year"):
        plan = _plan(qs[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, name


def test_scan_filters_reach_parquet(spark):
    """A predicate over a plain table read must be pushed into the
    parquet scan (PushedFilters) — the A7 contract end-to-end."""
    from pyspark.sql import functions as F
    df = (spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
          .filter(F.col("l_quantity") > 45).select("l_orderkey"))
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters")[1][:200]
    # and projection pruned the read schema to the referenced columns
    rs = plan.split("ReadSchema")[1][:200]
    assert "l_orderkey" in rs and "l_extendedprice" not in rs


def test_single_scan_entries_have_one_shuffle(entries):
    """Scan→groupBy analytics must plan exactly ONE shuffle (the final
    aggregate exchange) — a second one means a lost map-side combine
    or a stray repartition."""
    import re

    qs, spark = entries
    for name in ("q1_pricing_summary", "q6_forecast_revenue"):
        plan = _plan(qs[name](spark, SF_DIR))
        n = len(re.findall(r"\bExchange (hashpartitioning|"
                           r"rangepartitioning|SinglePartition)", plan))
        # q1 sorts its 4-row result (one extra range exchange is fine)
        assert n <= 2, f"{name}: {n} shuffles"
