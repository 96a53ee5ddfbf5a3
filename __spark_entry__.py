"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-runnable ANSI SQL twins for the correctness gate.

Column-name discipline: every computed/aggregate column is aliased
identically in the Spark pipeline and the oracle SQL. Double-typed
aggregates are rounded on both sides so cross-engine float summation
order cannot flip the value hash.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_rust_archive_spark.operators import (  # noqa: E402
    dedup, iceberg_queries, multimodal, relational, relational2,
    sampling, similarity, temporal, text,
)


def _rounded(df: DataFrame, cols: dict[str, int]) -> DataFrame:
    out = df
    for c, nd in cols.items():
        out = out.withColumn(c, F.round(F.col(c), nd))
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": lambda s, d: _rounded(
            relational.q1_pricing_summary(s, d),
            {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2,
             "sum_charge": 2, "avg_qty": 4, "avg_price": 4, "avg_disc": 4}),
        "q3_shipping_priority": lambda s, d: _rounded(
            relational.q3_shipping_priority(s, d), {"revenue": 2}
            ).withColumn("o_orderdate",
                         F.col("o_orderdate").cast("date").cast("string")),
        "q5_local_supplier_volume": lambda s, d: _rounded(
            relational.q5_local_supplier_volume(s, d), {"revenue": 2}),
        "q6_forecast_revenue": lambda s, d: _rounded(
            relational.q6_forecast_revenue(s, d), {"revenue": 2}),
        "q12_shipmode": relational.q12_shipmode,
        "distinct_union": relational.distinct_union,
        "anti_semi_join": relational.anti_semi_join,
        "case_projection": relational.case_projection,
        "window_topn_per_group": relational.window_topn_per_group,
        "events_percentiles": relational.events_percentiles,
        "events_histogram": relational.events_histogram,
        "events_pivot": relational.events_pivot,
        "events_approx_distinct": relational.events_approx_distinct,
        "events_windowed_agg": lambda s, d: _rounded(
            relational.events_windowed_agg(s, d), {"sum_value": 2}
            ).withColumn("window_start", F.col("window_start").cast("string")),
        # engine-roundtrip queries: data passes through the Iceberg
        # write → commit → pruned scan paths before aggregation
        "iceberg_roundtrip_agg": iceberg_queries.iceberg_roundtrip_agg,
        "iceberg_equality_delete": iceberg_queries.iceberg_equality_delete,
        "iceberg_schema_evolution": iceberg_queries.iceberg_schema_evolution,
        "iceberg_time_travel": iceberg_queries.iceberg_time_travel,
        "iceberg_incremental_read": iceberg_queries.iceberg_incremental_read,
        "mv_incremental_refresh": iceberg_queries.mv_incremental_refresh,
        "csv_source_roundtrip": iceberg_queries.csv_source_roundtrip,
        "iceberg_lineitem_partitioned":
            iceberg_queries.iceberg_lineitem_partitioned,
        "iceberg_bucket_pruned": iceberg_queries.iceberg_bucket_pruned,
        "iceberg_truncate_pruned": iceberg_queries.iceberg_truncate_pruned,
        # training-data pipeline operators (documents/embeddings tables)
        "dedup_exact": dedup.dedup_exact,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "dedup_simhash": dedup.dedup_simhash,
        "dedup_embedding_cosine": dedup.dedup_embedding_cosine,
        "dedup_clusters": dedup.dedup_clusters,
        "ann_cosine_topk": similarity.ann_cosine_topk,
        "ann_lsh_pairs": similarity.ann_lsh_pairs,
        "text_language_id": text.text_language_id,
        "text_quality_score": text.text_quality_score,
        "text_token_count": text.text_token_count,
        "text_fingerprint": text.text_fingerprint,
        "text_tfidf_top_terms": text.text_tfidf_top_terms,
        "multimodal_features": multimodal.multimodal_features,
        "asof_events_orders": temporal.asof_events_orders,
        "dataset_split_summary": sampling.dataset_split_summary,
        **relational2.QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey, round(revenue, 2) AS revenue,
                   CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate
            FROM (
              SELECT l.l_orderkey, sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
                     o.o_orderdate
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE c.c_mktsegment = 'BUILDING'
                AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
                AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
              GROUP BY l.l_orderkey, o.o_orderdate
              ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
              LIMIT 10
            )
        """,
        "q5_local_supplier_volume": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND c_nationkey = s_nationkey
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name
        """,
        "q6_forecast_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "q12_shipmode": """
            SELECT l_returnflag,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS high_line_count,
                   sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_returnflag
        """,
        "distinct_union": """
            SELECT DISTINCT o_custkey FROM (
              SELECT o_custkey FROM orders WHERE o_totalprice > 100000
              UNION ALL
              SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            )
        """,
        "anti_semi_join": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
            GROUP BY c_mktsegment
        """,
        "case_projection": """
            SELECT o_orderstatus,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS high_line_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            GROUP BY o_orderstatus
        """,
        "window_topn_per_group": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey)
                       AS rn
              FROM orders
            ) WHERE rn = 1
        """,
        # events_approx_distinct: deliberately NO oracle — HLL++ sketch
        # estimates are engine-specific; the driver's rows-only check
        # applies (exact_users column anchors correctness in tests)
        "events_percentiles": """
            SELECT event_type, count(*) AS n_events,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.9), 4) AS p90
            FROM events
            GROUP BY event_type
        """,
        "events_histogram": """
            SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
                   count(*) AS n,
                   round(min(value), 2) AS lo, round(max(value), 2) AS hi
            FROM events GROUP BY 1
        """,
        "events_pivot": """
            SELECT CAST(user_id % 10 AS BIGINT) AS decile,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signup,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view
            FROM events GROUP BY 1
        """,
        "events_windowed_agg": """
            SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
                   event_type, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "iceberg_roundtrip_agg": """
            SELECT o_orderstatus, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY o_orderstatus
        """,
        "iceberg_equality_delete": """
            SELECT o_orderstatus, count(*) AS n_orders
            FROM orders
            WHERE o_custkey % 10 <> 3
            GROUP BY o_orderstatus
        """,
        "iceberg_time_travel": """
            SELECT o_orderstatus, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total
            FROM orders
            WHERE o_orderkey % 2 = 0
            GROUP BY o_orderstatus
        """,
        "iceberg_incremental_read": """
            SELECT o_orderstatus, count(*) AS n_orders
            FROM orders
            WHERE o_orderkey % 2 = 1
            GROUP BY o_orderstatus
        """,
        "mv_incremental_refresh": """
            SELECT sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                       THEN 1 ELSE 0 END) AS high_line_count,
                   count(o_orderkey) AS n_orders, o_orderstatus
            FROM orders
            GROUP BY o_orderstatus
        """,
        "csv_source_roundtrip": """
            SELECT o_orderpriority, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-06-01 00:00:00'
            GROUP BY o_orderpriority
        """,
        "iceberg_lineitem_partitioned": """
            SELECT l_returnflag, count(*) AS n_lines,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-09-01 00:00:00'
            GROUP BY l_returnflag
        """,
        "iceberg_schema_evolution": """
            SELECT o_orderstatus, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders
            GROUP BY o_orderstatus
            ORDER BY o_orderstatus
        """,
        "iceberg_bucket_pruned": """
            SELECT o_custkey, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total
            FROM orders
            WHERE o_custkey IN (11, 42, 77)
            GROUP BY o_custkey
            ORDER BY o_custkey
        """,
        "iceberg_truncate_pruned": """
            SELECT CAST(o_custkey % 100 AS BIGINT) AS ckey_mod,
                   count(*) AS n_orders
            FROM orders
            WHERE o_custkey >= 200 AND o_custkey < 400
            GROUP BY 1
            ORDER BY 1
        """,
        **dedup.ORACLE_SQL,
        **similarity.ORACLE_SQL,
        **text.ORACLE_SQL,
        **multimodal.ORACLE_SQL,
        **relational2.ORACLE_SQL,
        **temporal.ORACLE_SQL,
        **sampling.ORACLE_SQL,
    }
