"""Temporal join operators Spark lacks as built-ins.

**As-of join** (``asof_join``): for every left row, attach the most
recent right row of the same key with ``right_time <= left_time``.
Implemented as a composition of existing DataFrame ops — the classic
union + last-observation-carried-forward pattern:

1. tag left (1) and right (0) rows, union them on aligned columns;
2. one shuffle: window partitioned by key, ordered by
   (time, tag, tiebreak) with rows UNBOUNDED PRECEDING..CURRENT;
3. ``last(right_payload, ignorenulls=True)`` carries the latest right
   row forward; keep only left rows.

Cost = exactly one shuffle + one sort over |L| + |R| — the same
physical shape as a sort-merge join, with no per-key driver loops and
no range explosion. Hot keys skew the sort partition; AQE's skew
handling applies because the window exchange hash-partitions on the
key. Ordering right rows BEFORE left rows at equal timestamps makes
the match inclusive (``right_time <= left_time``).

**Binned range join** (``range_join_binned``): join on
``left_time ∈ [right_start, right_end)`` without the cartesian blowup:
both sides are exploded onto fixed-width time bins, the join runs on
(key, bin) equality — Catalyst gets an equi-join it can shuffle/hash —
and the exact range predicate filters the survivors. Bin width trades
duplication factor against candidate count; intervals spanning many
bins duplicate the right row per bin (bounded by interval/width).

The reference engine has neither operator (no temporal joins in
DataFusion surface it exercises); these extend the engine for
time-series/training-data workloads per the build's north star.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_time: str, right_time: str,
              tiebreak: str | None = None,
              suffix: str = "_matched") -> DataFrame:
    """Backward as-of join. Returns all left columns plus, per right
    column except the key, ``<col><suffix>`` from the matched row (null
    when no right row precedes the left row)."""
    rcols = [c for c in right.columns if c != key]
    # the tiebreak keeps its NATIVE type: casting to string would order
    # numeric ids lexicographically ("9" > "10") and pick the wrong row
    # whenever ten or more right rows share a timestamp (caught by
    # hypothesis in test_asof_join_matches_bruteforce)
    r = right.select(
        F.col(key).alias("_k"), F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
        F.struct(*[F.col(c) for c in rcols]).alias("_rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns])
    lf = left.select(
        F.col(key).alias("_k"), F.col(left_time).alias("_t"),
        # left rows sort after right rows at equal _t via _tag, so their
        # tiebreak value never matters — null keeps the type aligned
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns])
    u = r.unionByName(lf)
    w = (Window.partitionBy("_k")
         .orderBy(F.col("_t"), F.col("_tag"), F.col("_tb"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
               .filter(F.col("_tag") == 1))
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in rcols]
    return matched.select(*out_cols)


def range_join_binned(left: DataFrame, right: DataFrame, key: str,
                      left_time: str, start: str, end: str) -> DataFrame:
    """Equi-joinable range join: left rows against right intervals
    ``[start, end)`` of the same key, via time-binning."""
    # bins are epoch-days; callers needing other widths pre-scale their
    # time columns
    l2 = left.withColumn("_bin",
                         F.floor(F.unix_micros(F.col(left_time))
                                 / (86400 * 1_000_000)))
    r2 = right.withColumn(
        "_bins",
        F.sequence(F.floor(F.unix_micros(F.col(start)) / (86400 * 1_000_000)),
                   F.floor(F.unix_micros(F.col(end)) / (86400 * 1_000_000))))
    r2 = r2.withColumn("_bin", F.explode("_bins")).drop("_bins")
    joined = l2.join(r2, [key, "_bin"])
    return (joined
            .filter((F.col(left_time) >= F.col(start))
                    & (F.col(left_time) < F.col(end)))
            .drop("_bin"))


def asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline as-of query: each event matched to the user's most
    recent order at-or-before the event time; per-event-type count and
    exact-decimal average lag in days. Only the matched ORDER DATE is
    exposed (ties on it are deterministic even when the matched row
    isn't)."""
    from iceberg_rust_archive_spark.session import (
        events_ts_to_ntz, read_parallel,
    )
    ev = (events_ts_to_ntz(
              read_parallel(spark, os.path.join(sf_dir, "events.parquet")))
          .withColumn("ts", F.col("ts").cast("timestamp"))
          .select("event_id", "user_id", "event_type", "ts"))
    orders = (read_parallel(spark, os.path.join(sf_dir, "orders.parquet"))
              .select(F.col("o_custkey").alias("user_id"),
                      # parquet gives TIMESTAMP_NTZ; session is UTC so the
                      # cast is value-preserving and unix_micros applies
                      F.col("o_orderdate").cast("timestamp")
                      .alias("o_orderdate"), "o_orderkey"))
    m = asof_join(ev, orders, key="user_id", left_time="ts",
                  right_time="o_orderdate", tiebreak="o_orderkey")
    lag_days = ((F.unix_micros("ts")
                 - F.unix_micros("o_orderdate_matched"))
                / (86400.0 * 1_000_000))
    return (m.withColumn("lag", lag_days)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.when(F.col("o_orderdate_matched").isNull(), 1)
                       .otherwise(0)).alias("n_unmatched"),
                 F.round(F.sum(F.col("lag").cast("decimal(28,10)"))
                         .cast("double")
                         / F.count("lag"), 4).alias("avg_lag_days"))
            .orderBy("event_type"))


ORACLE_SQL = {
    # DuckDB has a native ASOF JOIN — the oracle IS the spec
    "asof_events_orders": """
        WITH m AS (
          SELECT e.event_type, e.ts, o.o_orderdate
          FROM events e
          ASOF LEFT JOIN orders o
            ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        )
        SELECT event_type, count(*) AS n_events,
               CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_unmatched,
               round(CAST(sum(CAST((epoch_us(ts) - epoch_us(o_orderdate))
                                   / (86400.0 * 1000000)
                                   AS DECIMAL(28,10))) AS DOUBLE)
                     / count(CASE WHEN o_orderdate IS NOT NULL
                             THEN 1 END), 4) AS avg_lag_days
        FROM m GROUP BY event_type
    """,
}
