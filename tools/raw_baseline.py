"""Raw-Spark counterparts of the BASELINE.md B-scenarios.

BASELINE.md defines the perf contract as "engine within 2× of plain
``spark.read.parquet`` + DataFrame equivalents doing the same work".
This tool measures that raw side at $SPARK_GRAFT_SF_DIR (default sf0.1)
so the ratio in BASELINE.md is a recorded number, not a guess.

Each raw scenario mirrors the corresponding engine query in
``operators/iceberg_queries.py`` step for step — same input, same
partitioning work, same aggregate — minus the Iceberg metadata layer
(manifests, stats harvest, commit CAS, pruning happens via hive-style
partition discovery instead):

  B1/B3  iceberg_lineitem_partitioned  -> month-partitioned parquet write
                                          + pruned date-range agg
  B2     iceberg_roundtrip_agg         -> same for orders
  B5     iceberg_equality_delete       -> plain write + left_anti delete agg
  B6     mv_incremental_refresh        -> FULL recompute of the MV aggregate
                                          (the engine side is incremental,
                                          so engine < raw is expected here)

Usage: python tools/raw_baseline.py   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from iceberg_rust_archive_spark.session import get_spark
    spark = get_spark("raw-baseline")
    timings = {}

    def bench(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

    def b1_b3():
        d = tempfile.mkdtemp(prefix="rawb1_")
        try:
            (lineitem
             .withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
             .repartition("ship_month")
             .write.partitionBy("ship_month").mode("overwrite")
             .parquet(os.path.join(d, "t")))
            df = spark.read.parquet(os.path.join(d, "t"))
            (df.filter((F.col("l_shipdate") >= "1996-06-01")
                       & (F.col("l_shipdate") < "1996-09-01"))
             .groupBy("l_returnflag")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
             .collect())
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def b2():
        d = tempfile.mkdtemp(prefix="rawb2_")
        try:
            (orders
             .withColumn("om", F.date_format("o_orderdate", "yyyy-MM"))
             .repartition("om")
             .write.partitionBy("om").mode("overwrite")
             .parquet(os.path.join(d, "t")))
            df = spark.read.parquet(os.path.join(d, "t"))
            (df.filter((F.col("o_orderdate") >= "1996-01-01")
                       & (F.col("o_orderdate") < "1997-01-01"))
             .groupBy("o_orderstatus")
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.round(F.sum("o_totalprice"), 2).alias("total"))
             .collect())
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def b5():
        d = tempfile.mkdtemp(prefix="rawb5_")
        try:
            orders.write.mode("overwrite").parquet(os.path.join(d, "t"))
            df = spark.read.parquet(os.path.join(d, "t"))
            dels = df.filter(F.col("o_custkey") % 10 == 3) \
                     .select("o_orderkey")
            (df.join(dels, "o_orderkey", "left_anti")
             .groupBy("o_orderstatus")
             .agg(F.count(F.lit(1)).alias("n_orders"))
             .collect())
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def b6():
        # full recompute of the MV aggregate over the whole source —
        # what a non-incremental engine must do on every refresh
        (orders
         .groupBy("o_orderstatus")
         .agg(F.sum(F.when(F.col("o_orderpriority")
                           .isin("1-URGENT", "2-HIGH"), 1)
                    .otherwise(0)).alias("high_line_count"),
              F.count("o_orderkey").alias("n_orders"))
         .collect())

    bench("B1_B3_raw_partitioned_write_pruned_agg", b1_b3)
    bench("B2_raw_orders_roundtrip_agg", b2)
    bench("B5_raw_delete_antijoin_agg", b5)
    bench("B6_raw_mv_full_recompute", b6)

    print(json.dumps({"metric": "raw_spark_baseline",
                      "queries": timings,
                      "sf": float(sf_dir.rstrip("/").split("sf")[-1])}))


if __name__ == "__main__":
    main()
