"""Scale stress probe (not part of bench.py): amplifies the sf0.1
testdata in-flight (crossJoin with a replica range — no synthetic files
written) and runs the heaviest pipelines at ~10× bench scale, printing
one timing line each. Purpose: verify the operator shapes hold when the
data outgrows a single partition/broadcast — the 100 TB direction —
and catch any plan that silently degrades (cartesian, driver collect,
single-task stage).

Usage: python tools/stress.py [amplification]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from iceberg_rust_archive_spark.session import get_spark
    spark = get_spark("stress")

    def amplify(df, key_cols):
        """Replicate rows amp× with shifted keys so join/group
        cardinalities scale too (not just row counts)."""
        reps = spark.range(amp).withColumnRenamed("id", "_rep")
        out = df.crossJoin(F.broadcast(reps))
        for c in key_cols:
            out = out.withColumn(c, F.col(c) + F.col("_rep") * 10_000_000)
        return out.drop("_rep")

    li = amplify(spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")),
                 ["l_orderkey"])
    docs = amplify(spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")), ["doc_id"])

    t0 = time.perf_counter()
    n = li.count()
    print(f"amplified lineitem: {n} rows ({time.perf_counter()-t0:.1f}s)")

    # q1 shape at 10×
    t0 = time.perf_counter()
    (li.filter(F.col("l_shipdate") <= "1998-09-02")
       .groupBy("l_returnflag", "l_linestatus")
       .agg(F.sum("l_quantity"), F.count(F.lit(1))).collect())
    print(f"q1 @ {amp}x: {time.perf_counter()-t0:.1f}s")

    # exact dedup at 10× docs
    t0 = time.perf_counter()
    (docs.withColumn("h", F.md5("text")).groupBy("source", "h")
         .agg(F.count(F.lit(1))).groupBy("source")
         .agg(F.count(F.lit(1))).collect())
    print(f"dedup_exact @ {amp}x: {time.perf_counter()-t0:.1f}s")

    # shingle inverted index at 10× docs (candidate-generation shuffle)
    from iceberg_rust_archive_spark.operators.dedup import exploded_shingles
    t0 = time.perf_counter()
    n_sh = (exploded_shingles(docs.select("doc_id", "text"))
            .select(F.xxhash64("sh")).count())
    print(f"shingle explode @ {amp}x: {n_sh} shingles "
          f"({time.perf_counter()-t0:.1f}s)")

    # windowed event agg at 10×
    from iceberg_rust_archive_spark.session import events_ts_to_ntz
    ev = amplify(
        events_ts_to_ntz(
            spark.read.parquet(os.path.join(sf_dir, "events.parquet"))),
        ["event_id"])
    t0 = time.perf_counter()
    (ev.groupBy(F.window("ts", "1 hour"), "event_type")
       .agg(F.count(F.lit(1)), F.sum("value")).collect())
    print(f"windowed agg @ {amp}x: {time.perf_counter()-t0:.1f}s")


def lsh_occupancy(spark, sf_dir: str, amp: int):
    """Evidence for the corpus-adaptive LSH claim: signature width
    follows ``bits = clamp(ceil(log2(N/target)))``, so per-bucket
    occupancy should stay ~flat as the corpus amplifies — compare the
    non-empty-bucket mean/p99/max at 1× vs ``amp``× (with a FIXED width
    the occupancy would grow ~linearly in amp)."""
    from iceberg_rust_archive_spark.operators.similarity import (
        LSH_MIN_BITS, _bucket_expr, lsh_bits_needed,
    )
    base = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    for label, factor in (("1x", 1), (f"{amp}x", amp)):
        reps = spark.range(factor).withColumnRenamed("id", "_rep")
        e = (base.crossJoin(F.broadcast(reps))
             .withColumn("vec_id",
                         F.col("vec_id") + F.col("_rep") * 10_000_000)
             .drop("_rep"))
        n = e.count()
        bits = lsh_bits_needed(n)
        e.select("vec_id",
                 F.expr("transform(embedding, x -> cast(x AS DOUBLE))")
                 .alias("v")).createOrReplaceTempView("occ_src")
        row = spark.sql(f"""
            SELECT avg(c) AS mean, max(c) AS mx,
                   percentile(c, 0.99) AS p99
            FROM (SELECT count(*) AS c
                  FROM (SELECT {_bucket_expr(0)} AS b0
                        FROM (SELECT v, {bits} AS bits FROM occ_src))
                  GROUP BY b0)
        """).collect()[0]
        print(f"lsh occupancy @ {label}: N={n} bits={bits} "
              f"(floor {LSH_MIN_BITS}) mean={row.mean:.1f} "
              f"p99={row.p99:.0f} max={row.mx}")


if __name__ == "__main__":
    main()
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from iceberg_rust_archive_spark.session import get_spark
    lsh_occupancy(get_spark("stress"), sf_dir, amp)
