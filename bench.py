"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via a count-collapsing action
(``df.write.format("noop")``-style foreach is overkill; we use
``count()`` after a deterministic projection) so the measured time covers
scan → shuffle → aggregate, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entrymod
    from iceberg_rust_archive_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm up the JVM + parquet footer caches with a trivial action,
    # and spin up the reusable Python workers (Arrow/pandas import cost)
    # so Pandas-UDF queries measure compute, not interpreter startup
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm = warm.repartition(spark.sparkContext.defaultParallelism)
    warm.mapInPandas(lambda it: it, schema=warm.schema).count()

    timings = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s rows={n}", file=sys.stderr)
        # isolate queries: cached frames from one query otherwise pile
        # up and evict the NEXT query's own caches mid-run, so late
        # queries measure recompute thrash instead of plan cost
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(json.dumps({"metric": "total_query_time", "value": total,
                      "unit": "sec", "queries": timings, "sf": float(sf)}))


if __name__ == "__main__":
    main()
