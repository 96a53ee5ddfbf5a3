"""Per-entry profiler for optimization rounds (guide §1).

Usage:
    python tools/profile_entry.py [--sf DIR] [--reps N] [--cprofile]
                                  [--explain-dir DIR] name [name ...]

For each named entry from __spark_entry__.queries():
  * runs it REPS times (first rep = codegen warm-up, like bench.py),
  * prints min/mean wall seconds,
  * pulls the per-job wall breakdown from the local Spark UI REST API
    (job description, duration, task count) so the expensive Spark jobs
    inside a scenario entry are attributable,
  * optionally dumps `.explain("formatted")` of the returned frame to
    <explain-dir>/<name>.txt,
  * optionally runs one rep under cProfile and prints the top driver-side
    Python hot spots (py4j socket wait == executor time; everything else
    is genuine driver Python cost).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ui_jobs(spark):
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded",
                timeout=5) as r:
            return json.loads(r.read())
    except Exception as e:  # noqa: BLE001
        print(f"# UI REST unavailable: {e}", file=sys.stderr)
        return []


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cprofile", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--jobs", action="store_true",
                    help="print per-job UI breakdown of the last rep")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from iceberg_rust_archive_spark.session import get_spark

    spark = get_spark("profile")
    qs = entrymod.queries()
    missing = [n for n in args.names if n not in qs]
    if missing:
        raise SystemExit(f"unknown entries: {missing}")

    # same warm-up as bench.py so rep timings are comparable
    warm = spark.read.parquet(os.path.join(args.sf, "region.parquet"))
    warm = warm.repartition(spark.sparkContext.defaultParallelism)
    warm.mapInPandas(lambda it: it, schema=warm.schema).count()

    for name in args.names:
        fn = qs[name]
        reps = []
        jobs_before = len(_ui_jobs(spark))
        last_df = None
        explain_txt = None
        for i in range(args.reps):
            if i == args.reps - 1:
                jobs_before = len(_ui_jobs(spark))
            spark.sparkContext.setJobDescription(f"profile:{name}:rep{i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            n = df.count()
            reps.append(time.perf_counter() - t0)
            last_df = df
            if args.explain_dir and i == args.reps - 1:
                # capture BEFORE clearCache: cached forks must show as
                # InMemoryTableScan, the way the timed run planned them
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                explain_txt = buf.getvalue()
            spark.catalog.clearCache()
        print(f"{name}: min={min(reps):.3f}s reps="
              f"{[round(r, 2) for r in reps]} rows={n}")
        if args.jobs:
            jobs = _ui_jobs(spark)
            new = jobs[: len(jobs) - jobs_before] if jobs else []
            tot = 0.0
            rows = []
            for j in reversed(new):
                try:
                    from datetime import datetime
                    fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
                    dur = (datetime.strptime(j["completionTime"], fmt)
                           - datetime.strptime(j["submissionTime"], fmt)
                           ).total_seconds()
                except Exception:  # noqa: BLE001
                    dur = -1
                tot += max(dur, 0)
                rows.append((dur, j.get("numTasks", -1),
                             (j.get("description") or j.get("name", ""))[:110]))
            print(f"  {len(new)} jobs, sum job wall {tot:.2f}s "
                  f"(entry wall {reps[-1]:.2f}s; gap = driver-side Python)")
            for dur, ntasks, desc in sorted(rows, reverse=True)[:14]:
                print(f"    {dur:7.3f}s  tasks={ntasks:<4d} {desc}")
        if args.explain_dir and explain_txt is not None:
            os.makedirs(args.explain_dir, exist_ok=True)
            with open(os.path.join(args.explain_dir, f"{name}.txt"),
                      "w") as f:
                f.write(explain_txt)
        if args.cprofile:
            import cProfile
            import pstats
            pr = cProfile.Profile()
            pr.enable()
            fn(spark, args.sf).count()
            pr.disable()
            spark.catalog.clearCache()
            st = pstats.Stats(pr)
            st.sort_stats("cumulative")
            print(f"--- cProfile {name} (top cumulative) ---")
            st.print_stats(28)


if __name__ == "__main__":
    main()
