"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Measurement protocol (r4 verdict #1 — this host has a ±30% ambient noise
band and one-shot timings recorded a 42% phantom regression):

* every query runs ``REPS`` times at the FULL benchmark SF; the first
  repetition doubles as the whole-stage-codegen warm-up for that query's
  exact sf-shaped generated classes (an sf0.001 warm-up loop was shown to
  miss shapes — embedding_near_pairs still paid 15.6s cold vs 3.4s warm),
* the headline ``value``/``queries`` figures are the per-query MINIMUM —
  the best observed run is the closest estimator of true plan cost under
  one-sided ambient-load noise,
* ``queries_mean`` carries the mean of the warm repetitions (reps 2..N)
  for throughput context; a large min↔mean gap flags a noisy recording.

Each repetition is fully materialized via ``count()`` so the measured
time covers scan → shuffle → aggregate, not just plan construction, and
caches are cleared between reps so each one measures the real pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def read_steal_ticks():
    """Cumulative CPU steal ticks for the whole VM (/proc/stat cpu line,
    8th value). External tenants on this multi-tenant host steal CPU in
    bursts that loadavg inside the VM cannot see (r16 verdict #5: three
    entries recorded 2-8x inflated in a `contended: false` window). The
    before/after delta per entry makes a contaminated window identifiable
    from the committed JSON alone. Returns -1 where /proc/stat is absent
    so the provenance fields are additions-only and never fail the run."""
    try:
        with open("/proc/stat") as fh:
            for line in fh:
                if line.startswith("cpu "):
                    return int(line.split()[8])
    except (OSError, ValueError, IndexError):
        pass
    return -1


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # host-load provenance (r14 verdict #7: the 94s-vs-72s confusion was
    # adjudicable only from PLANS.md prose). The AMBIENT 1-min load is
    # readable only BEFORE our own local[N] JVM spins up — every later
    # sample is dominated by the bench itself — so `load_start` is the
    # contention signal and `load_end` is recorded for completeness.
    # External tenants inflate every query ~uniformly 25-30%, so a
    # `contended: true` recording should only be compared against
    # another contended one.
    contention_threshold = float(os.environ.get(
        "SPARK_GRAFT_LOAD_THRESHOLD", "4.0"))
    # r15 verdict #5: close the detect→adjudicate loop. A dirty window
    # is WAITED OUT (up to N re-samples) before Spark ever starts; if
    # the host never quiets, the run falls back to the SOLO PROTOCOL
    # subset (the cross-round comparable rows PLANS.md tracks) and
    # stamps `solo_fallback: true` — so the committed BENCH JSON is
    # clean-by-construction: either `contended: false`, or an explicit
    # solo-fallback row, never a silently-inflated full recording.
    retries = int(os.environ.get("SPARK_GRAFT_LOAD_RETRIES", "3"))
    wait_s = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "60"))
    load_start = round(os.getloadavg()[0], 2)
    waits = 0
    while load_start > contention_threshold and waits < retries:
        print(f"# load_start {load_start} > {contention_threshold}: "
              f"waiting {wait_s:.0f}s for a clean window "
              f"({waits + 1}/{retries})", file=sys.stderr)
        time.sleep(wait_s)
        waits += 1
        load_start = round(os.getloadavg()[0], 2)
    # r16 verdict "What's wrong" #3: the auto-substitution to a 7-entry
    # solo subset could silently shrink coverage to 7/50 entries on a
    # never-quiet host (a driver parser that ignores the flag would read
    # it as 43 dropped queries). Dropped: a never-quiet window is now
    # recorded contended-but-COMPLETE (loud banner + `contended: true` +
    # per-entry steal_ticks), never a silently-substituted subset.
    # `solo_fallback` stays in the JSON, hardwired false, for parser
    # compatibility with r15/r16 recordings.
    solo_fallback = False
    if load_start > contention_threshold:
        print("#" * 72, file=sys.stderr)
        print(f"# WARNING: host never quieted (load_start {load_start} > "
              f"{contention_threshold} after {waits} waits).\n"
              f"# Recording the FULL entry set anyway, tagged "
              f"contended: true.\n"
              f"# Compare per-entry steal_ticks before trusting any "
              f"number in this run.", file=sys.stderr)
        print("#" * 72, file=sys.stderr)

    import __spark_entry__ as entrymod
    from iceberg_rust_archive_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()
    # optional positional filter: `python bench.py q1 dedup_exact …`
    # runs only the named entries — the PLANS.md solo-protocol rows
    # (judge cross-measured headline subset) are recorded this way
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    if only:
        missing = [a for a in only if a not in qs]
        if missing:
            raise SystemExit(f"unknown queries: {missing}")
        qs = {k: qs[k] for k in only}

    # warm up the JVM + parquet footer caches with a trivial action,
    # and spin up the reusable Python workers (Arrow/pandas import cost)
    # so Pandas-UDF queries measure compute, not interpreter startup
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm = warm.repartition(spark.sparkContext.defaultParallelism)
    warm.mapInPandas(lambda it: it, schema=warm.schema).count()

    def entry_boundary():
        # isolate entries: clearCache drops persisted frames, dropping
        # temp views releases the plan references that keep dead
        # broadcasts alive, and one explicit GC lets Spark's
        # ContextCleaner actually reclaim those broadcast/shuffle
        # blocks — otherwise 50 entries × 3 reps of engine scenarios
        # accrete heap pressure and late entries (the dedup family)
        # measure eviction thrash instead of plan cost
        spark.catalog.clearCache()
        try:
            for v in spark.catalog.listTables():
                if v.isTemporary:
                    spark.catalog.dropTempView(v.name)
        except Exception:  # noqa: BLE001 — hygiene only
            pass
        spark.sparkContext._jvm.System.gc()

    steal_start = read_steal_ticks()
    mins, means, steals = {}, {}, {}
    for name, fn in qs.items():
        reps = []
        entry_steal0 = read_steal_ticks()
        for _ in range(max(1, REPS)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            reps.append(time.perf_counter() - t0)
            # isolate repetitions/queries: cached frames otherwise pile
            # up and evict the NEXT run's own caches mid-run, so late
            # runs measure recompute thrash instead of plan cost
            spark.catalog.clearCache()
        entry_boundary()
        entry_steal1 = read_steal_ticks()
        steals[name] = (entry_steal1 - entry_steal0
                        if entry_steal0 >= 0 and entry_steal1 >= 0 else -1)
        mins[name] = round(min(reps), 3)
        warm_reps = reps[1:] or reps
        means[name] = round(sum(warm_reps) / len(warm_reps), 3)
        print(f"# {name}: min={mins[name]}s mean={means[name]}s "
              f"reps={[round(r, 2) for r in reps]} rows={n} "
              f"steal={steals[name]}",
              file=sys.stderr)

    total = round(sum(mins.values()), 3)
    # The means map goes on an EARLIER line (it may exceed the driver's
    # 2000-char tail capture); the LAST stdout line carries the headline
    # with the COMPLETE min map so cross-round min-vs-min comparison
    # parses from the tail alone (r7 verdict #2 fixed the
    # truncated-single-line problem; r9 verdict #8 asks for the full min
    # map, not a top-5, on that last line — ~50 queries ≈ 1.6 KB fits).
    load_end = round(os.getloadavg()[0], 2)
    steal_end = read_steal_ticks()
    load = {"load_start": load_start, "load_end": load_end,
            "contended": load_start > contention_threshold,
            "load_waits": waits, "solo_fallback": solo_fallback,
            "steal_start": steal_start, "steal_end": steal_end}
    # per-entry steal deltas ride the DETAIL line (like queries_mean) so
    # the headline line stays parseable from a bounded tail capture
    print(json.dumps({"metric": "total_query_time_detail", "value": total,
                      "unit": "sec", "queries_mean": means,
                      "queries_steal_ticks": steals, "reps": REPS,
                      "sf": float(sf), **load}))
    print(json.dumps({"metric": "total_query_time", "value": total,
                      "unit": "sec", "queries": mins, "reps": REPS,
                      "sf": float(sf), **load}))


if __name__ == "__main__":
    main()
