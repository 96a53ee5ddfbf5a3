"""Interleaved A/B benchmark of one entry between two repo checkouts.

Usage: python tools/ab_entry.py ENTRY [rounds] [reps]

Alternates subprocess runs old→new→old→new… (old = /tmp/base_r16
worktree, new = /root/repo), each subprocess timing `reps` executions
(min taken, first rep is warm-up). Prints per-round numbers plus the
/proc/stat steal-tick delta per run so externally-contended rounds are
visible, and the final min-of-mins per side.
"""
import json
import os
import subprocess
import sys
import time

ENTRY = sys.argv[1]
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, REPO)
os.chdir(REPO)
import __spark_entry__ as m
from iceberg_rust_archive_spark.session import get_spark
spark = get_spark("ab")
warm = spark.read.parquet("/root/testdata/sf0.1/region.parquet").repartition(32)
warm.mapInPandas(lambda it: it, schema=warm.schema).count()
fn = m.queries()[ENTRY]
ts = []
for _ in range(REPS):
    t0 = time.perf_counter()
    fn(spark, "/root/testdata/sf0.1").count()
    ts.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
print(json.dumps({"reps": ts}))
"""


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def run(repo):
    code = f"REPO={repo!r}\nENTRY={ENTRY!r}\nREPS={REPS}\n" + RUNNER
    s0 = steal()
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=900)
    s1 = steal()
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        print(out.stdout[-2000:], out.stderr[-3000:])
        raise SystemExit(f"runner failed in {repo}")
    reps = json.loads(line[-1])["reps"]
    return min(reps), reps, s1 - s0


mins = {"old": [], "new": []}
for r in range(ROUNDS):
    BASE = os.environ.get("AB_BASE", "/tmp/base_r17")
    for side, repo in (("old", BASE), ("new", "/root/repo")):
        m, reps, st = run(repo)
        mins[side].append(m)
        print(f"round{r} {side}: min={m:.2f} reps="
              f"{[round(x, 2) for x in reps]} steal+{st}", flush=True)
olds, news = min(mins["old"]), min(mins["new"])
print(f"RESULT {ENTRY}: old={olds:.2f}s new={news:.2f}s "
      f"({(news - olds) / olds * 100:+.1f}%)")
