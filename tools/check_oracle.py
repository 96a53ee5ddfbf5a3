"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row counts and
order-insensitive values the way the driver does:

- Spark results come via ``toPandas()``; DuckDB via ``fetch_df()`` —
  NOT fetchall() — because the driver hashes pandas values, and DuckDB
  renders HUGEINT (its sum(INTEGER/BIGINT) result type) as float64 in
  pandas. A value-identical frame with int64-vs-float64 dtype skew
  hash-mismatches on the driver, so we fail it here too.
- The SparkSession is VANILLA (no engine confs) unless
  ``--engine-session`` is passed: the driver builds its own session, so
  queries must not depend on get_spark()'s conf set.

Usage::

    python tools/check_oracle.py [sf_dir] [query ...] [--engine-session]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(pdf):
    """Driver-style canonical frame: columns sorted by name, rows sorted."""
    import pandas as pd
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    return pd.DataFrame(pdf)


def dtype_kinds(pdf):
    """Column → numpy dtype kind ('i' int, 'f' float, 'O' object, ...)."""
    return {c: pdf[c].dtype.kind for c in pdf.columns}


def values_equal(a, b) -> str | None:
    """None if equal, else a description of the first difference."""
    for c in a.columns:
        ca, cb = a[c], b[c]
        if ca.dtype.kind == "f" or cb.dtype.kind == "f":
            import numpy as np
            aa, bb = ca.astype(float).values, cb.astype(float).values
            both_nan = np.isnan(aa) & np.isnan(bb)
            close = np.isclose(aa, bb, rtol=0, atol=1e-6) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                return f"col {c} row {i}: {aa[i]!r} != {bb[i]!r}"
        else:
            neq = ca.astype(str).values != cb.astype(str).values
            if neq.any():
                i = int(neq.argmax())
                return f"col {c} row {i}: {ca.iloc[i]!r} != {cb.iloc[i]!r}"
    return None


def main():
    args = [a for a in sys.argv[1:] if a != "--engine-session"]
    engine_session = "--engine-session" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb
    import __spark_entry__ as entrymod

    if engine_session:
        from iceberg_rust_archive_spark.session import get_spark
        spark = get_spark("oracle-check")
    else:
        # Mirror the driver: a vanilla session with none of the engine confs.
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master(
                    f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
                 .appName("oracle-check-vanilla").getOrCreate())
        spark.sparkContext.setLogLevel("WARN")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = canon(fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(spdf)} (no oracle; rows-only check)")
            continue
        try:
            opdf = canon(con.execute(oracles[name]).fetch_df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failed.append(name)
            continue
        if list(spdf.columns) != list(opdf.columns):
            print(f"FAIL {name}: columns {list(spdf.columns)} != "
                  f"{list(opdf.columns)}")
            failed.append(name)
            continue
        if len(spdf) != len(opdf):
            print(f"FAIL {name}: rowcount {len(spdf)} != {len(opdf)}")
            failed.append(name)
            continue
        sk, ok = dtype_kinds(spdf), dtype_kinds(opdf)
        if sk != ok:
            skew = {c: (sk[c], ok[c]) for c in sk if sk[c] != ok[c]}
            print(f"FAIL {name}: dtype-kind skew (spark, oracle): {skew}")
            failed.append(name)
            continue
        diff = values_equal(spdf, opdf)
        if diff:
            print(f"FAIL {name}: {diff}")
            failed.append(name)
        else:
            print(f"OK   {name}: rows={len(spdf)}")
    n_checked = len(only) if only else len(qs)
    print(f"\n{n_checked - len(failed)}/{n_checked} matched")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
