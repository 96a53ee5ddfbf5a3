"""Skew-mitigation helpers.

AQE's skew-join splitting handles sort-merge-join skew at runtime, but a
hot GROUP BY key still funnels one reducer partition. ``salted_agg``
runs the classic two-phase aggregation: a deterministic per-row salt
spreads each key over ``salts`` sub-keys for the first (parallel)
partial aggregate, and a second, tiny aggregate merges the partials per
real key. Only algebraic aggregates (sum/count/min/max — the same set
the reference supports incrementally, aggregate_functions.rs:5-99)
decompose this way.

The salt is content-derived (xxhash64 of all columns), not random —
rerunning the pipeline yields identical partials, keeping results
reproducible and cache-friendly."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "sum": F.sum, "count": lambda c: F.count(F.lit(1)),
    "min": F.min, "max": F.max,
}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(df: DataFrame, keys: list[str],
               measures: dict[str, tuple[str, str]],
               salts: int = 16) -> DataFrame:
    """Two-phase aggregation over possibly-skewed keys.

    ``measures``: output column → (func, input column) with func in
    {sum, count, min, max}."""
    for name, (fn, _col) in measures.items():
        if fn not in _PARTIAL:
            raise ValueError(f"{name}: {fn!r} is not algebraic "
                             f"(supported: {sorted(_PARTIAL)})")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(salts)).alias("_salt")
    phase1 = (df.withColumn("_salt", salt)
              .groupBy(*keys, "_salt")
              .agg(*[_PARTIAL[fn](col).alias(name)
                     for name, (fn, col) in measures.items()]))
    return (phase1.groupBy(*keys)
            .agg(*[_MERGE[fn](name).alias(name)
                   for name, (fn, _col) in measures.items()]))
