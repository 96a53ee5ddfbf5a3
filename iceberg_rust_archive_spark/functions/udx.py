"""User-defined function extension surface: UDAF + UDTF registration.

The reference's user-extension point is DataFusion's ``ScalarUDFImpl``
registration (datafusion_iceberg/src/planner.rs:738-896 — the
``refresh_materialized_view`` UDF is wired through ``register_udf``).
This module is the Spark-native equivalent for the two function kinds
Spark adds beyond scalar UDFs:

- **UDAF** via Arrow-batched grouped-agg ``pandas_udf`` — the whole
  group's column arrives as ONE pandas Series per partition-group, so
  the Python boundary is crossed once per group, not once per row.
- **UDTF** via ``@udtf`` (Python table functions, Spark 4) — callable
  from SQL in the FROM clause / LATERAL position.

Contract note (the reason these live in one place): UDFs are the SLOW
path. Every operator this repo ships is built-in-expression first;
these registrations exist so *user* logic with no built-in equivalent
has a sanctioned, Arrow-batched entry point — and the tests pin each
one against a pure-SQL twin so the semantics stay checkable. At 100 TB
a grouped-agg UDAF adds one Python worker round-trip per group batch;
a UDTF adds one per row — prefer the codegen chunker
(operators/chunking.py) and use ``chunk_text_udtf`` only as the
template for genuinely non-expressible row-to-rows logic.
"""

# NOTE: no `from __future__ import annotations` here — stringified
# type hints break pandas_udf's signature inference (it reads the
# evaluated pd.Series annotation to pick the grouped-agg eval type).
from pyspark.sql import SparkSession


def register_udx(spark: SparkSession) -> None:
    """Register the built-in UDAF/UDTF examples: ``gmean`` (aggregate)
    and ``chunk_text`` (table function). Idempotent per session."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf, udtf

    @pandas_udf("double")
    def gmean(v: pd.Series) -> float:
        """Geometric mean of the positive values (grouped-agg UDAF):
        exp(mean(ln v)) — the multiplicative average quality scorers
        use for rate-like features."""
        import numpy as np
        pos = v[v > 0]
        if len(pos) == 0:
            return None
        return float(np.exp(np.log(pos).mean()))

    spark.udf.register("gmean", gmean)

    @udtf(returnType="chunk_idx: int, chunk_text: string")
    class ChunkText:
        """Row→rows chunker (UDTF form): same boundary rule as
        operators/chunking.py chunk_by_chars (1 chunk when the doc
        fits, else ceil((L-width)/stride)+1 overlapping windows)."""

        def eval(self, text: str, width: int, overlap: int):
            if width is None or not 0 <= (overlap or 0) < width:
                raise ValueError("need 0 <= overlap < width")
            t = text or ""
            stride = width - (overlap or 0)
            n = 1 if len(t) <= width else -(-(len(t) - width) // stride) + 1
            for i in range(n):
                yield i, t[i * stride: i * stride + width]

    spark.udtf.register("chunk_text", ChunkText)
