"""UDAF/UDTF extension surface (functions/udx.py) — each registration
is pinned against a pure-SQL or built-in-operator twin."""

import math

import pytest

from iceberg_rust_archive_spark.functions.udx import register_udx


@pytest.fixture(autouse=True)
def _reg(spark):
    register_udx(spark)


def test_gmean_udaf_matches_sql_twin(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", 0.0), ("c", -1.0)],
        ["k", "v"])
    df.createOrReplaceTempView("gm_t")
    got = {r.k: r.g for r in spark.sql(
        "SELECT k, gmean(v) AS g FROM gm_t GROUP BY k").collect()}
    # SQL twin: exp(avg(ln v)) over positive values
    want = {r.k: r.g for r in spark.sql(
        "SELECT k, exp(avg(CASE WHEN v > 0 THEN ln(v) END)) AS g "
        "FROM gm_t GROUP BY k").collect()}
    assert got.keys() == want.keys()
    for k in got:
        if want[k] is None:
            assert got[k] is None
        else:
            assert math.isclose(got[k], want[k], rel_tol=1e-9)
    assert math.isclose(got["a"], 4.0, rel_tol=1e-9)


def test_chunk_text_udtf_matches_builtin_chunker(spark):
    from pyspark.sql import functions as F

    from iceberg_rust_archive_spark.operators.chunking import (
        chunk_by_chars,
    )
    texts = ["abcdefghijklmnopqrst", "short", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    df.createOrReplaceTempView("ch_t")
    got = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text) for r in spark.sql(
            "SELECT t.doc_id, c.chunk_idx, c.chunk_text "
            "FROM ch_t t, LATERAL chunk_text(t.text, 10, 3) c"
        ).collect())
    want = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in chunk_by_chars(df, width=10, overlap=3)
        .select("doc_id", "chunk_idx", "chunk_text").collect())
    assert got == want


def test_chunk_text_udtf_standalone_from_clause(spark):
    rows = spark.sql(
        "SELECT * FROM chunk_text('abcdefgh', 3, 0)").collect()
    assert [(r.chunk_idx, r.chunk_text) for r in rows] == [
        (0, "abc"), (1, "def"), (2, "gh")]
