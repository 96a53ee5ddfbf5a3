"""r16 optimization rewrites: pin result-equivalence of the fused /
single-pass implementations against their original formulations.

Each optimization this round restructured HOW an entry computes without
changing WHAT it computes; these tests re-run the original composition
side by side and require byte-identical rows, so a future regression in
the fused paths (rounding drift, lost rows, reordered rollups) fails
loudly rather than surfacing as an oracle hash mismatch downstream.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_text_gate_stats_matches_standalone_operators(spark):
    from iceberg_rust_archive_spark.operators import text
    st = text.text_gate_stats(spark, SF).cache()
    # quality rollup from the fused per-doc stats == standalone operator
    q = (st.groupBy("source")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              (F.floor(F.avg("st.score_s") + F.lit(0.5)) / 10000.0)
              .alias("avg_score"),
              F.sum(F.when(F.col("st.score_s") < 5000, 1).otherwise(0))
              .alias("n_low_quality"))
         .select("source", "n_docs", "avg_score", "n_low_quality"))
    ref = text.text_quality_score(spark, SF).select(
        "source", "n_docs", "avg_score", "n_low_quality")
    assert _rows(q) == _rows(ref)
    # repetition rollup
    r = (st.groupBy("source")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              (F.floor(F.avg("st.dup_s") + F.lit(0.5)) / 10000.0)
              .alias("avg_dup_frac"),
              (F.max("st.dup_s") / 10000.0).alias("max_dup_frac")))
    ref_r = text.text_repetition_stats(spark, SF).select(
        "source", "n_docs", "avg_dup_frac", "max_dup_frac")
    assert _rows(r) == _rows(ref_r)
    # token-count rollup (ADVICE r16: was unpinned)
    tc = (st.groupBy("lang")
          .agg(F.sum("st.ws_tokens").alias("sum_ws_tokens"),
               F.sum("st.bpe_tokens").alias("sum_bpe_tokens"),
               (F.floor(F.avg("st.bpe_tokens") * 10000 + F.lit(0.5))
                / 10000.0).alias("avg_bpe_tokens")))
    ref_tc = text.text_token_count(spark, SF)
    assert _rows(tc.select(*ref_tc.columns)) == _rows(ref_tc)
    # PII rollup, iterating PII_PATTERNS rather than hard-coding names
    any_hit = sum(F.col(f"st.n_{n}") for n in text.PII_PATTERNS) > 0
    pii = (st.withColumn("has_pii", any_hit.cast("int"))
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                *[F.sum(f"st.n_{n}").alias(f"sum_{n}")
                  for n in text.PII_PATTERNS],
                (F.floor(F.avg("has_pii") * 10000 + F.lit(0.5))
                 / 10000.0).alias("pii_doc_frac")))
    ref_pii = text.text_pii_stats(spark, SF)
    assert _rows(pii.select(*ref_pii.columns)) == _rows(ref_pii)
    st.unpersist()


def test_text_id_fp_stats_matches_standalone_operators(spark):
    from iceberg_rust_archive_spark.operators import text
    st = text.text_id_fp_stats(spark, SF).cache()
    lang = (st.groupBy("lang", F.col("st.predicted").alias("predicted"))
            .agg(F.count(F.lit(1)).alias("n_docs")))
    assert _rows(lang) == _rows(text.text_language_id(spark, SF))
    fp = (st.groupBy("source")
          .agg(F.count(F.lit(1)).alias("n_docs"),
               F.countDistinct("st.fp").alias("n_unique_fp")))
    ref = text.text_fingerprint(spark, SF).select(
        "source", "n_docs", "n_unique_fp")
    assert _rows(fp) == _rows(ref)
    st.unpersist()


@pytest.mark.parametrize("name", ["q2_min_cost_supplier",
                                  "q11_important_stock",
                                  "q18_large_orders"])
def test_decorrelated_queries_match_sql_text(spark, name):
    from iceberg_rust_archive_spark.operators import relational2 as r2
    new = r2.QUERIES[name](spark, SF)
    ref = r2.make_query(r2.SQL[name])(spark, SF)
    # list equality (not multiset): ORDER BY must survive the rewrite
    assert [tuple(r) for r in new.collect()] \
        == [tuple(r) for r in ref.collect()]


def test_shingle_sizes_from_index_match_full_pass(spark):
    """The Jaccard denominators counted off the cached inverted index
    must equal size(shs) for every doc that has shingles."""
    from iceberg_rust_archive_spark.operators import dedup
    d = dedup._docs(spark, SF)
    full = (dedup.shingled(d).select(
        "doc_id", F.size("shs").alias("n_sh")).filter(F.col("n_sh") > 0))
    idx = (dedup.exploded_shingles(d)
           .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh")))
    assert _rows(full) == _rows(idx)


def test_lsh_pairs_all_references_hit_cache(spark):
    """ann_lsh_pairs must plan every signature reference on the cached
    relation — the r16 fix; a regression re-expands the scan+bucket
    subtree 8x (32 parquet scan nodes observed before the fix)."""
    import contextlib
    import io
    from iceberg_rust_archive_spark.operators.similarity import (
        ann_lsh_pairs,
    )
    df = ann_lsh_pairs(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("InMemoryTableScan") >= 8
    # the bucket-fold expression may appear only inside the cached
    # relation's own definition, not once per consumer
    assert plan.count("aggregate(sequence") <= 2 * 3  # ≤ tables, not 4x
    spark.catalog.clearCache()
