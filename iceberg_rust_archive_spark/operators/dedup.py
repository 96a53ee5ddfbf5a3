"""Deduplication operators for large-scale training-data pipelines.

Five families, all expressed as shuffle-conscious DataFrame pipelines over
the ``documents`` / ``embeddings`` tables:

- exact:    hash-groupBy on md5(text) — one shuffle, map-side combine.
- n-gram Jaccard: explode word shingles → inverted-index self-join on the
  shingle (only docs sharing a shingle ever meet — the join IS the
  candidate generation; no O(n²) cross product) → per-pair intersection
  counts → Jaccard.
- MinHash+LSH: K min-hashes per doc from md5(shingle#k) (lexicographic min
  of fixed-width hex == numeric min, so signatures stay strings and stay
  engine-portable), banded into B bands; docs sharing a band bucket become
  candidates; verified with true Jaccard.
- SimHash: 16-bit signature from per-word md5 nibbles; near-dups = pairs
  within Hamming distance ≤ 2 (blocked by band halves to avoid n²).
- embedding cosine: see operators/similarity.py for the kernel.

At 100 TB the shape that matters: every candidate-generation step is a
shuffle on a *content-derived key* (shingle, band bucket) whose fan-out is
bounded; nothing collects to the driver; verification joins happen only on
candidates. Hot keys (ultra-common shingles) are the skew risk — the
shingle join drops shingles occurring in more than ``max_df`` docs, the
standard stop-shingle guard.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def words_col(col: str = "text"):
    return F.filter(F.split(F.col(col), r"\s+"), lambda w: w != "")


def shingles_col(n: int = 3, col: str = "text"):
    """Distinct word n-gram shingles as an array column (JVM-side only:
    sequence + transform + slice stay in codegen)."""
    words = words_col(col)
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(0), F.size(words) - (n - 1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n))))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup summary per source: total docs, distinct texts, dupes
    removed. Keep-policy = min(doc_id) per md5(text)."""
    d = _docs(spark, sf_dir)
    uniq = (d.withColumn("h", F.md5("text"))
            .groupBy("source", "h").agg(F.min("doc_id").alias("keep_id"),
                                        F.count(F.lit(1)).alias("n")))
    return (uniq.groupBy("source")
            .agg(F.sum("n").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_unique"),
                 (F.sum("n") - F.count(F.lit(1))).alias("n_dupes"))
            .orderBy("source"))


def _shingle_pairs(d: DataFrame, n: int = 3, max_df: int = 1000) -> DataFrame:
    """Candidate pairs from the inverted shingle index with df cap."""
    sh = (d.select("doc_id", F.explode(shingles_col(n)).alias("sh")))
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    sh = sh.join(F.broadcast(df_counts.filter(F.col("df") <= max_df)
                             .select("sh")), "sh")
    a = sh.alias("a")
    b = sh.alias("b")
    return (a.join(b, (F.col("a.sh") == F.col("b.sh"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("shared")))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str,
                        threshold: float = 0.6, n: int = 3) -> DataFrame:
    """Near-dup pairs by Jaccard over distinct 3-gram shingles."""
    d = _docs(spark, sf_dir)
    sizes = d.select("doc_id", F.size(shingles_col(n)).alias("n_sh"))
    pairs = _shingle_pairs(d, n)
    jac = (pairs
           .join(F.broadcast(sizes.withColumnRenamed("doc_id", "doc_a")
                             .withColumnRenamed("n_sh", "na")), "doc_a")
           .join(F.broadcast(sizes.withColumnRenamed("doc_id", "doc_b")
                             .withColumnRenamed("n_sh", "nb")), "doc_b")
           .withColumn("jaccard", F.round(
               F.col("shared")
               / (F.col("na") + F.col("nb") - F.col("shared")), 4)))
    return (jac.filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
            .orderBy("doc_a", "doc_b"))


N_HASHES = 12
BAND_SIZE = 3  # → 4 bands


def minhash_signature(n: int = 3):
    """Array of K min-hashes; hash k of a shingle s = md5(s || '#k')."""
    sh = shingles_col(n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(N_HASHES - 1)),
        lambda k: F.array_min(F.transform(
            sh, lambda s: F.md5(F.concat(s, F.lit("#"), k.cast("string"))))))


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str,
                      threshold: float = 0.5) -> DataFrame:
    """MinHash signatures → banded LSH buckets → candidate pairs → verify
    with true Jaccard ≥ threshold."""
    d = _docs(spark, sf_dir)
    sig = d.select("doc_id", minhash_signature().alias("sig"),
                   shingles_col().alias("shs")).filter(F.size("shs") > 0)
    bands = sig.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(N_HASHES // BAND_SIZE - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.concat_ws("|", F.slice(F.col("sig"),
                                         b * BAND_SIZE + 1, BAND_SIZE))
                .alias("key")))).alias("bk"))
    bands = bands.select("doc_id", F.col("bk.band").alias("band"),
                         F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b")).distinct())
    sh = sig.select("doc_id", "shs")
    jac = (cand
           .join(sh.select(F.col("doc_id").alias("doc_a"),
                           F.col("shs").alias("sha")), "doc_a")
           .join(sh.select(F.col("doc_id").alias("doc_b"),
                           F.col("shs").alias("shb")), "doc_b")
           .withColumn("jaccard", F.round(
               F.size(F.array_intersect("sha", "shb"))
               / F.size(F.array_union("sha", "shb")), 4)))
    return (jac.filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard").orderBy("doc_a", "doc_b"))


def simhash16_col(col: str = "text"):
    """16-bit SimHash: per word, bits come from the first 4 hex nibbles of
    md5(word); signature bit b = majority vote. Pure built-in expressions
    (aggregate over the word array — no UDF)."""
    words_sql = f"filter(split({col}, '\\\\s+'), w -> w != '')"
    sig = F.lit(0).cast("long")
    for b in range(16):
        ci, shift = 1 + b // 4, b % 4
        nib = (f"position(substring(md5(w), {ci}, 1) IN "
               f"'0123456789abcdef') - 1")
        vote = (f"aggregate({words_sql}, 0L, (acc, w) -> acc + "
                f"CASE WHEN (({nib}) >> {shift}) & 1 = 1 "
                f"THEN 1 ELSE -1 END)")
        sig = sig + F.when(F.expr(vote) > 0, F.lit(2 ** b)).otherwise(0)
    return sig.alias("simhash")


def dedup_simhash(spark: SparkSession, sf_dir: str,
                  max_hamming: int = 2) -> DataFrame:
    """SimHash near-dup pairs with Hamming ≤ 2, blocked on the high byte
    (docs differing in ≤2 of 16 bits share the high byte whenever the
    differing bits fall in the low byte; we block on high AND low byte in
    two passes — standard multi-index blocking, guarantees recall for
    hamming ≤ 2 without the n² cross join... unless both flipped bits land
    in the same byte of both halves, which cannot happen: 2 flips can touch
    at most 2 bytes, so at least one byte half is identical)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", simhash16_col().alias("sig"))
    d = d.withColumn("hi", (F.col("sig") / 256).cast("int")) \
         .withColumn("lo", (F.col("sig") % 256).cast("int"))
    pairs = None
    for block in ("hi", "lo"):
        a, b = d.alias("a"), d.alias("b")
        p = (a.join(b, (F.col(f"a.{block}") == F.col(f"b.{block}"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.sig").alias("sa"), F.col("b.sig").alias("sb")))
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.distinct().withColumn(
        "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
    return (pairs.filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming").orderBy("doc_a", "doc_b"))


# ---------------------------------------------------------------------------
# DuckDB oracle twins (driver correctness gate). Same algorithm re-expressed
# in DuckDB SQL: md5 hex output, word splitting, shingling, min-hash and
# SimHash bit votes are all bit-identical across the two engines.
# ---------------------------------------------------------------------------

_WORDS = "list_filter(string_split_regex(text, '\\s+'), w -> w != '')"
_SHINGLES = (
    "list_distinct(list_transform("
    " generate_series(1, greatest(0, len({w}) - 2)),"
    " i -> array_to_string(({w})[i:i+2], ' ')))"
).format(w=_WORDS)

_SIMHASH_BITS = " + ".join(
    "(CASE WHEN 2 * len(list_filter({w}, w -> "
    "((strpos('0123456789abcdef', md5(w)[{ci}:{ci}]) - 1) >> {sh}) & 1 = 1"
    ")) > len({w}) THEN {pw} ELSE 0 END)".format(
        w=_WORDS, ci=1 + b // 4, sh=b % 4, pw=2 ** b)
    for b in range(16))

ORACLE_SQL = {
    "dedup_exact": """
        SELECT source, count(*) AS n_docs,
               count(DISTINCT md5(text)) AS n_unique,
               count(*) - count(DISTINCT md5(text)) AS n_dupes
        FROM documents GROUP BY source
    """,
    "dedup_ngram_jaccard": f"""
        WITH sh AS (
          SELECT doc_id, unnest({_SHINGLES}) AS sh FROM documents
        ),
        filtered AS (
          SELECT s.doc_id, s.sh FROM sh s
          JOIN (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 1000) ok
            USING (sh)
        ),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
          FROM filtered a JOIN filtered b
            ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        sizes AS (SELECT doc_id, len({_SHINGLES}) AS n_sh FROM documents)
        SELECT doc_a, doc_b,
               round(shared / (sa.n_sh + sb.n_sh - shared), 4) AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(shared / (sa.n_sh + sb.n_sh - shared), 4) >= 0.6
    """,
    "dedup_minhash_lsh": f"""
        WITH sig AS (
          SELECT doc_id, {_SHINGLES} AS shs,
                 list_transform(generate_series(0, {N_HASHES - 1}),
                   k -> list_min(list_transform({_SHINGLES},
                          s -> md5(s || '#' || k)))) AS sig
          FROM documents WHERE len({_SHINGLES}) > 0
        ),
        bands AS (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(0, {N_HASHES // BAND_SIZE - 1}),
                   b -> array_to_string(
                          sig[b * {BAND_SIZE} + 1 : b * {BAND_SIZE} + {BAND_SIZE}],
                          '|'))) AS key,
                 unnest(generate_series(0, {N_HASHES // BAND_SIZE - 1})) AS band
          FROM sig
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               round(len(list_intersect(sa.shs, sb.shs))
                     / len(list_distinct(list_concat(sa.shs, sb.shs))),
                     4) AS jaccard
        FROM cand
        JOIN sig sa ON sa.doc_id = doc_a
        JOIN sig sb ON sb.doc_id = doc_b
        WHERE round(len(list_intersect(sa.shs, sb.shs))
                    / len(list_distinct(list_concat(sa.shs, sb.shs))), 4)
              >= 0.5
    """,
    "dedup_simhash": f"""
        WITH sigs AS (
          SELECT doc_id, ({_SIMHASH_BITS})::BIGINT AS sig FROM documents
        ),
        keyed AS (SELECT doc_id, sig, sig // 256 AS hi, sig % 256 AS lo
                  FROM sigs),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.sig AS sa, b.sig AS sb
          FROM keyed a JOIN keyed b
            ON a.hi = b.hi AND a.doc_id < b.doc_id
          UNION
          SELECT a.doc_id, b.doc_id, a.sig, b.sig
          FROM keyed a JOIN keyed b
            ON a.lo = b.lo AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, bit_count(xor(sa, sb)) AS hamming
        FROM pairs WHERE bit_count(xor(sa, sb)) <= 2
    """,
}
