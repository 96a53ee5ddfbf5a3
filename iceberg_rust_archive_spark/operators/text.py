"""Text-analysis operators over the ``documents`` table — the
building blocks of a training-data curation pipeline:

- **language-ID**: marker-word n-gram heuristic — per-language stopword
  hit counts, argmax with deterministic tie-break. One narrow projection
  + one groupBy; the scoring is pure codegen (no UDF, no shuffle before
  the final small aggregate).
- **quality scoring**: length / punctuation-ratio / stopword-ratio
  features combined into a [0,1] score, summarized per source.
- **token counting**: whitespace tokens AND a BPE-ish regex token count
  (letter runs | digit runs | single punctuation), summarized per lang.
- **document fingerprinting**: Karp-Rabin rolling hash over the word
  stream (mod 1e9+7), duplicate-fingerprint summary per source.

Everything is built-in `pyspark.sql.functions` expressions (lambdas in
``filter``/``transform``/``aggregate`` compile to Catalyst higher-order
functions) so the hot path is JVM-side and columnar; the only shuffle in
each query is the final small groupBy. At 100 TB each of these is a
single scan with map-side partial aggregation — the ideal shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MARKERS = {
    "de": ("der", "die", "und", "das", "ist"),
    "en": ("the", "and", "of", "is", "in"),
    "es": ("el", "la", "que", "los", "es"),
    "fr": ("le", "les", "et", "des", "est"),
    "zh": ("的", "是", "了"),
}
EN_STOP = ("the", "a", "an", "and", "of", "is", "in", "to", "it")
FP_MOD = 1_000_000_007
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_rust_archive_spark.session import read_parallel
    return read_parallel(spark, os.path.join(sf_dir, "documents.parquet"))


_WORDS = "filter(split(lower(text), '\\\\s+'), w -> w != '')"


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of labeled vs predicted language.

    Single scan, zero extra shuffles: nested ``transform()`` lambdas act
    as let-bindings — the outer binds the split words array once, the
    inner binds the 5-score array once — so CollapseProject cannot
    re-inline the split/filter into every argmax reference (the r2 plan
    defeated that with two full-table repartition barriers; this one
    keeps the same single-evaluation property inside one projection).
    Argmax = array_position(array_max); languages listed alphabetically
    so first-match implements the deterministic tie-break."""
    langs = sorted(MARKERS)
    scores = ", ".join(
        "size(filter(ws, w -> w IN ({})))".format(
            ", ".join(f"'{w}'" for w in MARKERS[lg]))
        for lg in langs)
    lang_arr = ", ".join(f"'{lg}'" for lg in langs)
    pred = (
        f"element_at(transform(array({_WORDS}), ws -> "
        f"element_at(transform(array(array({scores})), a -> "
        f"CASE WHEN array_max(a) <= 0 THEN 'und' "
        f"ELSE element_at(array({lang_arr}), "
        f"int(array_position(a, array_max(a)))) END), 1)), 1)")
    return (_docs(spark, sf_dir)
            .select("lang", F.expr(pred).alias("predicted"))
            .groupBy("lang", "predicted")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("lang", "predicted"))


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality summary from per-doc heuristic scores."""
    d = _docs(spark, sf_dir)
    n_words = F.expr(f"size({_WORDS})")
    punct = F.length("text") - F.length(
        F.regexp_replace("text", "[.,!?;:]", ""))
    stop_words = ", ".join(f"'{w}'" for w in EN_STOP)
    n_stop = F.expr(f"size(filter({_WORDS}, w -> w IN ({stop_words})))")
    nw = F.greatest(n_words, F.lit(1))
    score = (0.4 * F.least(n_words / 100.0, F.lit(1.0))
             + 0.3 * (1.0 - punct / F.greatest(F.length("text"), F.lit(1)))
             + 0.3 * (n_stop / nw))
    # per-row and group rounding both go through exact scaled integers
    # + floor(x+0.5): engine round() builtins disagree on exact .00005
    # ties (Spark rounds the shortest-decimal rendering, DuckDB the raw
    # double), and avg(double) is partition-order dependent
    d = d.withColumn("score_s",
                     F.floor(score * 10000 + F.lit(0.5)).cast("long"))
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.floor(F.avg("score_s") + F.lit(0.5)) / 10000.0)
                 .alias("avg_score"),
                 F.sum(F.when(F.col("score_s") < 5000, 1).otherwise(0))
                 .alias("n_low_quality"))
            .orderBy("source"))


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish regex token counts per language."""
    d = _docs(spark, sf_dir)
    ws = F.expr(f"size({_WORDS})")
    bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0))
    return (d.select("lang", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))
            .groupBy("lang")
            .agg(F.sum("ws_tokens").alias("sum_ws_tokens"),
                 F.sum("bpe_tokens").alias("sum_bpe_tokens"),
                 (F.floor(F.avg("bpe_tokens") * 10000 + F.lit(0.5))
                  / 10000.0).alias("avg_bpe_tokens"))
            .orderBy("lang"))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Karp-Rabin rolling hash over words (mod 1e9+7); per-source
    duplicate-fingerprint summary. Word hash = ascii(first)·2^16 +
    ascii(last)·2^8 + length — cheap, engine-portable, collision-poor
    enough at 64-bit accumulator width."""
    d = _docs(spark, sf_dir)
    wh = ("ascii(substring(w, 1, 1)) * 65536 + "
          "ascii(substring(w, -1, 1)) * 256 + length(w)")
    fp = F.expr(
        f"aggregate(transform({_WORDS}, w -> bigint({wh})), 0L, "
        f"(acc, x) -> (acc * 31 + x) % {FP_MOD})")
    d = d.select("source", fp.alias("fp"))
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("fp").alias("n_unique_fp"),
                 (F.count(F.lit(1)) - F.countDistinct("fp"))
                 .alias("n_dupes"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# DuckDB oracle twins.
# ---------------------------------------------------------------------------

_DWORDS = "list_filter(string_split_regex(lower(text), '\\s+'), w -> w != '')"


def _d_marker(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in MARKERS[lang])
    return f"len(list_filter({_DWORDS}, w -> w IN ({words})))"


_D_PRED = ("CASE WHEN " +
           "greatest(" + ", ".join(f"s_{lg}" for lg in MARKERS) + ") <= 0 "
           "THEN 'und' " +
           " ".join(
               f"WHEN s_{lg} = greatest("
               + ", ".join(f"s_{m}" for m in MARKERS)
               + f") THEN '{lg}'" for lg in sorted(MARKERS))
           + " END")

_D_WH = ("ascii(w[1:1]) * 65536 + ascii(w[-1:]) * 256 + length(w)")

ORACLE_SQL = {
    "text_language_id": f"""
        WITH scored AS (
          SELECT lang,
                 {", ".join(f"{_d_marker(lg)} AS s_{lg}" for lg in MARKERS)}
          FROM documents
        )
        SELECT lang, {_D_PRED} AS predicted, count(*) AS n_docs
        FROM scored GROUP BY 1, 2
    """,
    "text_quality_score": f"""
        WITH q AS (
          SELECT source, CAST(floor((
            0.4 * least(len({_DWORDS}) / 100.0, 1.0)
            + 0.3 * (1.0 - (length(text) -
                length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                / greatest(length(text), 1))
            + 0.3 * (len(list_filter({_DWORDS}, w -> w IN
                ({", ".join(f"'{w}'" for w in EN_STOP)})))
                / greatest(len({_DWORDS}), 1))) * 10000 + 0.5)
            AS BIGINT) AS score_s
          FROM documents
        )
        SELECT source, count(*) AS n_docs,
               floor(avg(score_s) + 0.5) / 10000.0 AS avg_score,
               CAST(sum(CASE WHEN score_s < 5000 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_low_quality
        FROM q GROUP BY source
    """,
    "text_token_count": f"""
        WITH t AS (
          SELECT lang, len({_DWORDS}) AS ws_tokens,
                 len(regexp_extract_all(text, '{BPE_RE}')) AS bpe_tokens
          FROM documents
        )
        SELECT lang, CAST(sum(ws_tokens) AS BIGINT) AS sum_ws_tokens,
               CAST(sum(bpe_tokens) AS BIGINT) AS sum_bpe_tokens,
               floor(avg(bpe_tokens) * 10000 + 0.5) / 10000.0 AS avg_bpe_tokens
        FROM t GROUP BY lang
    """,
    "text_fingerprint": f"""
        WITH f AS (
          SELECT source,
                 list_reduce(
                   list_prepend(0::BIGINT,
                     list_transform({_DWORDS}, w -> ({_D_WH})::BIGINT)),
                   (acc, x) -> (acc * 31 + x) % {FP_MOD}) AS fp
          FROM documents
        )
        SELECT source, count(*) AS n_docs,
               count(DISTINCT fp) AS n_unique_fp,
               count(*) - count(DISTINCT fp) AS n_dupes
        FROM f GROUP BY source
    """,
}


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str,
                         k: int = 3) -> DataFrame:
    """Feature extraction: top-k TF-IDF terms per source.

    tf(source, w) = term occurrences within the source's concatenated
    docs; idf(w) = ln(n_sources / sources containing w). One explode →
    one (source, word) aggregate → a broadcast-sized idf table → window
    top-k. At 100 TB the explode shuffles on (source, word) — a
    content-derived key with natural partial aggregation; idf is tiny
    (vocabulary-sized) and broadcast."""
    from pyspark.sql.window import Window
    d = _docs(spark, sf_dir)
    words = (d.withColumn("ws_arr", F.expr(_WORDS))
             .select("source", F.explode("ws_arr").alias("w")))
    tf = words.groupBy("source", "w").agg(F.count(F.lit(1)).alias("tf"))
    n_sources = d.select("source").distinct().count()
    df_counts = (tf.groupBy("w")
                 .agg(F.countDistinct("source").alias("n_src")))
    # no forced broadcast: df_counts is vocabulary-sized (could be 10M+
    # terms at 100 TB) — AQE broadcasts it when it measures small and
    # shuffles on the shared `w` key otherwise
    scored = (tf.join(df_counts, "w")
              .withColumn("tfidf", F.round(
                  F.col("tf") * F.log(F.lit(float(n_sources))
                                      / F.col("n_src")), 6)))
    win = Window.partitionBy("source").orderBy(
        F.col("tfidf").desc(), F.col("w"))
    return (scored.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select("source", "w", "tfidf", "rank")
            .orderBy("source", "rank"))

ORACLE_SQL["text_tfidf_top_terms"] = f"""
    WITH words AS (
      SELECT source, unnest({_DWORDS}) AS w FROM documents
    ),
    tf AS (SELECT source, w, count(*) AS tf FROM words GROUP BY 1, 2),
    dfc AS (SELECT w, count(DISTINCT source) AS n_src FROM tf GROUP BY w),
    ns AS (SELECT count(DISTINCT source) AS n FROM documents),
    scored AS (
      SELECT source, w, round(tf * ln(ns.n::DOUBLE / n_src), 6) AS tfidf
      FROM tf JOIN dfc USING (w) CROSS JOIN ns
    )
    SELECT source, w, tfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY source
                 ORDER BY tfidf DESC, w) AS rank FROM scored
    ) WHERE rank <= 3
"""


# --- PII detection + intra-document repetition (quality gates) ----------

# Conservative, auditable patterns — the pre-filter a training pipeline
# runs before a proper NER pass. All JVM-side regexp_count: zero Python.
PII_PATTERNS = {
    "emails": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phones": r"\+?\d[\d\- ]{7,14}\d",
    "ipv4s": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn_like": r"\b\d{3}-\d{2}-\d{4}\b",
}


def text_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure: document counts and total hits per
    pattern family, plus the fraction of documents with ANY hit — the
    scrub-or-drop routing signal. One scan, one aggregation shuffle."""
    d = _docs(spark, sf_dir)
    hits = d.select(
        "source",
        *[F.regexp_count(F.col("text"), F.lit(rx)).alias(name)
          for name, rx in PII_PATTERNS.items()])
    any_hit = sum(F.col(n) for n in PII_PATTERNS) > 0
    return (hits.withColumn("has_pii", any_hit.cast("int"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 *[F.sum(n).alias(f"sum_{n}") for n in PII_PATTERNS],
                 (F.floor(F.avg("has_pii") * 10000 + F.lit(0.5))
                  / 10000.0).alias("pii_doc_frac"))
            .orderBy("source"))


def redact_pii(docs, text_col: str = "text",
               out_col: str = "redacted") -> "DataFrame":
    """PII REDACTION (not just detection): each pattern family's hits
    are replaced with a typed placeholder (``<EMAIL>``, ``<PHONE>``,
    ``<IP>``, ``<SSN>``) — the standard scrub step training pipelines
    run on web text before tokenization. A chained ``regexp_replace``
    projection: all JVM regex, zero Python, zero shuffle; order
    matters (SSN before phone — an SSN is also a phone-shaped digit
    run) and is fixed here.

    Returns the input plus ``out_col`` and per-family hit counts, so
    callers can route (redact vs drop) on the same pass."""
    placeholders = {"emails": "<EMAIL>", "ssn_like": "<SSN>",
                    "ipv4s": "<IP>", "phones": "<PHONE>"}
    order = ["emails", "ssn_like", "ipv4s", "phones"]
    out = docs
    for name in order:
        out = out.withColumn(
            f"n_{name}",
            F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[name])))
    red = F.col(text_col)
    for name in order:
        red = F.regexp_replace(red, PII_PATTERNS[name],
                               placeholders[name])
    return out.withColumn(out_col, red)


def text_repetition_stats(spark: SparkSession, sf_dir: str,
                          n: int = 3) -> DataFrame:
    """Gopher-style intra-document repetition: fraction of duplicate
    word n-grams per document, aggregated per source. High duplicate
    fraction = boilerplate/spam → drop before training. All
    higher-order functions over one scan; the only shuffle is the final
    per-source aggregate."""
    d = _docs(spark, sf_dir)
    grams = (d
             .withColumn("ws", F.expr(_WORDS))
             .withColumn("gs", F.expr(
                 f"transform(sequence(1, greatest(size(ws) - {n - 1}, 0)),"
                 f" i -> concat_ws(' ', slice(ws, i, {n})))")))
    rep = grams.select(
        "source",
        F.when(F.size("gs") > 0,
               (F.size("gs") - F.size(F.array_distinct("gs")))
               / F.size("gs")).otherwise(F.lit(0.0)).alias("dup_frac"))
    rep = rep.withColumn(
        "dup_s", F.floor(F.col("dup_frac") * 10000 + F.lit(0.5))
        .cast("long"))
    return (rep.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.floor(F.avg("dup_s") + F.lit(0.5)) / 10000.0)
                 .alias("avg_dup_frac"),
                 (F.max("dup_s") / 10000.0).alias("max_dup_frac"))
            .orderBy("source"))


# DuckDB twins of the PII / repetition gates (RE2 and Java regex agree
# on these pattern families; counts via regexp_extract_all length)
ORACLE_SQL["text_pii_stats"] = """
    SELECT source, count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(text,
                '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}')))
                AS BIGINT) AS sum_emails,
           CAST(sum(len(regexp_extract_all(text,
                '\\+?\\d[\\d\\- ]{7,14}\\d'))) AS BIGINT) AS sum_phones,
           CAST(sum(len(regexp_extract_all(text,
                '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b'))) AS BIGINT)
               AS sum_ipv4s,
           CAST(sum(len(regexp_extract_all(text,
                '\\b\\d{3}-\\d{2}-\\d{4}\\b'))) AS BIGINT) AS sum_ssn_like,
           floor(avg(CASE WHEN
                len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}'))
                + len(regexp_extract_all(text,
                   '\\+?\\d[\\d\\- ]{7,14}\\d'))
                + len(regexp_extract_all(text,
                   '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b'))
                + len(regexp_extract_all(text,
                   '\\b\\d{3}-\\d{2}-\\d{4}\\b')) > 0
                THEN 1 ELSE 0 END) * 10000 + 0.5) / 10000.0 AS pii_doc_frac
    FROM documents GROUP BY source
"""

ORACLE_SQL["text_repetition_stats"] = f"""
    WITH g AS (
      SELECT source,
             list_transform(
               range(1, greatest(len(ws) - 2, 0) + 1),
               i -> array_to_string(ws[i:i+2], ' ')) AS gs
      FROM (SELECT source, {_DWORDS} AS ws FROM documents)
    ),
    d AS (
      SELECT source,
             CAST(floor((CASE WHEN len(gs) > 0
                  THEN (len(gs) - len(list_distinct(gs)))::DOUBLE / len(gs)
                  ELSE 0 END) * 10000 + 0.5) AS BIGINT) AS df_s
      FROM g
    )
    SELECT source, count(*) AS n_docs,
           floor(avg(df_s) + 0.5) / 10000.0 AS avg_dup_frac,
           max(df_s) / 10000.0 AS max_dup_frac
    FROM d GROUP BY source
"""


def text_id_fp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document (lang, source, predicted, fp) in ONE corpus pass —
    the shared precursor of the language-ID confusion matrix and the
    Karp-Rabin fingerprint rollup (r16: the two branches previously
    each ran their own scan + split). Same let-binding discipline as
    ``text_gate_stats``; formulas identical to the standalone
    operators."""
    d = _docs(spark, sf_dir)
    langs = sorted(MARKERS)
    scores = ", ".join(
        "size(filter(ws, w -> w IN ({})))".format(
            ", ".join(f"'{w}'" for w in MARKERS[lg]))
        for lg in langs)
    lang_arr = ", ".join(f"'{lg}'" for lg in langs)
    pred = (
        f"element_at(transform(array(array({scores})), a -> "
        f"CASE WHEN array_max(a) <= 0 THEN 'und' "
        f"ELSE element_at(array({lang_arr}), "
        f"int(array_position(a, array_max(a)))) END), 1)")
    wh = ("ascii(substring(w, 1, 1)) * 65536 + "
          "ascii(substring(w, -1, 1)) * 256 + length(w)")
    fp = (f"aggregate(transform(ws, w -> bigint({wh})), 0L, "
          f"(acc, x) -> (acc * 31 + x) % {FP_MOD})")
    st = (f"element_at(transform(array({_WORDS}), ws -> struct("
          f"{pred} AS predicted, {fp} AS fp)), 1)")
    return d.select("lang", "source", F.expr(st).alias("st"))


def text_gate_stats(spark: SparkSession, sf_dir: str,
                    n: int = 3) -> DataFrame:
    """Per-document NARROW stats for the quality / token-count / PII /
    repetition gates, computed in ONE corpus pass (r16 optimization,
    guide §1.2 step 1: the four gate rollups previously each re-scanned
    the corpus and re-ran the split — four full passes for one entry).

    Every word-derived feature is evaluated inside a single
    let-binding ``transform(array(words), ws -> struct(...))``
    expression, so the split/lower/filter pass runs exactly once per
    row and CollapseProject cannot duplicate it (the same nested-lambda
    trick text_language_id uses); the n-gram array gets its own inner
    binding for the same reason. Output is ~10 numeric columns per doc
    — callers cache it (tiny vs the text) and each gate rollup becomes
    a trivial groupBy. Formulas are byte-identical to the standalone
    operators (verified against them and the DuckDB oracle).
    """
    d = _docs(spark, sf_dir)
    stop_words = ", ".join(f"'{w}'" for w in EN_STOP)
    punct = ("(length(text) - length(regexp_replace(text, "
             "'[.,!?;:]', '')))")
    # D-suffixed literals (ADVICE r16): bare 0.4/100.0/1.0 parse as
    # DECIMAL in Spark SQL while the standalone text_quality_score
    # builds DOUBLE literals via the Column API — a decimal
    # intermediate could differ from the double path by ~1 ulp on a
    # boundary doc and flip floor(score*10000+0.5). Double literals
    # make the fused expression tree match the standalone exactly.
    score = (f"(0.4D * least(size(ws) / 100.0D, 1.0D) "
             f"+ 0.3D * (1.0D - {punct} / greatest(length(text), 1)) "
             f"+ 0.3D * (size(filter(ws, w -> w IN ({stop_words}))) "
             f"/ greatest(size(ws), 1)))")
    gs = (f"transform(sequence(1, greatest(size(ws) - {n - 1}, 0)), "
          f"i -> concat_ws(' ', slice(ws, i, {n})))")
    dup_s = (f"element_at(transform(array({gs}), gs -> "
             f"bigint(floor((CASE WHEN size(gs) > 0 THEN "
             f"(size(gs) - size(array_distinct(gs))) / size(gs) "
             f"ELSE 0.0D END) * 10000 + 0.5))), 1)")
    def _sqlq(rx: str) -> str:
        # Spark's default (non-ANSI) string literals eat lone
        # backslashes like Java — double them so the parsed literal is
        # the exact regex F.lit() would have passed
        return rx.replace("\\", "\\\\")

    pii = ", ".join(
        f"regexp_count(text, '{_sqlq(rx)}') AS n_{name}"
        for name, rx in PII_PATTERNS.items())
    st = (f"element_at(transform(array({_WORDS}), ws -> struct("
          f"bigint(floor({score} * 10000 + 0.5D)) AS score_s, "
          f"size(ws) AS ws_tokens, "
          f"size(regexp_extract_all(text, '{_sqlq(BPE_RE)}', 0)) "
          f"AS bpe_tokens, "
          f"{pii}, "
          f"{dup_s} AS dup_s)), 1)")
    return d.select("source", "lang", F.expr(st).alias("st"))


# --- perplexity-proxy quality scoring (corpus bigram LM) ----------------

# Add-k smoothing constant for the bigram model.
PPL_K = 0.5


def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source perplexity-proxy summary from a corpus-trained word
    bigram LM — the CCNet/GPT-3-style quality gate (score documents by
    how "expected" their word sequences are; boilerplate and gibberish
    both score badly) without any external model artifact.

    Model: P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V) with add-k
    smoothing over the corpus vocabulary V; per-doc score = mean
    negative log-prob over its bigram instances (rounded before the
    source rollup so cross-engine float summation can't flap the
    grade).

    Scale shape: one explode → one (w1,w2) count aggregate (heavy-tail
    Zipf keys partial-aggregate well map-side), one unigram aggregate,
    then the corpus bigrams join back against the count tables on
    content-derived keys — AQE broadcasts the count sides when they
    measure small and shuffles on the shared key otherwise. Zero
    Python. At 100 TB the count tables are vocabulary-sized; the
    standard width cut (hash bigrams to 64-bit before counting) drops
    in without changing the plan shape."""
    d = _docs(spark, sf_dir)
    words = (d.select("doc_id", "source", F.expr(_WORDS).alias("ws"))
             .filter(F.size("ws") >= 2))
    bigrams = words.select(
        "doc_id", "source",
        F.explode(F.expr(
            "transform(slice(ws, 1, size(ws) - 1), "
            "(w, i) -> struct(w AS w1, element_at(ws, i + 2) AS w2))"
        )).alias("bg")).select("doc_id", "source",
                               F.col("bg.w1").alias("w1"),
                               F.col("bg.w2").alias("w2"))
    bg_counts = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c_bg"))
    uni_counts = (words.select(F.explode("ws").alias("w"))
                  .groupBy("w").agg(F.count(F.lit(1)).alias("c_uni")))
    vocab = uni_counts.count()
    scored = (bigrams
              .join(bg_counts, ["w1", "w2"])
              .join(uni_counts.withColumnRenamed("w", "w1"), "w1")
              .withColumn("nll", -F.log(
                  (F.col("c_bg") + F.lit(PPL_K))
                  / (F.col("c_uni") + F.lit(PPL_K * vocab)))))
    per_doc = (scored.groupBy("doc_id", "source")
               .agg(F.floor(F.avg("nll") * 10000 + F.lit(0.5))
                    .cast("long").alias("doc_s")))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.floor(F.avg("doc_s") / 10.0 + F.lit(0.5)) / 1000.0)
                 .alias("avg_nll"),
                 (F.floor(F.max("doc_s") / 10.0 + F.lit(0.5)) / 1000.0)
                 .alias("max_nll"))
            .orderBy("source"))


ORACLE_SQL["text_perplexity_proxy"] = f"""
    WITH w AS (
      SELECT doc_id, source, {_DWORDS} AS ws FROM documents
    ), eligible AS (
      SELECT * FROM w WHERE len(ws) >= 2
    ), bg AS (
      SELECT doc_id, source, ws[i] AS w1, ws[i + 1] AS w2
      FROM eligible, unnest(generate_series(1, len(ws) - 1)) AS t(i)
    ), bgc AS (
      SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY 1, 2
    ), unic AS (
      SELECT w, count(*) AS c_uni
      FROM (SELECT unnest(ws) AS w FROM eligible) GROUP BY 1
    ), v AS (SELECT count(*) AS vocab FROM unic),
    scored AS (
      SELECT bg.doc_id, bg.source,
             -ln((c_bg + {PPL_K}) / (c_uni + {PPL_K} * v.vocab)) AS nll
      FROM bg
      JOIN bgc USING (w1, w2)
      JOIN unic ON unic.w = bg.w1
      CROSS JOIN v
    ), per_doc AS (
      SELECT doc_id, source,
             CAST(floor(avg(nll) * 10000 + 0.5) AS BIGINT) AS doc_s
      FROM scored GROUP BY 1, 2
    )
    SELECT source, count(*) AS n_docs,
           floor(avg(doc_s) / 10.0 + 0.5) / 1000.0 AS avg_nll,
           floor(max(doc_s) / 10.0 + 0.5) / 1000.0 AS max_nll
    FROM per_doc GROUP BY source ORDER BY source
"""
