"""BPE (byte-pair-encoding) vocabulary induction over the corpus.

Every tokenizer-training pipeline starts here, and the scale split is
well defined:

- **Counting is the data-scale work** — one distributed
  ``split → explode → groupBy word`` pass with map-side combine turns
  100 TB of text into a word-frequency table bounded by vocabulary
  size (Zipf: the top-V rows cover ≈all token mass). This stage is
  pure built-in expressions.
- **The merge loop is inherently sequential** (each merge depends on
  the previous) and operates only on the bounded frequency table, so
  it runs driver-side on the collected top-V words — the exact shape
  of every production BPE trainer (fastBPE, HF tokenizers train on a
  word-count dict, not the raw corpus).
- **Application** re-tokenizes text against the learned ranked merge
  table: Arrow-batched ``mapInPandas`` with the standard
  lowest-rank-first merge algorithm (a per-word cache makes it ~one
  dict walk per distinct word per batch).

Determinism: ties in pair frequency break on the lexicographically
smallest pair, so the same corpus always yields the same vocabulary on
any engine at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, standard BPE


def word_frequencies(docs: DataFrame, text_col: str = "text",
                     top_v: int = 50_000) -> DataFrame:
    """Distributed word-frequency table, truncated to the top ``top_v``
    words (deterministic order: count desc, word asc)."""
    return (docs
            .select(F.explode(F.expr(
                f"filter(split(lower({text_col}), '\\\\s+'), "
                "x -> x != '')")).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("w").asc())
            .limit(top_v))


def learn_bpe(docs: DataFrame, n_merges: int = 50,
              text_col: str = "text", top_v: int = 50_000) -> list[tuple]:
    """Learn ``n_merges`` BPE merges. Returns the ranked merge list
    ``[(left, right), ...]`` (rank = list position)."""
    freqs = {r["w"]: r["cnt"] for r in
             word_frequencies(docs, text_col, top_v).collect()}
    # word → current symbol tuple
    seqs = {w: tuple(w) + (END,) for w in freqs}
    merges: list[tuple] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple, int] = {}
        for w, syms in seqs.items():
            c = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        # (count desc, pair lexicographically asc) — deterministic
        max_count = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == max_count)
        merges.append(best)
        a, b = best
        ab = a + b
        new_seqs = {}
        for w, syms in seqs.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i+1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    return merges


def _encode_word(word: str, ranks: dict) -> list[str]:
    """Standard BPE apply: repeatedly merge the lowest-rank pair."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(docs: DataFrame, merges: list[tuple],
              text_col: str = "text",
              out_col: str = "bpe_tokens") -> DataFrame:
    """Append the BPE token array. Arrow-batched; a per-batch word
    cache means each DISTINCT word is encoded once per batch (Zipf:
    almost every occurrence is a cache hit)."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    fields = list(docs.schema.fields) + [
        StructField(out_col, ArrayType(StringType()))]

    def enc(batches):
        cache: dict[str, list[str]] = {}

        def enc_text(t):
            out = []
            for w in (t or "").lower().split():
                hit = cache.get(w)
                if hit is None:
                    hit = cache[w] = _encode_word(w, ranks)
                out.extend(hit)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(enc_text)
            yield pdf

    return docs.mapInPandas(enc, schema=StructType(fields))


def bpe_summary(spark, sf_dir: str, n_merges: int = 40) -> DataFrame:
    """Compression accounting: per-source whitespace-token count vs
    BPE-token count under the learned vocabulary."""
    import os

    from iceberg_rust_archive_spark.session import read_parallel
    d = read_parallel(spark, os.path.join(sf_dir, "documents.parquet"))
    merges = learn_bpe(d, n_merges=n_merges)
    enc = apply_bpe(d, merges)
    return (enc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.expr(
                     "size(filter(split(lower(text), '\\\\s+'), "
                     "x -> x != ''))")).alias("ws_tokens"),
                 F.sum(F.size(F.col("bpe_tokens"))).alias("bpe_tokens"))
            .orderBy("source"))
