"""BPE vocabulary induction (operators/bpe.py) — checked against a
pure-Python reference implementation of the classic algorithm."""

import numpy as np  # noqa: F401 (parity with sibling test imports)
import pytest

from tests.conftest import SF_DIR

from iceberg_rust_archive_spark.operators.bpe import (
    END, apply_bpe, bpe_summary, learn_bpe, word_frequencies,
)


def _ref_learn(word_counts: dict, n_merges: int):
    """Sennrich-style reference BPE on a word-count dict."""
    seqs = {w: tuple(w) + (END,) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + word_counts[w]
        if not pairs:
            break
        mx = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == mx)
        merges.append(best)
        a, b = best
        new = {}
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i+1]) == best:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[w] = tuple(out)
        seqs = new
    return merges, seqs


CORPUS = ["low low low low low",
          "lower lower newest newest newest",
          "newest newest newest widest widest"]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, t, "s0") for i, t in enumerate(CORPUS)],
        ["doc_id", "text", "source"])


def test_word_frequencies(spark, docs):
    got = {r.w: r.cnt for r in word_frequencies(docs).collect()}
    assert got == {"low": 5, "lower": 2, "newest": 6, "widest": 2}


def test_learn_matches_reference(spark, docs):
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 2}
    want, ref_seqs = _ref_learn(counts, 10)
    got = learn_bpe(docs, n_merges=10)
    assert got == want
    # the classic example's early merges: ('e','s'), ('es','t') ...
    assert ("e", "s") in got and ("es", "t") in got


def test_apply_roundtrip_and_consistency(spark, docs):
    merges = learn_bpe(docs, n_merges=10)
    enc = apply_bpe(docs, merges).collect()
    for r in enc:
        # concatenating a word's tokens (minus the end marker) must
        # rebuild the original words in order
        rebuilt = "".join(r.bpe_tokens).replace(END, " ").strip()
        assert rebuilt == " ".join(r.text.lower().split())
    # enough merges → frequent words become single tokens
    m50 = learn_bpe(docs, n_merges=50)
    enc50 = apply_bpe(docs, m50).collect()
    toks = set()
    for r in enc50:
        toks.update(r.bpe_tokens)
    assert "newest" + END in toks and "low" + END in toks


def test_bpe_summary_compresses(spark):
    rows = bpe_summary(spark, SF_DIR, n_merges=30).collect()
    assert rows
    for r in rows:
        # BPE tokens ≥ 1 per word, and a learned vocab compresses vs
        # raw characters; with few merges counts stay ≥ word count
        assert r.bpe_tokens >= r.ws_tokens > 0
