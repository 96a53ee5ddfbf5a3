"""Chunking operator boundary semantics (operators/chunking.py)."""

import pytest

from iceberg_rust_archive_spark.operators.chunking import (
    chunk_by_chars, chunk_by_tokens,
)


def _mk(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 ["doc_id", "text"])


def test_char_chunks_cover_and_overlap(spark):
    # width 10, overlap 3 → stride 7
    text = "abcdefghijklmnopqrst"  # 20 chars
    out = (chunk_by_chars(_mk(spark, [text]), width=10, overlap=3)
           .orderBy("chunk_idx").collect())
    # n = ceil((20-10)/7)+1 = 3
    assert [r.chunk_text for r in out] == [
        "abcdefghij", "hijklmnopq", "opqrst"]
    assert [r.chunk_start for r in out] == [0, 7, 14]
    # consecutive chunks share exactly `overlap` chars
    assert out[0].chunk_text[-3:] == out[1].chunk_text[:3]
    # full coverage: stitched non-overlap pieces rebuild the doc
    rebuilt = out[0].chunk_text + "".join(
        r.chunk_text[3:] for r in out[1:])
    assert rebuilt == text


def test_char_chunks_short_and_empty_docs(spark):
    out = (chunk_by_chars(_mk(spark, ["abc", ""]), width=10, overlap=3)
           .orderBy("doc_id").collect())
    assert [(r.doc_id, r.chunk_idx, r.chunk_text) for r in out] == [
        (0, 0, "abc"), (1, 0, "")]


def test_char_chunk_exact_multiple_no_phantom_chunk(spark):
    # len == width → exactly one chunk, not a trailing empty one
    out = chunk_by_chars(_mk(spark, ["x" * 10]), width=10,
                         overlap=3).collect()
    assert len(out) == 1
    # len == width + stride → 2 chunks, second is full-width
    out = (chunk_by_chars(_mk(spark, ["y" * 17]), width=10, overlap=3)
           .orderBy("chunk_idx").collect())
    assert [r.chunk_len for r in out] == [10, 10]


def test_token_chunks_windows(spark):
    text = " ".join(f"w{i}" for i in range(10))
    out = (chunk_by_tokens(_mk(spark, [text]), width=4, overlap=1)
           .orderBy("chunk_idx").collect())
    # stride 3: n = ceil((10-4)/3)+1 = 3
    assert [r.chunk_text for r in out] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert [r.chunk_tokens for r in out] == [4, 4, 4]
    # every token appears in some window
    seen = set()
    for r in out:
        seen.update(r.chunk_text.split())
    assert seen == {f"w{i}" for i in range(10)}


def test_token_chunks_whitespace_noise_and_empty(spark):
    out = (chunk_by_tokens(_mk(spark, ["  a   b  ", ""]), width=4,
                           overlap=1).orderBy("doc_id").collect())
    assert [(r.doc_id, r.chunk_text, r.chunk_tokens) for r in out] == [
        (0, "a b", 2), (1, "", 0)]


def test_bad_overlap_rejected(spark):
    with pytest.raises(ValueError):
        chunk_by_chars(_mk(spark, ["x"]), width=5, overlap=5)
    with pytest.raises(ValueError):
        chunk_by_tokens(_mk(spark, ["x"]), width=5, overlap=-1)


def test_chunking_plan_has_no_shuffle(spark):
    """The chunk stream itself must be shuffle-free (pure per-row
    explode) — the 100 TB contract from the module docstring."""
    df = chunk_by_chars(_mk(spark, ["z" * 100]), width=10, overlap=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
