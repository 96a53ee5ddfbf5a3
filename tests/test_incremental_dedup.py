"""Incremental MinHash dedup against a persistent Iceberg index:
batch-over-batch correctness, index growth, and the pruning story."""

import pytest

from iceberg_rust_archive_spark.catalog import FileCatalog
from iceberg_rust_archive_spark.operators.incremental_dedup import (
    create_minhash_index, dedup_against_index, index_add, minhash_bands,
)
from iceberg_rust_archive_spark.table import Table


@pytest.fixture()
def catalog(tmp_path):
    return FileCatalog(str(tmp_path / "wh"))


def _doc(i, text):
    return (i, text)


BASE = [
    _doc(1, "the quick brown fox jumps over the lazy dog again and again"),
    _doc(2, "pack my box with five dozen liquor jugs before the night ends"),
    _doc(3, "sphinx of black quartz judge my vow said the old librarian"),
]
# 101 = near-copy of 1; 102 = novel; 103 = exact copy of 2
BATCH = [
    _doc(101, "the quick brown fox jumps over the lazy dog again and again!"),
    _doc(102, "completely different content about spark query planning at scale"),
    _doc(103, "pack my box with five dozen liquor jugs before the night ends"),
]


def test_incremental_dedup_roundtrip(spark, catalog):
    idx = create_minhash_index(catalog, "db.mh_index", buckets=16)
    index_add(spark, idx, spark.createDataFrame(BASE, ["doc_id", "text"]))
    idx.refresh()

    dups, novel = dedup_against_index(
        spark, idx, spark.createDataFrame(BATCH, ["doc_id", "text"]),
        threshold=0.5)
    got = {r.doc_id: (r.dup_of, r.est_jaccard) for r in dups.collect()}

    assert 103 in got and got[103][0] == 2 and got[103][1] == 1.0
    assert 101 in got and got[101][0] == 1 and got[101][1] >= 0.5
    assert novel == [102]

    # the novel doc was appended: a re-probe of the same batch now
    # reports 102 as a duplicate of itself-in-the-index
    idx.refresh()
    dups2, novel2 = dedup_against_index(
        spark, idx, spark.createDataFrame(BATCH, ["doc_id", "text"]),
        threshold=0.5, add_novel=False)
    got2 = {r.doc_id: r.dup_of for r in dups2.collect()}
    assert got2.get(102) == 102
    assert novel2 == []


def test_index_probe_prunes_files(spark, catalog):
    """The IN-probe must prune index files via the bucket partition —
    the LSH-lookup-as-manifest-pruning claim, checked on file counts."""
    from iceberg_rust_archive_spark.predicates import (
        Pred, prune_datafiles, prune_manifests,
    )
    from iceberg_rust_archive_spark.sources.manifests import (
        read_manifest, read_manifest_list,
    )

    idx = create_minhash_index(catalog, "db.mh_prune", buckets=8)
    docs = [(i, f"unique document number {i} with its own words {i * 7}")
            for i in range(40)]
    index_add(spark, idx, spark.createDataFrame(docs, ["doc_id", "text"]))
    idx.refresh()

    bands = minhash_bands(
        spark.createDataFrame(docs[:1], ["doc_id", "text"]))
    keys = [r["key"] for r in bands.select("key").distinct().collect()]

    md = idx.metadata
    snap = md.current_snapshot()
    spec, schema = md.default_spec(), md.current_schema()
    mlist = read_manifest_list(snap.manifest_list)
    all_files = [e.data_file for mle in mlist
                 for e in read_manifest(mle.manifest_path)]
    preds = [Pred("key", "in", keys)]
    kept = prune_datafiles(preds, schema,
                           [e.data_file
                            for m in prune_manifests(preds, spec, schema,
                                                     mlist)
                            for e in read_manifest(m.manifest_path)],
                           spec)
    # one doc probes 4 band keys → at most 4 of the 8 bucket dirs
    assert len(all_files) >= 8
    assert len(kept) < len(all_files)
    assert len(kept) >= 1


def test_empty_batch(spark, catalog):
    idx = create_minhash_index(catalog, "db.mh_empty", buckets=8)
    dups, novel = dedup_against_index(
        spark, idx, spark.createDataFrame([], "doc_id long, text string"))
    assert dups.count() == 0 and novel == []


def test_probe_key_cap_fallback_matches_uncapped(spark, catalog,
                                                 monkeypatch):
    """Above PROBE_KEY_CAP distinct band keys the probe must skip the
    driver-side IN pruning (a jumbo backfill would otherwise ship a
    multi-GB literal predicate) and still return identical verdicts via
    the bucket-key join alone."""
    import iceberg_rust_archive_spark.operators.incremental_dedup as inc

    idx = create_minhash_index(catalog, "db.mh_cap", buckets=16)
    index_add(spark, idx, spark.createDataFrame(BASE, ["doc_id", "text"]))
    idx.refresh()
    batch = spark.createDataFrame(BATCH, ["doc_id", "text"])

    dups_ref, novel_ref = dedup_against_index(
        spark, idx, batch, threshold=0.5, add_novel=False)
    ref = {(r.doc_id, r.dup_of, r.est_jaccard)
           for r in dups_ref.collect()}

    monkeypatch.setattr(inc, "PROBE_KEY_CAP", 2)  # any batch overflows
    dups_cap, novel_cap = dedup_against_index(
        spark, idx, batch, threshold=0.5, add_novel=False)
    got = {(r.doc_id, r.dup_of, r.est_jaccard)
           for r in dups_cap.collect()}
    assert got == ref
    assert novel_cap == novel_ref


def test_novel_rows_dataframe_hook(spark, catalog, tmp_path):
    """novel_as_dataframe=True: the hook receives the distinct novel-id
    DataFrame (never a driver list), the sink can persist it
    distributed, and the verdict/index behavior matches the list
    variant exactly."""
    idx = create_minhash_index(catalog, "db.mh_index_dfhook", buckets=16)
    index_add(spark, idx, spark.createDataFrame(BASE, ["doc_id", "text"]))
    idx.refresh()

    staged = str(tmp_path / "staged_novel")
    seen = {}

    def hook(df):
        # a real sink writes distributed; assert we got a DataFrame
        assert hasattr(df, "write"), type(df)
        df.write.mode("overwrite").parquet(staged)
        seen["ok"] = True

    dups, novel_df = dedup_against_index(
        spark, idx, spark.createDataFrame(BATCH, ["doc_id", "text"]),
        threshold=0.5, before_index_commit=hook, novel_as_dataframe=True)
    assert seen.get("ok")
    got = {r.doc_id: r.dup_of for r in dups.collect()}
    assert got == {103: 2, 101: 1}
    assert [r.doc_id for r in novel_df.collect()] == [102]
    assert [r.doc_id for r in
            spark.read.parquet(staged).collect()] == [102]
    # the novel doc landed in the index (same as the list variant)
    idx = idx.refresh()
    dups2, novel2 = dedup_against_index(
        spark, idx, spark.createDataFrame(
            [(202, BATCH[1][1])], ["doc_id", "text"]),
        threshold=0.5, add_novel=False)
    assert {r.doc_id: r.dup_of for r in dups2.collect()} == {202: 102}
    assert novel2 == []
