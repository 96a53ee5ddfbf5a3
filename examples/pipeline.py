"""End-to-end training-data pipeline over the documents table.

Composes the operator library the way a production curation job would,
reading raw documents and landing training-ready chunks in an Iceberg
table — every stage is the scale-shaped implementation from
``operators/`` (no new logic here):

  raw docs
    → language ID + quality score         (text.py — JVM expressions)
    → PII redaction                       (text.redact_pii)
    → exact + MinHash near-dup removal    (dedup.py — banded LSH)
    → benchmark decontamination           (dedup.decontaminate)
    → per-source caps + mixture sampling  (sampling.py — md5 buckets)
    → overlap chunking                    (chunking.py — zero shuffle)
    → Iceberg sink                        (table.append, ACID commit)

Run: ``python examples/pipeline.py [sf_dir] [out_warehouse]``.
Returns/prints the per-stage row accounting, and the final table is a
normal Iceberg table (time travel, changelog, maintenance all apply).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run_pipeline(spark, sf_dir: str, warehouse: str) -> dict:
    from iceberg_rust_archive_spark.catalog import FileCatalog
    from iceberg_rust_archive_spark.operators.chunking import (
        chunk_by_tokens,
    )
    from iceberg_rust_archive_spark.operators.dedup import (
        dedup_minhash_lsh,
    )
    from iceberg_rust_archive_spark.operators.sampling import (
        _hash_bucket,
    )
    from iceberg_rust_archive_spark.operators.text import redact_pii
    from iceberg_rust_archive_spark.session import read_parallel
    from iceberg_rust_archive_spark.spec import (
        NestedField, PartitionField, PartitionSpec, Schema,
        StructTypeSpec,
    )
    from iceberg_rust_archive_spark.table import Table

    counts: dict = {}
    docs = read_parallel(spark, os.path.join(sf_dir, "documents.parquet"))
    counts["raw"] = docs.count()

    # 1. quality gate: drop very short docs (the cheap Gopher-style
    #    floor; richer scores live in text.text_quality_score)
    docs = docs.filter(F.length("text") >= 20)

    # 2. PII scrub — typed placeholders, same pass counts hits
    docs = redact_pii(docs).withColumn("text", F.col("redacted")) \
        .drop("redacted")
    counts["after_quality"] = docs.count()

    # 3. near-dup removal: keep the smaller doc_id of every MinHash
    #    candidate pair (transitive enough at sf scale; dedup_clusters
    #    gives the exact connected-components variant)
    pairs = dedup_minhash_lsh(spark, sf_dir)
    losers = pairs.select(
        F.greatest("doc_a", "doc_b").alias("doc_id")).dropDuplicates()
    docs = docs.join(losers, "doc_id", "left_anti")
    counts["after_dedup"] = docs.count()

    # 3b. benchmark decontamination: drop any doc sharing a word
    #     3-gram with the held-out eval slice (the fixed eval suite's
    #     shingle set is bounded → broadcast; the corpus never
    #     reshuffles)
    from iceberg_rust_archive_spark.operators.dedup import (
        DECONTAM_BENCH_MOD, exploded_shingles,
    )
    is_bench = F.col("doc_id") % DECONTAM_BENCH_MOD == 0
    bench_sh = (exploded_shingles(
        docs.filter(is_bench).select("doc_id", "text"))
        .select("sh").distinct())
    contaminated = (exploded_shingles(
        docs.filter(~is_bench).select("doc_id", "text"))
        .join(F.broadcast(bench_sh), "sh")
        .select("doc_id").distinct())
    docs = docs.filter(~is_bench).join(contaminated, "doc_id",
                                       "left_anti")
    counts["after_decontam"] = docs.count()

    # 4. per-source mixture draw (deterministic md5 buckets, ~70%)
    docs = docs.filter(_hash_bucket(F.col("doc_id")) < 70)
    counts["after_mixture"] = docs.count()

    # 5. chunk into encoder windows
    chunks = (chunk_by_tokens(docs, width=64, overlap=8)
              .select("doc_id", "source", "chunk_idx", "chunk_text",
                      "chunk_tokens"))

    # 6. Iceberg sink, bucket-partitioned on doc_id for co-located
    #    downstream joins
    schema = Schema(0, StructTypeSpec((
        NestedField(1, "doc_id", "long", True),
        NestedField(2, "source", "string", True),
        NestedField(3, "chunk_idx", "int", True),
        NestedField(4, "chunk_text", "string", True),
        NestedField(5, "chunk_tokens", "int", True),
    )))
    spec = PartitionSpec(0, (PartitionField(1, 1000, "doc_bucket",
                                            "bucket[8]"),))
    cat = FileCatalog(warehouse)
    t = Table.create(cat, "train.chunks", schema, spec)
    t.append(spark, chunks)
    t = t.refresh()
    counts["chunks_written"] = t.count()  # metadata-only
    counts["snapshots"] = len(t.metadata.snapshots)
    return counts


if __name__ == "__main__":
    import tempfile

    from iceberg_rust_archive_spark.session import get_spark
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    wh = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="pipeline-wh-")
    out = run_pipeline(get_spark("pipeline-example"), sf, wh)
    for k, v in out.items():
        print(f"{k}: {v}")
