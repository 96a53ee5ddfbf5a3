"""Storage-partitioned (bucket-wise) join over Iceberg bucket transforms.

The reference exposes bucket partitioning (iceberg-rust-spec/src/spec/
partition.rs:36-53 ``Transform::Bucket``, murmur3 semantics in
values.rs:357-428) but its engine never exploits the co-location — every
DataFusion join repartitions both sides. At 100 TB that repartition IS
the bottleneck: joining two bucket-partitioned fact tables shuffles
both in full even though rows with equal keys already live in matching
bucket directories.

``bucketed_join`` is the Spark-first fix (the same idea as Spark's
DSv2 storage-partitioned joins, SPARK-37375, which only fire for DSv2
connectors): when both tables carry ``bucket[N]`` on the join key with
the SAME N, the join decomposes into N independent per-bucket joins
whose inputs are the co-located file groups enumerated from the
manifests — zero repartition of either side:

- per bucket, the smaller side's byte size is known from manifest
  stats; when it fits under ``spark.sql.autoBroadcastJoinThreshold``
  the pair joins as a broadcast-hash join with NO Exchange anywhere
  (the common case: each bucket is ~1/N of the table, so N is chosen
  at table-design time to make buckets broadcastable),
- oversized buckets fall back to a per-bucket shuffle that moves only
  that bucket's rows — still never the whole table.

Correctness guard: merge-on-read deletes make raw file groups
unsound, so tables with live delete files fall back to a plain
``scan() ⋈ scan()`` (Catalyst plans it normally). Scans stay lazy; the
N-way union is a single Spark action.

At 1000 buckets the unioned plan gets large; ``max_buckets`` guards
the plan-size cliff and falls back to the plain join above it (a real
deployment would chunk the union into a few jobs instead).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rust_archive_spark.sources.manifests import (
    read_manifest, read_manifest_list,
)
from iceberg_rust_archive_spark.spec.manifest import (
    CONTENT_DATA, STATUS_DELETED,
)
from iceberg_rust_archive_spark.spec.types import spark_schema_for


def _bucket_layout(table, key: str):
    """(N, partition-field-name) when the table's default spec buckets
    the join key, else None."""
    md = table.metadata
    schema = md.current_schema()
    fld = schema.field_by_name(key)
    if fld is None:
        return None
    for pf in md.default_spec().fields:
        if pf.source_id == fld.field_id and pf.transform.startswith("bucket"):
            n = int(pf.transform[len("bucket["):-1])
            return n, pf.name
    return None


def _files_by_bucket(table, pf_name: str):
    """bucket value → [(path, bytes)] from the current snapshot's
    manifests; None when any live delete file exists (merge-on-read
    applies — raw file groups would resurrect deleted rows)."""
    snap = table.metadata.current_snapshot()
    if snap is None:
        return {}
    out: dict[int, list] = defaultdict(list)
    for mle in read_manifest_list(snap.manifest_list):
        for e in read_manifest(mle.manifest_path):
            if e.status == STATUS_DELETED:
                continue
            if e.data_file.content != CONTENT_DATA:
                return None
            b = e.data_file.partition.get(pf_name)
            if b is None:
                return None  # pre-evolution file without the bucket value
            out[int(b)].append((e.data_file.file_path,
                                e.data_file.file_size_in_bytes or 0,
                                e.data_file.file_format))
    return dict(out)


def bucketed_join(spark: SparkSession, left, right, key: str,
                  extra_on: list[str] | None = None, how: str = "inner",
                  max_buckets: int = 256) -> DataFrame:
    """Join two Iceberg tables bucket-partitioned on ``key`` with equal
    N without repartitioning either side (see module docstring). Falls
    back to a plain scan-join whenever the layout precondition fails,
    so callers can use it unconditionally."""
    from iceberg_rust_archive_spark.operators.scan import (
        _broadcast_threshold,
    )
    from iceberg_rust_archive_spark.session import ensure_read_confs
    ensure_read_confs(spark)
    on = [key] + list(extra_on or [])

    ll, rl = _bucket_layout(left, key), _bucket_layout(right, key)
    if ll is None or rl is None or ll[0] != rl[0] or ll[0] > max_buckets \
            or how != "inner":
        return left.scan(spark).join(right.scan(spark), on=on, how=how)
    n, l_pf = ll
    _, r_pf = rl
    lf, rf = _files_by_bucket(left, l_pf), _files_by_bucket(right, r_pf)
    if lf is None or rf is None:
        return left.scan(spark).join(right.scan(spark), on=on, how=how)

    l_schema = spark_schema_for(left.metadata.current_schema().struct)
    r_schema = spark_schema_for(right.metadata.current_schema().struct)
    thr = _broadcast_threshold(spark)

    parts: list[DataFrame] = []
    for b in range(n):
        lg, rg = lf.get(b), rf.get(b)
        if not lg or not rg:
            continue  # inner join: an empty side empties the bucket
        from iceberg_rust_archive_spark.sources.readers import (
            read_data_files,
        )
        bn_l = "schema.name-mapping.default" in left.metadata.properties
        bn_r = "schema.name-mapping.default" in right.metadata.properties
        ld = read_data_files(spark, l_schema,
                             [(p, f) for p, _, f in lg], by_name=bn_l)
        rd = read_data_files(spark, r_schema,
                             [(p, f) for p, _, f in rg], by_name=bn_r)
        l_bytes = sum(s for _, s, _f in lg)
        r_bytes = sum(s for _, s, _f in rg)
        # the manifest stats name the smaller side exactly — hint it
        # when broadcastable so the per-bucket join plans with zero
        # Exchanges; otherwise only this bucket's rows shuffle
        if 0 < min(l_bytes, r_bytes) <= thr:
            if l_bytes <= r_bytes:
                ld = F.broadcast(ld)
            else:
                rd = F.broadcast(rd)
        parts.append(ld.join(rd, on=on, how="inner"))

    if not parts:
        # no overlapping non-empty buckets → empty result, joined schema
        return left.scan(spark).join(right.scan(spark), on=on, how="inner") \
            .limit(0)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def bucket_join_plan_report(df: DataFrame) -> dict:
    """Shuffle/broadcast counts from the executed plan — the audit
    hook tests and PLANS.md use to prove the no-shuffle property.
    ShuffleExchangeExec prints as ``Exchange hashpartitioning(...)``
    etc.; BroadcastExchange is NOT a shuffle and is counted apart."""
    import re
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {"shuffle_exchanges": len(re.findall(
                r"\bExchange (hashpartitioning|rangepartitioning|"
                r"RoundRobinPartitioning|SinglePartition)", plan)),
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "sort_merge_joins": plan.count("SortMergeJoin")}
