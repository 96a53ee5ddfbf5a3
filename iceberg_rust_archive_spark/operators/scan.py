"""Iceberg table scan → Spark DataFrame (SURVEY §2 A1-A8, A35).

Pipeline (mirrors datafusion_iceberg/src/table.rs:265-728):
1. resolve snapshot (branch / snapshot-id / as-of-timestamp / seq range),
2. read the manifest list; partition-level pruning on FieldSummary bounds,
3. read surviving manifests; file-level pruning on column min/max + nulls,
4. split data vs equality-delete files; files newer than every delete
   become one bulk ``spark.read.parquet(*files)`` (the delete-free
   FileScanConfig, table.rs:694-727), older files take ONE
   sequence-tagged pass — per-file (sequence, partition) tags via a
   broadcast path join, then one anti-join per distinct
   equality-column set with the sequence/scope comparisons as
   residual join conditions (A5 semantics of table.rs:498-531,631-641
   with plan size O(#column-sets), not O(strata × partitions)),
5. residual filter re-applied above the scan (inexact semantics, A7) and
   projection pushed into Spark (A6 — Catalyst prunes parquet columns).

All metadata steps are driver-side Python over small manifest rows; the
returned DataFrame is lazy, so Catalyst still sees a plain parquet relation
list and applies its own pushdown/row-group pruning on top.
"""

from __future__ import annotations

import dataclasses as _dc
import json
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rust_archive_spark.predicates import (
    Pred, localize_naive_tstz, prune_datafiles, prune_manifests,
    to_spark_filter,
)
from iceberg_rust_archive_spark.sources.manifests import (
    read_manifest_list, read_manifests,
)
from iceberg_rust_archive_spark.sources.readers import read_data_files
from iceberg_rust_archive_spark.spec.manifest import (
    CONTENT_DATA, CONTENT_EQUALITY_DELETES, CONTENT_POSITION_DELETES,
    STATUS_DELETED,
)
from iceberg_rust_archive_spark.spec.table_metadata import TableMetadata
from iceberg_rust_archive_spark.spec.types import (
    StructTypeSpec, spark_schema_for,
)

# concurrent fetch (sources/manifests.py) shared with commit-rebuild and
# maintenance paths; old private name kept for existing callers/tests
_read_manifests = read_manifests

# auto plan-mode switches to executor-side planning at this many
# manifests; overridable per table via the read.plan-mode /
# read.plan.distributed-min-manifests properties. The stress probe
# (tools/stress.py distributed_plan_latency) puts the local-FS
# crossover near 256 manifests × 64 entries (local 4.4s vs
# distributed 1.7s at 512×64); object stores cross earlier because
# the local path also pays per-manifest RTTs, so the default sits
# between the two regimes.
DISTRIBUTED_PLAN_MIN_MANIFESTS = 128


def _entry_filter(entries, start_seq):
    """Shared per-entry admission rule for both plan modes: drop
    tombstoned entries and (for incremental reads) old sequences."""
    for e in entries:
        if e.status == STATUS_DELETED:
            continue
        if start_seq >= 0 and (e.sequence_number or 0) <= start_seq:
            continue
        yield e


# DV sets whose total blob bytes fit under this decode driver-side —
# one local createDataFrame instead of a Python-RDD job per scan. At
# ~1.75 bytes/position this is ≈150k deleted rows; the result was
# going to be broadcast into the anti-join anyway, so materializing it
# on the driver costs nothing extra while saving a full Python worker
# round-trip on every statement that scans the table.
DV_DRIVER_DECODE_MAX_BYTES = 256 * 1024

# Decoded driver-side DV pair DataFrames, keyed by the exact blob
# descriptor set. Puffin blobs are immutable (a DV rewrite lands a NEW
# path/offset), so the same descriptors always decode to the same
# pairs — and a DML session scans the table once per STATEMENT, paying
# blob read + roaring decode + Arrow ship each time without this.
from collections import OrderedDict as _ODict  # noqa: E402

_DV_PAIRS_CACHE: "_ODict[tuple, tuple]" = _ODict()
_DV_PAIRS_CACHE_MAX = 8


def dv_pairs_df(spark: SparkSession, dv_files: list,
                path_col: str = "__fp", pos_col: str = "__pos"
                ) -> DataFrame:
    """Decode deletion-vector DataFiles (content=1,
    file_format='puffin') into a (path, pos) pair DataFrame. Small DV
    sets (≤ DV_DRIVER_DECODE_MAX_BYTES of blob bytes) decode DRIVER-
    side into one local DataFrame; larger sets ship (puffin_path,
    offset, length, referenced_file) descriptors to executors and
    expand in parallel where the anti-join needs them."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )
    descs = [(d.file_path, d.content_offset, d.content_size_in_bytes,
              d.referenced_data_file) for d in dv_files]
    schema = StructType([StructField(path_col, StringType()),
                         StructField(pos_col, LongType())])
    if not descs:
        return spark.createDataFrame([], schema)
    total = sum((sz or 0) for _p, _o, sz, _r in descs)
    if total <= DV_DRIVER_DECODE_MAX_BYTES:
        import weakref
        key = (tuple(descs), path_col, pos_col)
        ent = _DV_PAIRS_CACHE.get(key)
        if ent is not None and ent[0]() is spark:
            _DV_PAIRS_CACHE.move_to_end(key)
            return ent[1]
        from iceberg_rust_archive_spark.object_store import store_for
        from iceberg_rust_archive_spark.sources.roaring import (
            deserialize_positions,
        )
        pairs = set()
        for path, off, ln, ref in descs:
            blob = store_for(path).read_bytes(path)[off:off + ln]
            pairs.update((ref, p) for p in deserialize_positions(blob))
        # Arrow-path createDataFrame: a row-list pays per-row schema
        # verification + py4j pickling (~0.6s per 34k pairs, ON EVERY
        # statement that scans the table); a pandas frame ships one
        # Arrow batch
        import pandas as pd
        rows = sorted(pairs)
        pdf = pd.DataFrame({
            path_col: pd.array([r[0] for r in rows], dtype=object),
            pos_col: pd.array([r[1] for r in rows], dtype="int64")})
        df = spark.createDataFrame(pdf, schema)
        _DV_PAIRS_CACHE[key] = (weakref.ref(spark), df)
        while len(_DV_PAIRS_CACHE) > _DV_PAIRS_CACHE_MAX:
            _DV_PAIRS_CACHE.popitem(last=False)
        return df

    def decode(it):
        from iceberg_rust_archive_spark.object_store import store_for
        from iceberg_rust_archive_spark.sources.roaring import (
            deserialize_positions,
        )
        for path, off, ln, ref in it:
            blob = store_for(path).read_bytes(path)[off:off + ln]
            for p in deserialize_positions(blob):
                yield (ref, p)

    sc = spark.sparkContext
    rdd = sc.parallelize(descs, max(1, min(len(descs),
                                           sc.defaultParallelism))) \
        .mapPartitions(decode)
    return spark.createDataFrame(rdd, schema)


def plan_mode_used(md, mlist) -> str:
    """'local' or 'distributed' — the read.plan-mode property, with
    auto resolving by surviving-manifest count."""
    mode = str(md.properties.get("read.plan-mode", "auto")).lower()
    if mode in ("local", "distributed"):
        return mode
    min_m = int(md.properties.get(
        "read.plan.distributed-min-manifests",
        DISTRIBUTED_PLAN_MIN_MANIFESTS))
    return "distributed" if len(mlist) >= min_m else "local"


def plan_manifest_entries(spark, md, mlist, preds, schema, start_seq):
    """Read surviving manifests and prune data files, returning
    ``(data: [(entry, spec_id)], eq_deletes: [entry], pos_deletes:
    [entry])``.

    Two physical strategies behind one contract (gated by the
    ``read.plan-mode`` table property: ``auto``/``local``/
    ``distributed``):

    - **local** — concurrent driver-side fetch (the reference's
      unordered stream, iceberg-rust/src/table/mod.rs:313-356) plus a
      Python pruning loop. Right up to a few dozen manifests.
    - **distributed** — one Spark job over the manifest paths: each
      task parses its manifests and prunes with that manifest's own
      partition spec, shipping back only SURVIVING entries with their
      column bounds stripped (bounds exist to be pruned on; once a
      file survives they are dead weight on the wire). At 100 TB —
      thousands of manifests, millions of file rows — planning cost
      becomes one parallel metadata job instead of a driver loop, and
      driver traffic is proportional to the PRUNED file list (which
      the driver needs anyway to build the parquet relation).

    Delete files are never pruned (every delete must apply — A5).
    """
    mode = plan_mode_used(md, mlist)

    specs = dict(md.partition_specs)
    default_spec = md.default_spec()

    if mode == "distributed" and mlist:
        tasks = [(m.manifest_path, m.partition_spec_id) for m in mlist]
        sc = spark.sparkContext
        n_slices = max(1, min(len(tasks), sc.defaultParallelism * 2))

        def plan_part(it):
            from dataclasses import replace as _dc_replace

            from iceberg_rust_archive_spark.predicates import (
                prune_datafiles as _prune,
            )
            from iceberg_rust_archive_spark.sources.manifests import (
                read_manifest as _read,
            )
            for path, sid in it:
                sp = specs.get(sid, default_spec)
                entries = list(_entry_filter(_read(path), start_seq))
                data = [e for e in entries
                        if e.data_file.content == CONTENT_DATA]
                kept_files = set(id(f) for f in _prune(
                    preds, schema, [e.data_file for e in data], sp))
                for e in entries:
                    c = e.data_file.content
                    if c == CONTENT_DATA:
                        if id(e.data_file) in kept_files:
                            slim = _dc_replace(e.data_file,
                                               lower_bounds={},
                                               upper_bounds={})
                            yield ("d", sid, _dc_replace(e, data_file=slim))
                    elif c == CONTENT_EQUALITY_DELETES:
                        yield ("e", sid, e)
                    elif c == CONTENT_POSITION_DELETES:
                        yield ("p", sid, e)

        rows = sc.parallelize(tasks, n_slices).mapPartitions(
            plan_part).collect()
        data = [(e, sid) for kind, sid, e in rows if kind == "d"]
        eq = [e for kind, _sid, e in rows if kind == "e"]
        pos = [e for kind, _sid, e in rows if kind == "p"]
        return data, eq, pos

    # local: concurrent fetch, then prune grouped by originating spec so
    # partition-value checks use the right transform per file (A3)
    data_pairs, eq, pos = [], [], []
    all_entries = read_manifests([m.manifest_path for m in mlist])
    for mle, mentries in zip(mlist, all_entries):
        for e in _entry_filter(mentries, start_seq):
            if e.data_file.content == CONTENT_DATA:
                data_pairs.append((e, mle.partition_spec_id))
            elif e.data_file.content == CONTENT_EQUALITY_DELETES:
                eq.append(e)
            elif e.data_file.content == CONTENT_POSITION_DELETES:
                pos.append(e)
    kept = set()
    by_spec: dict[int, list] = defaultdict(list)
    for e, sid in data_pairs:
        by_spec[sid].append(e)
    for sid, entries in by_spec.items():
        sp = specs.get(sid, default_spec)
        kept |= set(id(f) for f in prune_datafiles(
            preds, schema, [e.data_file for e in entries], sp))
    data = [(e, sid) for e, sid in data_pairs if id(e.data_file) in kept]
    return data, eq, pos


def _resolve_entries(md: TableMetadata, branch, snapshot_id, as_of_ms,
                     from_snapshot_id):
    """Snapshot-range resolution incl. incremental reads (A4:
    table/mod.rs:200-234 — keep entries with start_seq < seq ≤ end_seq)."""
    if snapshot_id is not None:
        snap = md.snapshot_by_id(snapshot_id)
    elif as_of_ms is not None:
        snap = md.snapshot_as_of_ms(as_of_ms)
    else:
        snap = md.current_snapshot(branch)
    if snap is None:
        return None, [], 0, None
    start_seq = -1
    if from_snapshot_id is not None:
        start = md.snapshot_by_id(from_snapshot_id)
        if start is not None:
            start_seq = start.sequence_number
            # a replace commit in the range rewrites ALL files at a new
            # sequence number — an incremental read would re-emit the
            # whole table as "new rows". Refuse loudly (Iceberg's
            # incremental scan contract for overwrite snapshots);
            # consumers resync from a full scan.
            s_ = snap
            while s_ is not None and s_.sequence_number > start_seq:
                if (s_.summary or {}).get("operation") == "replace":
                    from iceberg_rust_archive_spark.sources.manifests \
                        import replace_touches_data
                    if replace_touches_data(s_):
                        raise ValueError(
                            f"incremental read range spans a replace "
                            f"commit (snapshot {s_.snapshot_id}); rows "
                            "cannot be attributed — resync from a full "
                            "scan")
                    # delete-file-only rewrite: data files carry over
                    # as EXISTING entries at their ORIGINAL sequence
                    # numbers, so the seq-range filter below still
                    # yields exactly the appended rows — safe to span
                s_ = (md.snapshots.get(s_.parent_snapshot_id)
                      if s_.parent_snapshot_id is not None else None)
    mlist = read_manifest_list(snap.manifest_list)
    if start_seq >= 0:
        mlist = [m for m in mlist if m.sequence_number > start_seq]
    return snap, mlist, start_seq, snap.schema_id


# tables already warned about this process (one line per table, not
# per scan) — keyed by table uuid
_TRANSFORM_SPACE_WARNED: set = set()
_TRANSFORM_SPACE_PROP = "engine.transform-space"


def _guard_transform_space(md: TableMetadata, schema, preds):
    """Legacy-ordinal guard for month/bucket partition pruning (r15
    ADVICE). r14 aligned both transforms to the Iceberg spec's ordinal
    space (month = months-since-1970-01; bucket = sign-masked murmur3
    over the 8-byte-LE widening); a durable table written by a pre-r14
    build — or by the reference, values.rs:112,362 and 857-861 — holds
    ordinals from a DIFFERENT space that are indistinguishable ints,
    and exact pruning against them silently loses rows.

    Policy, keyed on the ``engine.transform-space`` table property
    stamped at create time:
    - ``spec``: prune normally (every table this engine creates).
    - ``legacy-reference``: predicates over month/bucket source
      columns turn ``no_prune`` — files are read and the residual
      filter applies, trading pruning for correctness.
    - unstamped + month/bucket fields in any spec: assume spec space
      (pyiceberg/Java/Trino tables are unstamped and conformant) but
      warn ONCE per table so an adopted pre-r14 table is a visible
      decision, not a silent lost-rows hazard."""
    if not preds:
        return preds
    risky = {pf.source_id for sp in md.partition_specs.values()
             for pf in sp.fields
             if pf.transform == "month"
             or pf.transform.startswith("bucket")}
    if not risky:
        return preds
    stamp = (md.properties or {}).get(_TRANSFORM_SPACE_PROP)
    if stamp == "spec":
        return preds
    names = {f.name for i in risky
             if (f := schema.field_by_id(i)) is not None}
    if stamp == "legacy-reference":
        return [Pred(p.column, p.op, p.value, True)
                if p.column in names else p for p in preds]
    # warn-once key: table_uuid, else location — NOT id(md), which
    # CPython recycles after GC (either suppressing the warning for a
    # different table or re-warning the same one; r15 verdict #3)
    key = getattr(md, "table_uuid", None) or md.location
    if key not in _TRANSFORM_SPACE_WARNED and any(
            p.column in names for p in preds):
        _TRANSFORM_SPACE_WARNED.add(key)
        import warnings
        warnings.warn(
            f"table {md.location} has month/bucket partition fields but "
            f"no '{_TRANSFORM_SPACE_PROP}' property; assuming "
            "spec-space ordinals for pruning. If this table was written "
            "by a pre-r14 build of this engine (or by "
            "JanKaul/iceberg-rust), run ALTER TABLE <name> SET "
            f"TBLPROPERTIES ('{_TRANSFORM_SPACE_PROP}'="
            "'legacy-reference') to disable exact month/bucket pruning, "
            "or set it to 'spec' to silence this warning.",
            stacklevel=3)
    return preds


def scan(spark: SparkSession, md: TableMetadata,
         filter: list[Pred] | None = None,     # noqa: A002
         columns: list[str] | None = None,
         branch: str | None = None, snapshot_id: int | None = None,
         as_of_ms: int | None = None,
         from_snapshot_id: int | None = None,
         report: dict | None = None,
         expose_pos: bool = False,
         with_row_id: bool = False,
         file_subset: set | None = None) -> DataFrame:
    """``report``, when passed, is filled in place with planning
    metrics (the reference's ScanMetrics role): manifest/file counts
    before and after each pruning level, bytes planned, delete-file
    counts, and the plan mode — the numbers that tell an operator
    whether a 100 TB query will touch 40 files or 40,000 BEFORE any
    Spark job runs.

    ``expose_pos`` keeps the ``__fp``/``__pos`` physical-address helper
    columns (normalized file path + parquet row ordinal) in the output
    instead of dropping them after the pos-delete anti-join. Used by
    ``Table.delete_where_pos`` so the hit set is computed over the full
    merge-on-read resolution — a row already killed by a live equality
    or position delete can never produce a fresh (path, pos) pair.

    ``with_row_id`` materializes the v3 row-lineage ``_row_id`` column
    (spec §Row Lineage): each data file's assigned first-row-id plus
    the row's ordinal. Scale shape: a two-column (path, base) relation
    — one row per planned FILE, not per data row — broadcast-joined on
    the normalized path, so the add costs one broadcast hash join and
    zero shuffles. Files with no assigned lineage (written before the
    table reached v3) yield NULL."""
    from iceberg_rust_archive_spark.session import ensure_read_confs
    ensure_read_confs(spark)  # field-id resolution on any caller's session
    preds = filter or []
    snap, mlist, start_seq, schema_id = _resolve_entries(
        md, branch, snapshot_id, as_of_ms, from_snapshot_id)
    schema = md.schemas.get(schema_id, md.schemas[md.current_schema_id]) \
        if schema_id is not None else md.schemas[md.current_schema_id]
    spark_schema = spark_schema_for(schema.struct)
    spec = md.default_spec()
    # Naive timestamp literals on timestamptz columns mean SESSION-zone
    # wall time (Spark's own parser semantics); localize them to UTC
    # instants once so pruning and the residual agree with Spark under
    # any session timezone (see localize_naive_tstz).
    preds = localize_naive_tstz(
        preds, schema,
        spark.conf.get("spark.sql.session.timeZone", "UTC") or "UTC")
    preds = _guard_transform_space(md, schema, preds)

    if report is not None:
        report.clear()
        report.update({
            "snapshot_id": snap.snapshot_id if snap else None,
            "manifests_total": len(mlist), "manifests_pruned": 0,
            "data_files_planned": 0, "data_bytes_planned": 0,
            "equality_delete_files": 0, "position_delete_files": 0,
            "plan_mode": None})

    if snap is None:
        df = spark.createDataFrame([], spark_schema)
        if with_row_id:
            from pyspark.sql.types import LongType
            df = (df.withColumn("_row_id", F.lit(None).cast(LongType()))
                    .withColumn("_last_updated_sequence_number",
                                F.lit(None).cast(LongType())))
        return df.select(*columns) if columns else df

    # A2: partition-level pruning over manifest-list rows, each manifest
    # under the spec it was WRITTEN with — after spec evolution old
    # manifests carry old-layout summaries (partition.rs: specs are
    # id-addressed precisely so readers resolve per-manifest)
    def spec_of(mle):
        return md.partition_specs.get(mle.partition_spec_id, spec)
    n_manifests = len(mlist)
    mlist = [m for m in mlist
             if m in prune_manifests(preds, spec_of(m), schema, [m])]

    # A3: manifest read + file-level pruning (data files only; deletes
    # must all apply) — executor-side above the manifest-count gate
    planned, delete_entries, pos_delete_entries = plan_manifest_entries(
        spark, md, mlist, preds, schema, start_seq)
    data_entries = [e for e, _sid in planned]
    if file_subset is not None:
        # restrict to an explicit file list (maintenance's partition-
        # scoped compaction reads WHOLE files post-merge-on-read, so no
        # row-level residual may apply — callers pass no preds); the
        # full delete set still applies: out-of-scope deletes are
        # partition-disjoint no-ops, in-scope ones resolve the rows
        data_entries = [e for e in data_entries
                        if e.data_file.file_path in file_subset]

    if report is not None:
        report.update({
            "manifests_pruned": n_manifests - len(mlist),
            "data_files_planned": len(data_entries),
            "data_bytes_planned": sum(
                e.data_file.file_size_in_bytes or 0 for e in data_entries),
            "equality_delete_files": len(delete_entries),
            "position_delete_files": len(pos_delete_entries),
            "plan_mode": plan_mode_used(md, mlist)})

    if from_snapshot_id is not None:
        delete_entries = []  # incremental append reads new data only (A22)
        pos_delete_entries = []

    # Position deletes (content=1) name exact (file_path, ordinal) pairs,
    # so one global anti-join applies them: a path written after the
    # delete can never match, which encodes the sequence rule for free.
    # The reference PANICS on this content type (datafusion_iceberg/src/
    # table.rs:422-425); Spark's _metadata.row_index virtual column makes
    # merge-on-read natural, so we support it as a parity superset.
    # __fp/__pos also carry the equality-delete sequence tags (the
    # per-file broadcast attach below joins on the normalized path);
    # ORC files have no _metadata.row_index, so mixed/ORC tables tag
    # sequence groups with literals instead
    # Single-stratum fast path (the common post-compaction state,
    # reference's simple case table.rs:631-641): every delete file
    # shares ONE sequence number and none is partition-scoped. Then
    # every affected data file (seq < that number, by construction)
    # satisfies the sequence residual vacuously and no scope residual
    # exists — the whole tag machinery (per-file __dseq attach, pk
    # literals, residual join conditions) collapses to a plain
    # null-safe left_anti per equality-column set, and the scan never
    # needs _metadata.row_index for tag-carrying purposes.
    eq_single_stratum = bool(delete_entries) and len(
        {e.sequence_number or 0 for e in delete_entries}) == 1 \
        and all(all(v is None for v in e.data_file.partition.values())
                for e in delete_entries)
    eq_tags_via_fp = bool(delete_entries) and not eq_single_stratum \
        and all(
            (e.data_file.file_format or "parquet").lower() == "parquet"
            for e in data_entries)
    has_pos = bool(pos_delete_entries) or expose_pos or with_row_id \
        or eq_tags_via_fp

    # tables holding add_files-registered external files (no embedded
    # field ids) carry the name-mapping property → resolve BY NAME
    by_name = "schema.name-mapping.default" in md.properties

    # Equality-delete ids DROPPED from the scan schema: a dropped
    # column must not un-apply a delete (silent row resurrection), and
    # resolving only the still-present subset of a delete's eq set
    # would over-delete. Recover each missing field from the newest
    # historical schema still carrying it (metadata retains every
    # schema) and read it back as a hidden ``__hist_<fid>`` column —
    # parquet field-id resolution matches it in files written before
    # the drop; later files yield NULL, which the sequence residual
    # (data seq < delete seq) already excludes.
    hist_fields: dict[int, object] = {}
    if delete_entries:
        present = {f.field_id for f in schema.fields}
        missing: set[int] = set()
        for _de in delete_entries:
            missing |= set(_de.data_file.equality_ids or ()) - present
        for fid in sorted(missing):
            for s_ in sorted(md.schemas.values(),
                             key=lambda s: -s.schema_id):
                f_ = s_.field_by_id(fid)
                if f_ is not None:
                    hist_fields[fid] = _dc.replace(
                        f_, name=f"__hist_{fid}", required=False)
                    break
            else:
                raise ValueError(
                    f"equality delete references field id {fid} not "
                    f"found in any schema of the table metadata")
    if hist_fields and by_name:
        # name-mapping tables resolve columns BY NAME (add_files-
        # registered files carry no embedded field ids), so the
        # __hist_<fid> helper column can never match any file — the
        # delete would silently stop applying and rows would
        # resurrect. Refuse loudly (commit-side _check_orc_evolution
        # blocks creating this state; this guards tables that already
        # carry it).
        raise ValueError(
            f"cannot scan: equality delete(s) reference dropped field "
            f"id(s) {sorted(hist_fields)} but this table carries "
            "schema.name-mapping.default (reads resolve by NAME, so "
            "the dropped column cannot be recovered by field id) — "
            "compact the merge-on-read debt first")
    if hist_fields:
        spark_schema = spark_schema_for(StructTypeSpec(
            tuple(schema.fields) + tuple(hist_fields.values())))

    # v3 initial-defaults: fields added with DEFAULT fill rows from
    # files that PREDATE the column. A file "has" the field iff its
    # harvested per-column stats know the field id (our writer records
    # stats for every schema column, so absence == written before the
    # column existed) — an explicit NULL stored after the ADD COLUMN is
    # preserved, which a blanket coalesce would destroy.
    dflt_fields = [(f.name, f.field_id, f.initial_default, f.field_type)
                   for f in schema.fields
                   if getattr(f, "initial_default", None) is not None]

    def read_data(entries: list) -> DataFrame:
        # format-aware (DataFile.file_format — parquet/ORC may mix after
        # a write.format.default flip); __fp normalizes file:///p -> /p
        # to match DataFile.file_path form when pos-deletes are in play
        def _read(es):
            return read_data_files(
                spark, spark_schema,
                [(e.data_file.file_path, e.data_file.file_format)
                 for e in es], with_pos=has_pos, by_name=by_name)
        if not dflt_fields:
            return _read(entries)
        groups: dict[frozenset, list] = defaultdict(list)
        for e in entries:
            known = set((e.data_file.value_counts or {})) \
                | set((e.data_file.null_value_counts or {}))
            absent = frozenset(
                name for name, fid, _d, _t in dflt_fields
                if known and fid not in known)
            groups[absent].append(e)
        parts = []
        for absent, es in groups.items():
            d = _read(es)
            for name, _fid, dv, ftype in dflt_fields:
                if name in absent:
                    d = d.withColumn(
                        name, F.lit(dv).cast(
                            spark_schema[name].dataType))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def apply_pos_deletes(d: DataFrame) -> DataFrame:
        """Anti-join the (file_path, pos) delete pairs, drop helpers.
        Pairs come from parquet position-delete files AND deletion
        vectors (v3 bitmaps, decoded executor-side) — unioned, deduped,
        one anti-join.

        Broadcast only while the delete set is provably small (sum of
        delete-file bytes ≤ 64 MB); a bulk-deleted 100 TB table falls
        back to a shuffle anti-join, which scales with the delete set."""
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )
        pd_schema = StructType([StructField("file_path", StringType()),
                                StructField("pos", LongType())])
        pq_entries = [e for e in pos_delete_entries
                      if (e.data_file.file_format or "").lower()
                      != "puffin"]
        dv_entries = [e for e in pos_delete_entries
                      if (e.data_file.file_format or "").lower()
                      == "puffin"]
        parts = []
        if pq_entries:
            pd_paths = [e.data_file.file_path for e in pq_entries]
            parts.append(
                spark.read.schema(pd_schema).parquet(*pd_paths)
                .select(F.regexp_replace("file_path", "^file:/+", "/")
                        .alias("__fp"),
                        F.col("pos").alias("__pos")))
        if dv_entries:
            parts.append(dv_pairs_df(
                spark, [e.data_file for e in dv_entries]))
        pairs = parts[0]
        for p in parts[1:]:
            pairs = pairs.unionByName(p)
        del_bytes = sum(e.data_file.file_size_in_bytes or 0
                        for e in pos_delete_entries)
        if del_bytes <= 64 * 1024 * 1024:
            # no dedup on the broadcast path: an anti-join's result is
            # unaffected by duplicate build rows, and the dropDuplicates
            # aggregate costs a shuffle that Catalyst REPLICATES into
            # every union branch when it pushes the anti-join down
            # (measured 3× per multi-stratum MoR scan). Overlap bloat
            # is bounded by the ≤64 MB gate.
            pairs = F.broadcast(pairs)
        else:
            # large sets shuffle-anti-join; dedup first so the shuffle
            # carries each killed (file, pos) once
            pairs = pairs.dropDuplicates(["__fp", "__pos"])
        d = d.join(pairs, on=["__fp", "__pos"], how="left_anti")
        return d if (expose_pos or with_row_id) \
            else d.drop("__fp", "__pos")

    # A5: equality-delete merge-on-read as ONE sequence-tagged pass.
    # (Formerly a union of per-stratum join chains: plan size was
    # O(strata × partitions), so a table carrying 100 DML commits of
    # delete debt built a 100-branch join-laden union. Now it plans 2
    # union branches — files old enough to be affected, files newer
    # than every delete — plus ONE anti-join per distinct
    # equality-column set, whatever the commit history.)
    #
    # Semantics preserved exactly (table.rs:498-531): an equality
    # delete at sequence s kills rows of data files with sequence < s
    # (strictly earlier), scoped to the delete file's partition tuple
    # unless that tuple is all-NULL. NOTE the all-None tuple: the Avro
    # manifest's r102 record is typed from the table spec, so a
    # partition-LESS delete file ({} at write time) reads back as
    # {field: None, ...} — treat it as global; the writer
    # (sources/write.py) only scopes a delete when the partition
    # source is among the equality columns, so an all-None scoped
    # delete would restrict to null-source rows via the null-safe
    # join anyway, and global application is the same row set.
    def pkey(e):
        return json.dumps(e.data_file.partition, sort_keys=True, default=str)

    # partition-field names whose tuple value is the raw string (identity/
    # truncate on a string source) — the carriers of the pre-r16
    # __HIVE_DEFAULT_PARTITION__ conflation (see sources/write.py
    # _EMPTY_MARKER): data files written before the fix hold their
    # empty-string rows under a NULL tuple
    _str_part_names = {
        pf.name
        for sp in md.partition_specs.values()
        for pf in sp.fields
        if (pf.transform == "identity"
            or pf.transform.startswith("truncate"))
        and getattr(schema.field_by_id(pf.source_id),
                    "field_type", None) == "string"
    }

    def _is_global(e):
        part = e.data_file.partition
        if all(v is None for v in part.values()):
            return True
        # r16: a delete scoped to an EMPTY-STRING tuple (or to the
        # literal default-partition string, conflated the same way)
        # applies globally — a pre-r16 data file keeps those rows
        # under a NULL tuple, so the scope residual would skip the
        # file and the delete would silently un-apply (no rescue:
        # deletes are semantics, not pruning). Scope itself IS only
        # pruning — the null-safe key anti-join does the row
        # matching — so widening to global is always sound.
        return any(v in ("", "__HIVE_DEFAULT_PARTITION__")
                   and k in _str_part_names
                   for k, v in part.items())

    parts: list[DataFrame] = []
    if not delete_entries:
        if data_entries:
            parts.append(read_data(data_entries))
    else:
        import re as _re2
        max_del_seq = max(e.sequence_number or 0 for e in delete_entries)
        affected = [e for e in data_entries
                    if (e.sequence_number or 0) < max_del_seq]
        clear = [e for e in data_entries
                 if (e.sequence_number or 0) >= max_del_seq]
        any_scoped = any(not _is_global(e) for e in delete_entries)
        if affected and eq_single_stratum:
            # fast path: one distinct delete sequence, all global —
            # the sequence residual (data seq < delete seq) is TRUE
            # for every affected file and there is no scope residual,
            # so each equality-column set applies as one plain
            # null-safe anti-join with no tag columns at all.
            d = read_data(affected)
            by_eq: dict[tuple, list] = defaultdict(list)
            for de in delete_entries:
                by_eq[tuple(de.data_file.equality_ids or ())].append(de)
            for eq_ids, des in by_eq.items():
                eq_fields = [schema.field_by_id(i) or hist_fields[i]
                             for i in eq_ids]
                eq_names = [f.name for f in eq_fields]
                if not eq_names:
                    continue
                del_schema = spark_schema_for(
                    StructTypeSpec(tuple(eq_fields)))
                del_df = read_data_files(
                    spark, del_schema,
                    [(g.data_file.file_path, g.data_file.file_format)
                     for g in des]
                ).select(*[F.col(c).alias(f"__del_{c}")
                           for c in eq_names])
                if sum(g.data_file.file_size_in_bytes or 0
                       for g in des) <= 64 * 1024 * 1024:
                    del_df = F.broadcast(del_df)
                cond = F.col(eq_names[0]).eqNullSafe(
                    F.col(f"__del_{eq_names[0]}"))
                for c in eq_names[1:]:
                    cond = cond & F.col(c).eqNullSafe(
                        F.col(f"__del_{c}"))
                d = d.join(del_df, on=cond, how="left_anti")
            parts.append(d)
            affected = []  # handled; fall through to `clear` below
        # per-file (sequence, partition-key) tags keyed by normalized
        # path; a path planned twice with CONFLICTING tags (same file
        # registered under two entries) would fan rows out through the
        # tag join, so that degenerate case takes the lit-tag branch
        tag_map: dict[str, tuple] = {}
        tag_conflict = False
        for e in affected:
            fp = _re2.sub(r"^file:/+", "/", e.data_file.file_path)
            val = (e.sequence_number or 0,
                   pkey(e) if any_scoped else None)
            if tag_map.setdefault(fp, val) != val:
                tag_conflict = True
        if affected:
            if eq_tags_via_fp and not tag_conflict:
                d = read_data(affected)
                # tags attach via ONE broadcast hash join on the
                # normalized path — one row per planned FILE, never
                # per data row (the same shape as the v3 row-lineage
                # attach below). Bounded by the planned-file count
                # under live delete debt, which compaction keeps far
                # below broadcast limits.
                from pyspark.sql.types import (
                    LongType, StringType, StructField, StructType,
                )
                tag_fields = [StructField("__fp", StringType()),
                              StructField("__dseq", LongType())]
                if any_scoped:
                    tag_fields.append(StructField("__pk", StringType()))
                tag_rows = [
                    (fp, seq, pk) if any_scoped else (fp, seq)
                    for fp, (seq, pk) in tag_map.items()]
                tags = spark.createDataFrame(tag_rows,
                                             StructType(tag_fields))
                d = d.join(F.broadcast(tags), on="__fp", how="inner")
            else:
                # ORC/mixed formats: one lit-tagged relation per
                # distinct (sequence, partition) group — branch count
                # bounded by distinct delete-relevant groups
                grp: dict[tuple, list] = defaultdict(list)
                for e in affected:
                    grp[((e.sequence_number or 0),
                         pkey(e) if any_scoped else None)].append(e)
                subparts = []
                for (dseq, pk), es in grp.items():
                    r = read_data(es).withColumn("__dseq", F.lit(dseq))
                    if any_scoped:
                        r = r.withColumn("__pk",
                                         F.lit(pk).cast("string"))
                    subparts.append(r)
                d = subparts[0]
                for r in subparts[1:]:
                    d = d.unionByName(r)

            # one anti-join per distinct equality-id set: the build
            # side unions that set's delete files, each tagged with
            # its own (sequence, scope). eqNullSafe keys keep it an
            # equi hash join — Iceberg equality deletes compare with
            # *null-safe* equality (a NULL in the delete row matches a
            # NULL in the data row), so a plain ``on=names`` anti-join
            # would silently keep matched rows containing NULLs — and
            # the sequence/scope comparisons ride along as residual
            # join conditions. Broadcast only provably-small delete
            # sets (the reference forces CollectLeft likewise,
            # table.rs:631-641); a bulk delete falls back to a shuffle
            # anti-join that scales with the delete set.
            by_eq: dict[tuple, list] = defaultdict(list)
            for de in delete_entries:
                by_eq[tuple(de.data_file.equality_ids or ())].append(de)
            for eq_ids, des in by_eq.items():
                # present fields keep their scan-schema name; dropped
                # ones resolve to the __hist_<fid> helper read above
                eq_fields = [schema.field_by_id(i) or hist_fields[i]
                             for i in eq_ids]
                eq_names = [f.name for f in eq_fields]
                if not eq_names:
                    continue
                del_schema = spark_schema_for(
                    StructTypeSpec(tuple(eq_fields)))
                del_groups: dict[tuple, list] = defaultdict(list)
                for de in des:
                    scope = None if _is_global(de) else pkey(de)
                    del_groups[(de.sequence_number or 0, scope)].append(de)
                rels = []
                for (dseq, scope), dgrp in del_groups.items():
                    r = read_data_files(
                        spark, del_schema,
                        [(g.data_file.file_path, g.data_file.file_format)
                         for g in dgrp]
                    ).select(*[F.col(c).alias(f"__del_{c}")
                               for c in eq_names])
                    r = r.withColumn("__del_seq", F.lit(dseq))
                    if any_scoped:
                        r = r.withColumn("__del_pk",
                                         F.lit(scope).cast("string"))
                    rels.append(r)
                del_df = rels[0]
                for r in rels[1:]:
                    del_df = del_df.unionByName(r)
                if sum(g.data_file.file_size_in_bytes or 0
                       for g in des) <= 64 * 1024 * 1024:
                    del_df = F.broadcast(del_df)
                cond = F.col("__dseq") < F.col("__del_seq")
                if any_scoped:
                    cond = cond & (F.col("__del_pk").isNull()
                                   | (F.col("__del_pk") == F.col("__pk")))
                for c in eq_names:
                    cond = cond & F.col(c).eqNullSafe(F.col(f"__del_{c}"))
                d = d.join(del_df, on=cond, how="left_anti")
            d = d.drop("__dseq", "__pk") if any_scoped \
                else d.drop("__dseq")
            parts.append(d)
        if clear:
            parts.append(read_data(clear))

    if not parts:
        df = spark.createDataFrame([], spark_schema)
        if expose_pos or with_row_id:
            from pyspark.sql.types import LongType, StringType
            df = (df.withColumn("__fp", F.lit(None).cast(StringType()))
                    .withColumn("__pos", F.lit(None).cast(LongType())))
    else:
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if pos_delete_entries:
            df = apply_pos_deletes(df)
        elif has_pos and not (expose_pos or with_row_id):
            # __fp/__pos existed only to carry the sequence tags
            df = df.drop("__fp", "__pos")
    if hist_fields:
        df = df.drop(*[f.name for f in hist_fields.values()])

    if with_row_id:
        # v3 row lineage: one (path, first-row-id, data-sequence) row
        # per planned file, broadcast onto the data by normalized path
        # — _row_id = base + ordinal (NULL base → NULL), and
        # _last_updated_sequence_number is the file's data sequence
        # number (rows are immutable within a file; row-modifying
        # operations write NEW files, so the file's sequence IS the
        # row's last update)
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )
        import re as _re
        base_rows = [(_re.sub(r"^file:/+", "/",
                              e.data_file.file_path),
                      e.data_file.first_row_id,
                      e.sequence_number)
                     for e in data_entries]
        base_df = spark.createDataFrame(
            base_rows, StructType([
                StructField("__fp", StringType()),
                StructField("__rid_base", LongType()),
                StructField("__file_seq", LongType())]))
        df = (df.join(F.broadcast(base_df), on="__fp", how="left")
                .withColumn("_row_id",
                            F.col("__rid_base") + F.col("__pos"))
                .withColumnRenamed("__file_seq",
                                   "_last_updated_sequence_number")
                .drop("__rid_base"))
        if not expose_pos:
            df = df.drop("__fp", "__pos")

    residual = to_spark_filter(preds)
    if residual is not None:
        df = df.filter(residual)
    if columns:
        extra = (["__fp", "__pos"] if expose_pos else []) \
            + (["_row_id", "_last_updated_sequence_number"]
               if with_row_id else [])
        df = df.select(*(list(columns) + extra) if extra else columns)

    # A9→planner: feed harvested manifest statistics into Spark's join
    # planning the way the reference's TableProvider::statistics feeds
    # DataFusion's CBO (datafusion_iceberg/src/statistics.rs:20-146).
    # Spark can't see through a MoR anti-join chain to size the table
    # until AQE observes the first shuffle, so a provably-small
    # post-pruning scan REPORTS broadcastability; the consumer that
    # can see a join (engine._run_select) attaches the hint there.
    # Attaching it here looked free but was not: Catalyst strips an
    # unapplied hint with a HintErrorLogger warning, so every
    # single-table scan polluted the logs and buried real hint
    # failures (r14 verdict #3).
    total_bytes = sum(e.data_file.file_size_in_bytes or 0
                      for e in data_entries)
    thr = _broadcast_threshold(spark)
    if 0 < total_bytes <= thr or (thr > 0 and not data_entries):
        if report is not None:
            report["broadcastable"] = True
        # also tagged on the DataFrame object itself so join-aware
        # consumers without a report in hand (plans/mv.py bind_and_run)
        # can attach the hint — a plain Python attribute, invisible to
        # Spark
        df._ice_broadcastable = True
    return df


def broadcast_if_small(df: DataFrame) -> DataFrame:
    """Attach a broadcast hint iff ``scan`` proved this frame small —
    the PUBLIC seam of the ``_ice_broadcastable`` tag (and of
    ``report['broadcastable']``) for direct ``Table.scan()`` API
    consumers who join a small merge-on-read scan themselves: Spark's
    own size estimate cannot see through the MoR anti-join chain until
    AQE observes the first shuffle, so without the tag a provably-tiny
    dimension table plans a sort-merge join. Apply it only to a frame
    that will actually feed a join — Catalyst strips an unapplied hint
    with a HintErrorLogger warning on every run. No-op on frames the
    planner could not prove small."""
    if getattr(df, "_ice_broadcastable", False):
        return F.broadcast(df)
    return df


def _broadcast_threshold(spark: SparkSession) -> int:
    """spark.sql.autoBroadcastJoinThreshold in bytes (-1 = disabled)."""
    raw = str(spark.conf.get(
        "spark.sql.autoBroadcastJoinThreshold", "10485760")).strip().lower()
    mult = 1
    for suf, m in (("kb", 1024), ("mb", 1024**2), ("gb", 1024**3),
                   ("tb", 1024**4), ("k", 1024), ("m", 1024**2),
                   ("g", 1024**3), ("t", 1024**4), ("b", 1)):
        if raw.endswith(suf):
            raw, mult = raw[:-len(suf)], m
            break
    try:
        return int(float(raw)) * mult
    except ValueError:
        return 10 * 1024 * 1024
