"""Structured Streaming SOURCE over an Iceberg table (PySpark 4
Python DataSource API): ``spark.readStream.format("iceberg-archive")``
with **snapshot ids as streaming offsets**, so checkpoint recovery and
exactly-once replay fall out of Iceberg's immutable-snapshot model —
``partitions(start, end)`` replans the SAME file list for the same
offset pair no matter when it runs (the property the reference's
incremental read machinery provides to its MV refresh loop,
datafusion_iceberg/src/materialized_view/mod.rs:216-368; offset
semantics mirror Iceberg's own Spark streaming source).

Usage::

    spark.dataSource.register(IcebergStreamSource)
    df = (spark.readStream.format("iceberg-archive")
          .option("catalog_root", "/warehouse")     # FileCatalog root
          .option("identifier", "db.events")
          .load())
    df.writeStream.option("checkpointLocation", ckpt)...

Options:

- ``catalog_root`` + ``identifier`` — the FileCatalog pointer to
  follow (each micro-batch re-reads it, so the stream tracks new
  commits);
- ``starting_snapshot_id`` — EXCLUSIVE lower bound for the first
  batch; default ``-1`` streams the full table history first.
  Pass the current snapshot id for a "new data only" stream.
- ``initial_delete_gate_bytes`` — plan-time cap on the total delete-
  file bytes the initial merge-on-read batch may materialize on the
  driver (default 64 MB, the batch scan's broadcast bound); an
  oversize set fails loudly with a resync-via-``Table.scan`` message
  instead of OOMing the driver.

Scale shape: planning is driver-side manifest pruning (sequence-range
A4 semantics — one manifest-list read plus the new manifests only);
each data FILE becomes one ``InputPartition`` and executors read it
with pyarrow, yielding Arrow RecordBatches straight into Spark's
columnar ingestion — no per-row Python loop.

The INITIAL batch (default ``starting_snapshot_id=-1``) is a full
snapshot read of the CURRENT manifest list: historical replace
commits (compaction, TRUNCATE, full MV refresh) don't matter because
replaced files no longer appear there, and live delete files are
resolved merge-on-read driver-side (per-file position masks +
equality rows shipped inside the partitions). INCREMENTAL ranges that
contain delete files or span a replace commit FAIL loudly (rows could
not be attributed exactly-once); consumers resync from a fresh
stream, the same contract the batch incremental read enforces.
"""

from __future__ import annotations

try:
    from pyspark.sql.datasource import (
        DataSource, DataSourceStreamReader, InputPartition,
    )
    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover — pyspark < 4
    _HAS_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options=None):
            self.options = options or {}

    class DataSourceStreamReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        pass


# Total delete-file bytes the INITIAL batch will materialize on the
# driver — the same ≤64 MB bound the batch scan uses to decide a
# delete set is broadcastable (operators/scan.py apply_pos_deletes /
# apply_eq_deletes). ENFORCED at plan time: above it the stream
# refuses loudly instead of OOMing the driver and shipping GB-scale
# row sets inside every serialized partition.
_INITIAL_DELETE_GATE_BYTES = 64 * 1024 * 1024


class _FilePartition(InputPartition):
    """One data file per Spark InputPartition. For the INITIAL batch of
    a table with live deletes, the driver resolves merge-on-read
    per-file and ships the result along: ``deleted_pos`` (sorted row
    ordinals killed by position deletes / DVs referencing this file)
    and ``eq_deletes`` (tuples of (column-names, field-ids,
    frozenset-of-row-tuples, iceberg-type-strings) from
    equality-delete files with a strictly newer sequence — applied
    with null-safe equality at the CURRENT schema's types, matching
    the batch scan's eqNullSafe anti-join over promoted columns).
    Delete sets are bounded by the ``_INITIAL_DELETE_GATE_BYTES``
    plan-time gate."""

    def __init__(self, path: str, fmt: str, deleted_pos=None,
                 eq_deletes=None):
        self.path = path
        self.fmt = fmt
        self.deleted_pos = deleted_pos
        self.eq_deletes = eq_deletes


def _read_arrow(path: str, fmt: str | None, columns: list[str]):
    """Driver-side Arrow read of one (small) delete file through the
    object-store abstraction, so memory:// and s3:// table locations
    work the same as local paths."""
    import io

    import pyarrow.parquet as pq

    from iceberg_rust_archive_spark.object_store import store_for
    buf = io.BytesIO(store_for(path).read_bytes(path))
    if (fmt or "parquet").lower() == "orc":
        from pyarrow import orc as _orc
        return _orc.ORCFile(buf).read(columns=columns)
    return pq.read_table(buf, columns=columns)


def _fid_map(arrow_schema) -> dict[int, str]:
    """Iceberg field id → PHYSICAL column name, from the parquet
    field-id metadata our writer embeds. Files without ids (ORC,
    add_files imports) yield an empty map → name fallback."""
    out: dict[int, str] = {}
    for f in arrow_schema:
        v = (f.metadata or {}).get(b"PARQUET:field_id")
        if v is not None:
            try:
                out[int(v)] = f.name
            except (TypeError, ValueError):
                pass
    return out


def _read_arrow_fid(path: str, fmt: str | None, fids, out_names):
    """Driver-side Arrow read of one (small) delete file resolving
    columns by FIELD ID from the file's own schema — rename/drop-safe
    like the batch scan's field-id reads; falls back to the requested
    name for files without embedded ids."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_rust_archive_spark.object_store import store_for
    buf = io.BytesIO(store_for(path).read_bytes(path))
    if (fmt or "parquet").lower() == "orc":
        from pyarrow import orc as _orc
        return _orc.ORCFile(buf).read(columns=list(out_names))
    schema = pq.read_schema(buf)
    fmap = _fid_map(schema)
    phys = []
    for fid, name in zip(fids, out_names):
        p = fmap.get(fid)
        if p is None and name in schema.names:
            p = name
        if p is None:
            raise ValueError(
                f"delete file {path} carries no column for field id "
                f"{fid}")
        phys.append(p)
    buf.seek(0)
    tbl = pq.read_table(buf, columns=list(dict.fromkeys(phys)))
    return pa.table({n: tbl.column(p)
                     for n, p in zip(out_names, phys)})


def _arrow_null_type(iceberg_type):
    """Arrow type for null-filling a column absent from a data file
    (added to the schema after the file was written). Nested types
    return None — callers fall back to an untyped null column."""
    import pyarrow as pa
    if not isinstance(iceberg_type, str):
        return None
    m = {"boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
         "float": pa.float32(), "double": pa.float64(),
         "date": pa.date32(), "time": pa.int64(),
         "timestamp": pa.timestamp("us"),
         "timestamptz": pa.timestamp("us", tz="UTC"),
         "string": pa.string(), "uuid": pa.string(),
         "binary": pa.binary()}
    if iceberg_type in m:
        return m[iceberg_type]
    if iceberg_type.startswith("decimal"):
        import re as _re
        g = _re.match(r"decimal\((\d+),\s*(\d+)\)", iceberg_type)
        if g:
            return pa.decimal128(int(g.group(1)), int(g.group(2)))
    return None


def _apply_deletes(batch, offset: int, partition):
    """Mask one Arrow batch with the partition's resolved deletes:
    position ordinals via a numpy range intersection, equality rows
    via an arrow-backed pandas hash-join. Merge keys stay columnar
    end-to-end — each side wraps its Arrow array in an
    ``ArrowExtensionArray`` (zero-copy), whose merge semantics equal
    the batch scan's eqNullSafe: NULL = NULL and NaN = NaN match,
    NULL ≠ NaN, int64 exact. No per-row Python conversion in either
    path. Both sides cast to the CURRENT schema's arrow type first, so
    a float→double (or int→long) promotion after the delete was
    written cannot desync a float32-written key from float64 data —
    the widening cast is value-exact on both sides, mirroring the
    batch scan's Spark-side casts. No-op (and zero-cost) for ordinary
    append-only increments."""
    if partition.deleted_pos is None and partition.eq_deletes is None:
        return batch
    import numpy as np
    import pyarrow as pa
    keep = np.ones(batch.num_rows, dtype=bool)
    if partition.deleted_pos:
        dpos = np.asarray(partition.deleted_pos, dtype=np.int64)
        local = dpos[(dpos >= offset) & (dpos < offset + batch.num_rows)]
        keep[local - offset] = False
    for names, _fids, rows, types in (partition.eq_deletes or ()):
        import pandas as pd
        sub_cols, del_cols = {}, {}
        for i, (n, it) in enumerate(zip(names, types)):
            arr = batch.column(batch.schema.get_field_index(n))
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            tgt = _arrow_null_type(it) if it else None
            if tgt is not None and arr.type != tgt:
                arr = arr.cast(tgt)
            # the delete-side values were cast to the current schema's
            # type driver-side (arrow cast, value-exact) before
            # shipping; rebuild at the same type here
            del_arr = pa.array([r[i] for r in rows],
                               type=tgt if tgt is not None else arr.type)
            sub_cols[n] = pd.arrays.ArrowExtensionArray(arr)
            del_cols[n] = pd.arrays.ArrowExtensionArray(del_arr)
        merged = pd.DataFrame(sub_cols).merge(
            pd.DataFrame(del_cols), on=list(names), how="left",
            indicator="__hit__")
        keep &= (merged["__hit__"].to_numpy() != "both")
    if keep.all():
        return batch
    return batch.filter(pa.array(keep))


def _load_metadata(options):
    ident = options.get("identifier")
    if not ident:
        raise ValueError(
            "iceberg-archive stream needs an identifier option")
    db = options.get("sql_catalog_db")
    if db:
        from iceberg_rust_archive_spark.catalog.sql_catalog import (
            SqlCatalog,
        )
        return SqlCatalog(db).load_tabular(ident.lower())
    root = options.get("catalog_root")
    if not root:
        raise ValueError(
            "iceberg-archive stream needs catalog_root (FileCatalog) "
            "or sql_catalog_db (SqlCatalog)")
    from iceberg_rust_archive_spark.catalog.file_catalog import (
        FileCatalog,
    )
    return FileCatalog(root).load_tabular(ident.lower())


class IcebergStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg-archive"

    def schema(self):
        from iceberg_rust_archive_spark.spec.types import (
            spark_schema_for,
        )
        md = _load_metadata(self.options)
        return spark_schema_for(md.current_schema().struct)

    def streamReader(self, schema):
        return _IcebergStreamReader(self.options,
                                    [f.name for f in schema.fields])


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, options, columns):
        self.options = dict(options)
        self.columns = list(columns)
        self._md = None
        self._gate_bytes = int(self.options.get(
            "initial_delete_gate_bytes", _INITIAL_DELETE_GATE_BYTES))
        # field ids + null-fill arrow types per output column: executor
        # reads resolve each column by id from the FILE's own schema,
        # so files written before a rename still resolve and files
        # written before an ADD COLUMN null-fill instead of crashing
        sch = _load_metadata(self.options).current_schema()
        from iceberg_rust_archive_spark.spec.types import contains_variant
        if any(contains_variant(f.field_type) for f in sch.fields):
            # executor reads go through pyarrow, whose footer parser
            # (16.x) predates the VARIANT logical type — it would fail
            # mid-batch with an opaque thrift error; refuse at stream
            # construction instead
            raise ValueError(
                "streaming reads of tables with variant columns are "
                "not supported on this pyarrow version (footer parser "
                "predates the VARIANT logical type) — use batch "
                "Table.scan")
        self._fids, self._null_types = [], []
        for c in self.columns:
            f = sch.field_by_name(c)
            self._fids.append(f.field_id if f is not None else None)
            self._null_types.append(
                _arrow_null_type(f.field_type) if f is not None
                else None)

    # --- offsets ---------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"snapshot_id":
                int(self.options.get("starting_snapshot_id", -1))}

    def latestOffset(self) -> dict:
        self._md = _load_metadata(self.options)
        snap = self._md.current_snapshot()
        if snap is None:
            return self.initialOffset()
        return {"snapshot_id": snap.snapshot_id}

    # --- planning (driver) ----------------------------------------------
    def partitions(self, start: dict, end: dict):
        from iceberg_rust_archive_spark.sources.manifests import (
            read_manifest_list, read_manifests,
        )
        from iceberg_rust_archive_spark.spec.manifest import (
            CONTENT_DATA, STATUS_DELETED,
        )
        end_id = end.get("snapshot_id", -1)
        start_id = start.get("snapshot_id", -1)
        if end_id == -1 or end_id == start_id:
            return []
        md = self._md if self._md is not None \
            else _load_metadata(self.options)
        snap = md.snapshot_by_id(end_id)
        if snap is None:
            raise ValueError(
                f"offset snapshot {end_id} no longer exists "
                "(expired?) — restart the stream from scratch")
        if start_id == -1:
            # INITIAL batch: replans only the END snapshot's CURRENT
            # manifest list — replaced files no longer appear there, so
            # no replace-ancestry walk and no attribution problem (a
            # compacted/TRUNCATEd table streams from scratch fine); any
            # live delete files are resolved merge-on-read driver-side
            # and shipped per partition.
            return self._initial_partitions(md, snap)
        s0 = md.snapshot_by_id(start_id)
        if s0 is None:
            raise ValueError(
                f"checkpointed start snapshot {start_id} has been "
                "expired from table history — the stream cannot "
                "prove exactly-once; restart from scratch")
        start_seq = s0.sequence_number
        # a DATA-rewriting replace commit rewrites rows at one new
        # sequence — an incremental stream would re-emit the table;
        # refuse (same contract as the batch incremental scan,
        # operators/scan.py). A DELETE-FILE-ONLY replace
        # (rewrite_position_deletes) is spannable, but ONLY when no
        # row-deleting commit landed inside the range: the rewrite
        # absorbs prior delete files into one merged file at ITS
        # sequence, so an in-range delete commit's retractions would
        # otherwise vanish from the manifest list unnoticed. The walk
        # is bounded by the CHECKPOINTED sequence: history at or
        # before start_seq was already consumed and cannot taint this
        # range.
        from iceberg_rust_archive_spark.sources.manifests import (
            replace_touches_data,
        )
        spannable_replaces: set[int] = set()
        row_deletes_in_range = False
        s_ = snap
        while s_ is not None and s_.sequence_number > start_seq:
            op = (s_.summary or {}).get("operation")
            if op == "replace":
                if replace_touches_data(s_):
                    raise ValueError(
                        f"stream range spans a replace commit "
                        f"(snapshot {s_.snapshot_id}) — rows cannot "
                        "be attributed; restart the stream from "
                        "scratch")
                spannable_replaces.add(s_.snapshot_id)
            elif op != "append":
                row_deletes_in_range = True
            s_ = (md.snapshots.get(s_.parent_snapshot_id)
                  if s_.parent_snapshot_id is not None else None)
        mlist = [m for m in read_manifest_list(snap.manifest_list)
                 if m.sequence_number > start_seq]
        parts = []
        for entries in read_manifests(
                [m.manifest_path for m in mlist]):
            for e in entries:
                if e.status == STATUS_DELETED:
                    continue
                if (e.sequence_number or 0) <= start_seq:
                    continue
                if e.data_file.content != CONTENT_DATA:
                    if e.snapshot_id in spannable_replaces \
                            and not row_deletes_in_range:
                        # the merged delete file re-encodes only
                        # PRE-checkpoint deletions (no delete commit
                        # in range) — already reflected in what the
                        # consumer read; skip it
                        continue
                    raise ValueError(
                        "stream range contains delete files — "
                        "row-level retractions cannot ride an "
                        "append-only stream; use Table.changes for "
                        "CDC, or resync")
                parts.append(_FilePartition(
                    e.data_file.file_path,
                    (e.data_file.file_format or "parquet").lower()))
        return parts

    def _initial_partitions(self, md, snap):
        """Full-snapshot plan for a fresh stream, equal to
        ``Table.scan()`` at that snapshot: data files become
        partitions and live deletes are resolved PER FILE on the
        driver — DV/pos-delete ordinals attach as ``deleted_pos``,
        equality-delete rows (strictly-newer sequence, the batch
        chain's ordering, operators/scan.py build_chain) attach as
        ``eq_deletes``, scoped to the delete file's partition unless
        the delete is global (all-null partition tuple — the batch
        scan's ``_is_global`` rule). Total delete bytes are gated at
        plan time (``_INITIAL_DELETE_GATE_BYTES``); an oversize set
        refuses loudly instead of OOMing the driver. Subsequent
        increments keep the append-only contract."""
        import json as _json
        import re as _re

        from iceberg_rust_archive_spark.sources.manifests import (
            read_manifest_list, read_manifests,
        )
        from iceberg_rust_archive_spark.spec.manifest import (
            CONTENT_DATA, CONTENT_EQUALITY_DELETES,
            CONTENT_POSITION_DELETES, STATUS_DELETED,
        )

        def norm(p):
            return _re.sub(r"^file:/+", "/", p)

        def pkey(f):
            return _json.dumps(f.partition, sort_keys=True, default=str)

        def is_global(f):
            return all(v is None for v in f.partition.values())

        mlist = read_manifest_list(snap.manifest_list)
        data, eq_files, pos_files, dv_files = [], [], [], []
        for entries in read_manifests([m.manifest_path for m in mlist]):
            for e in entries:
                if e.status == STATUS_DELETED:
                    continue
                c = e.data_file.content
                if c == CONTENT_DATA:
                    data.append((e.data_file, e.sequence_number or 0))
                elif c == CONTENT_EQUALITY_DELETES:
                    eq_files.append((e.data_file, e.sequence_number or 0))
                elif c == CONTENT_POSITION_DELETES:
                    if (e.data_file.file_format or "").lower() \
                            == "puffin":
                        dv_files.append(e.data_file)
                    else:
                        pos_files.append(e.data_file)
        if not (eq_files or pos_files or dv_files):
            return [_FilePartition(
                f.file_path, (f.file_format or "parquet").lower())
                for f, _s in data]

        del_bytes = (
            sum(d.file_size_in_bytes or 0 for d, _s in eq_files)
            + sum(d.file_size_in_bytes or 0 for d in pos_files)
            + sum(d.content_size_in_bytes or d.file_size_in_bytes or 0
                  for d in dv_files))
        if del_bytes > self._gate_bytes:
            raise ValueError(
                f"initial stream batch would materialize {del_bytes} "
                f"bytes of live delete files on the driver (gate: "
                f"{self._gate_bytes}) — compact the table or "
                "consume the current state via Table.scan first, then "
                "stream new commits with "
                "starting_snapshot_id=<current snapshot id>")

        # positions per referenced data file (normalized path)
        from collections import defaultdict
        pos_by_file: dict[str, set] = defaultdict(set)
        for d in dv_files:
            from iceberg_rust_archive_spark.object_store import store_for
            from iceberg_rust_archive_spark.sources.roaring import (
                deserialize_positions,
            )
            blob = store_for(d.file_path).read_bytes(d.file_path)[
                d.content_offset:d.content_offset
                + d.content_size_in_bytes]
            pos_by_file[norm(d.referenced_data_file)].update(
                deserialize_positions(blob))
        for d in pos_files:
            tbl = _read_arrow(d.file_path, d.file_format,
                              ["file_path", "pos"])
            for fp, p in zip(tbl.column("file_path").to_pylist(),
                             tbl.column("pos").to_pylist()):
                pos_by_file[norm(fp)].add(p)

        # equality-delete rows, grouped by (sequence, column set),
        # partition-scoped like the batch chain (operators/scan.py
        # build_chain groups): a delete written for partition P only
        # kills rows in P's data files; an all-null partition tuple
        # means the delete is global
        schema = md.schemas[md.current_schema_id]
        eq_sets = []   # (seq, pkey-or-None, names, fids, rows, types)
        for d, seq in eq_files:
            names, fids, types = [], [], []
            for i in (d.equality_ids or ()):
                f = schema.field_by_id(i)
                if f is None:
                    # column dropped since the delete was written: a
                    # dropped column must not un-apply a delete — name
                    # the key __hist_<fid> and resolve it by field id
                    # in both the delete file and the data files (the
                    # batch scan's rule, operators/scan.py); its type
                    # is the newest historical schema's
                    names.append(f"__hist_{i}")
                    for s_ in sorted(md.schemas.values(),
                                     key=lambda s: -s.schema_id):
                        fh = s_.field_by_id(i)
                        if fh is not None:
                            types.append(fh.field_type)
                            break
                    else:
                        types.append(None)
                else:
                    names.append(f.name)
                    types.append(f.field_type)
                fids.append(i)
            if not names:
                continue
            tbl = _read_arrow_fid(d.file_path, d.file_format, fids,
                                  names)
            # cast each key column to the CURRENT schema's arrow type
            # arrow-side (value-exact widening) so keys written before
            # an int→long / float→double promotion still equal the
            # promoted data values — to_pylist on the native type
            # would ship float32 repr noise instead
            cols = []
            for n, it in zip(names, types):
                col = tbl.column(n)
                tgt = _arrow_null_type(it) if it else None
                if tgt is not None and col.type != tgt:
                    col = col.cast(tgt)
                cols.append(col.to_pylist())
            rows = frozenset(zip(*cols)) if tbl.num_rows else frozenset()
            eq_sets.append((seq, None if is_global(d) else pkey(d),
                            tuple(names), tuple(fids), rows,
                            tuple(types)))

        parts = []
        for f, dseq in data:
            dpos = sorted(pos_by_file.get(norm(f.file_path), ()))
            fkey = pkey(f)
            eqs = tuple((names, fids, rows, types)
                        for seq, dk, names, fids, rows, types in eq_sets
                        if seq > dseq and rows
                        and (dk is None or dk == fkey))
            parts.append(_FilePartition(
                f.file_path, (f.file_format or "parquet").lower(),
                deleted_pos=tuple(dpos) or None,
                eq_deletes=eqs or None))
        return parts

    # --- execution (executors) -------------------------------------------
    def _column_plan(self, file_schema, partition):
        """(out_name, physical-or-None, null_type) per column: output
        columns first, then any __hist_* equality-delete keys not in
        the output. Physical names resolve by field id from the file's
        own schema (rename-safe), by name for id-less files, and None
        null-fills (file predates an ADD COLUMN)."""
        fmap = _fid_map(file_schema)
        in_file = set(file_schema.names)
        plan = []
        for name, fid, ntype in zip(self.columns, self._fids,
                                    self._null_types):
            phys = fmap.get(fid) if fid is not None else None
            if phys is None and name in in_file:
                phys = name
            plan.append((name, phys, ntype))
        seen_extra = set()
        for names, fids, _rows, _types in (partition.eq_deletes or ()):
            for n, fi in zip(names, fids):
                if n in self.columns or n in seen_extra:
                    continue
                seen_extra.add(n)
                phys = fmap.get(fi)
                if phys is None and n in in_file:
                    phys = n
                plan.append((n, phys, None))
        return plan

    @staticmethod
    def _assemble(batch, plan):
        import pyarrow as pa
        arrays = []
        for _name, phys, ntype in plan:
            if phys is not None:
                arr = batch.column(batch.schema.get_field_index(phys))
                # files written before a type promotion carry the OLD
                # physical type (int32/float32); the stream's declared
                # schema is the CURRENT one, so widen here — Spark's
                # ArrowColumnVector does not coerce
                if ntype is not None and arr.type != ntype:
                    arr = arr.cast(ntype)
                arrays.append(arr)
            else:
                arrays.append(pa.nulls(batch.num_rows, type=ntype))
        return pa.RecordBatch.from_arrays(
            arrays, names=[p[0] for p in plan])

    def read(self, partition: _FilePartition):
        import pyarrow.parquet as pq
        if partition.fmt == "parquet":
            pf = pq.ParquetFile(partition.path)
            plan = self._column_plan(pf.schema_arrow, partition)
            read_cols = list(dict.fromkeys(
                p for _n, p, _t in plan if p is not None))
            trim = len(plan) > len(self.columns)
            offset = 0
            for batch in pf.iter_batches(columns=read_cols):
                out = _apply_deletes(self._assemble(batch, plan),
                                     offset, partition)
                offset += batch.num_rows
                yield out.select(self.columns) if trim else out
        elif partition.fmt == "orc":
            from pyarrow import orc as _orc
            f = _orc.ORCFile(partition.path)
            plan = self._column_plan(f.schema, partition)
            read_cols = list(dict.fromkeys(
                p for _n, p, _t in plan if p is not None))
            trim = len(plan) > len(self.columns)
            table = f.read(columns=read_cols)
            offset = 0
            for batch in table.to_batches():
                out = _apply_deletes(self._assemble(batch, plan),
                                     offset, partition)
                offset += batch.num_rows
                yield out.select(self.columns) if trim else out
        else:  # pragma: no cover
            raise ValueError(f"unsupported format {partition.fmt!r}")

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; snapshots are durable
