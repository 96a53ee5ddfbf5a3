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

Scale shape: planning is driver-side manifest pruning (sequence-range
A4 semantics — one manifest-list read plus the new manifests only);
each data FILE becomes one ``InputPartition`` and executors read it
with pyarrow, yielding Arrow RecordBatches straight into Spark's
columnar ingestion — no per-row Python loop. Incremental ranges that
contain delete files or a replace commit FAIL loudly (rows could not
be attributed exactly-once); consumers resync from a fresh stream, the
same contract the batch incremental read enforces.
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


class _FilePartition(InputPartition):
    def __init__(self, path: str, fmt: str):
        self.path = path
        self.fmt = fmt


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
        start_seq = -1
        if start_id != -1:
            s0 = md.snapshot_by_id(start_id)
            if s0 is None:
                raise ValueError(
                    f"checkpointed start snapshot {start_id} has been "
                    "expired from table history — the stream cannot "
                    "prove exactly-once; restart from scratch")
            start_seq = s0.sequence_number
        # a replace commit rewrites ALL rows at one new sequence — an
        # incremental stream would re-emit the table; refuse (same
        # contract as the batch incremental scan, operators/scan.py)
        s_ = snap
        while s_ is not None and s_.sequence_number > max(start_seq, 0):
            if (s_.summary or {}).get("operation") == "replace":
                raise ValueError(
                    f"stream range spans a replace commit (snapshot "
                    f"{s_.snapshot_id}) — rows cannot be attributed; "
                    "restart the stream from scratch")
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
                    raise ValueError(
                        "stream range contains delete files — "
                        "row-level retractions cannot ride an "
                        "append-only stream; use Table.changes for "
                        "CDC, or resync")
                parts.append(_FilePartition(
                    e.data_file.file_path,
                    (e.data_file.file_format or "parquet").lower()))
        return parts

    # --- execution (executors) -------------------------------------------
    def read(self, partition: _FilePartition):
        import pyarrow.parquet as pq
        if partition.fmt == "parquet":
            pf = pq.ParquetFile(partition.path)
            for batch in pf.iter_batches(columns=self.columns):
                yield batch.select(self.columns)
        elif partition.fmt == "orc":
            from pyarrow import orc as _orc
            table = _orc.ORCFile(partition.path).read(
                columns=self.columns)
            for batch in table.select(self.columns).to_batches():
                yield batch
        else:  # pragma: no cover
            raise ValueError(f"unsupported format {partition.fmt!r}")

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; snapshots are durable
