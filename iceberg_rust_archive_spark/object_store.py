"""Pluggable object-store layer for METADATA I/O
(iceberg-rust/src/object_store/mod.rs:21-149 analog).

The reference parses a table location's scheme (s3://bucket, file://,
memory:/) and builds the matching store; every metadata read/write goes
through that handle. Same shape here: ``store_for(path)`` dispatches on
scheme, and the metadata writers/readers (metadata JSON documents,
Avro manifests, catalog pointers) all route through it — so a table
whose location is ``s3://bucket/wh/...`` or ``memory://wh/...`` works
without touching the call sites.

Scope note: DATA files (parquet) are read and written by Spark itself,
whose Hadoop filesystem layer already speaks s3a://, gs://, abfss://
on a real cluster — duplicating that here would be wrong. This layer
covers the driver-side metadata plane only, exactly like the
reference's object_store module.

Stores:
- ``LocalStore`` — the default; atomic writes via temp-file + rename.
- ``MemoryStore`` — process-local dict keyed by full path; exercised by
  tests/test_object_store.py to prove no call site bypasses the layer.
- ``S3Store`` — boto3-backed, constructed lazily so environments
  without credentials never touch it. Objects are immutable puts;
  commit safety does not depend on rename atomicity because the
  catalog pointer CAS (SQL/REST/Glue conditional update) is the
  serialization point — matching the reference's S3 semantics.
"""

from __future__ import annotations

import os
import threading
from abc import ABC, abstractmethod


class ObjectStore(ABC):
    @abstractmethod
    def read_bytes(self, path: str) -> bytes: ...

    @abstractmethod
    def write_bytes(self, path: str, data: bytes) -> None:
        """Atomic-ish full-object write (readers never see partials)."""

    @abstractmethod
    def exists(self, path: str) -> bool: ...

    @abstractmethod
    def remove(self, path: str) -> None: ...

    @abstractmethod
    def size(self, path: str) -> int: ...

    @abstractmethod
    def list(self, prefix: str) -> list[str]:
        """All object paths under ``prefix`` (recursive)."""

    @abstractmethod
    def create_exclusive(self, path: str, data: bytes = b"") -> None:
        """Create iff absent; raise FileExistsError otherwise (the
        primitive behind the file catalog's commit lock)."""

    def mtime_ms(self, path: str) -> float:
        """Last-modified wall-clock milliseconds — the orphan sweep's
        in-flight-write safety margin. Stores that cannot answer raise
        NotImplementedError and the sweep conservatively KEEPS the
        file (never deletes on unknown age)."""
        raise NotImplementedError


class LocalStore(ObjectStore):
    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.rename(tmp, path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def remove(self, path: str) -> None:
        os.remove(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def list(self, prefix: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(prefix):
            out.extend(os.path.join(root, f) for f in files)
        return sorted(out)

    def create_exclusive(self, path: str, data: bytes = b"") -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            os.write(fd, data)
        finally:
            os.close(fd)

    def mtime_ms(self, path: str) -> float:
        return os.path.getmtime(path) * 1000


class MemoryStore(ObjectStore):
    """One shared in-process namespace (like the reference's
    ``memory:`` store): every MemoryStore sees the same objects, so a
    catalog and a transaction built independently agree on state."""

    _objects: dict[str, bytes] = {}
    _mtimes: dict[str, float] = {}
    _lock = threading.Lock()

    def read_bytes(self, path: str) -> bytes:
        try:
            return self._objects[path]
        except KeyError:
            raise FileNotFoundError(path) from None

    def write_bytes(self, path: str, data: bytes) -> None:
        import time
        with self._lock:
            self._objects[path] = bytes(data)
            self._mtimes[path] = time.time() * 1000

    def exists(self, path: str) -> bool:
        return path in self._objects

    def remove(self, path: str) -> None:
        with self._lock:
            if path not in self._objects:
                raise FileNotFoundError(path)
            del self._objects[path]

    def size(self, path: str) -> int:
        return len(self.read_bytes(path))

    def list(self, prefix: str) -> list[str]:
        p = prefix.rstrip("/") + "/"
        return sorted(k for k in self._objects
                      if k.startswith(p) or k == prefix)

    def create_exclusive(self, path: str, data: bytes = b"") -> None:
        import time
        with self._lock:
            if path in self._objects:
                raise FileExistsError(path)
            self._objects[path] = bytes(data)
            self._mtimes[path] = time.time() * 1000

    def mtime_ms(self, path: str) -> float:
        try:
            return self._mtimes[path]
        except KeyError:
            if path in self._objects:
                return 0.0  # pre-tracking object: treat as old
            raise FileNotFoundError(path) from None

    @classmethod
    def wipe(cls) -> None:
        """Test hook: drop every object."""
        with cls._lock:
            cls._objects.clear()
            cls._mtimes.clear()


class S3Store(ObjectStore):
    """boto3-backed store; bucket parsed from the path like the
    reference's ``parse_bucket`` (object_store/mod.rs:105-149). The
    client is injectable for tests."""

    def __init__(self, client=None):
        if client is None:
            import boto3
            client = boto3.client("s3")
        self.client = client

    @staticmethod
    def _parse(path: str) -> tuple[str, str]:
        rest = path[len("s3://"):]
        bucket, _, key = rest.partition("/")
        if not bucket or not key:
            raise ValueError(f"no bucket/key in {path!r}")
        return bucket, key

    def read_bytes(self, path: str) -> bytes:
        b, k = self._parse(path)
        return self.client.get_object(Bucket=b, Key=k)["Body"].read()

    def write_bytes(self, path: str, data: bytes) -> None:
        b, k = self._parse(path)
        self.client.put_object(Bucket=b, Key=k, Body=data)

    def exists(self, path: str) -> bool:
        b, k = self._parse(path)
        try:
            self.client.head_object(Bucket=b, Key=k)
            return True
        except Exception:  # noqa: BLE001 — boto's ClientError w/ 404
            return False

    def remove(self, path: str) -> None:
        b, k = self._parse(path)
        self.client.delete_object(Bucket=b, Key=k)

    def size(self, path: str) -> int:
        b, k = self._parse(path)
        return self.client.head_object(Bucket=b, Key=k)["ContentLength"]

    def list(self, prefix: str) -> list[str]:
        b, k = self._parse(prefix.rstrip("/") + "/x")
        k = k[:-1]
        out = []
        paginator = self.client.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=b, Prefix=k):
            out.extend(f"s3://{b}/{o['Key']}"
                       for o in page.get("Contents", []))
        return sorted(out)

    def mtime_ms(self, path: str) -> float:
        b, k = self._parse(path)
        lm = self.client.head_object(Bucket=b, Key=k)["LastModified"]
        return lm.timestamp() * 1000

    def create_exclusive(self, path: str, data: bytes = b"") -> None:
        b, k = self._parse(path)
        # conditional put (If-None-Match: *) — S3 rejects if present
        try:
            self.client.put_object(Bucket=b, Key=k, Body=data,
                                   IfNoneMatch="*")
        except Exception as e:  # noqa: BLE001
            raise FileExistsError(path) from e


_S3_SINGLETON: S3Store | None = None

# location-prefix → dedicated store instance. Credential vending
# (RestCatalog.apply_vended_credentials) scopes a table's vended
# session to its storage prefix by registering here; longest prefix
class ExpiringStore(ObjectStore):
    """Vended-credential lifecycle wrapper: delegates every operation
    to an inner store until the vend's ``expires_at_ms`` (minus a
    clock-skew margin), then calls ``refresh() -> (inner,
    expires_at_ms)`` to re-fetch scoped credentials and swaps the
    delegate — so a long-lived session re-vends instead of failing
    mid-scan with opaque S3 AccessDenied errors. A refresh that fails
    (vend revoked, prefix no longer covered) raises loudly at the
    call site."""

    def __init__(self, inner: ObjectStore, expires_at_ms: float,
                 refresh, skew_ms: int = 30_000):
        self._inner = inner
        self._expires_at_ms = expires_at_ms
        self._refresh = refresh
        self._skew_ms = skew_ms

    def _delegate(self) -> ObjectStore:
        # racing refreshes are benign: both the old and the new
        # delegate hold valid (if differently-scoped-in-time)
        # credentials, and the two attribute assignments are each
        # atomic under the GIL — a concurrent reader sees either a
        # consistent old or a consistent new store, never a torn one
        import time
        if time.time() * 1000 >= self._expires_at_ms - self._skew_ms:
            self._inner, self._expires_at_ms = self._refresh()
        return self._inner

    def read_bytes(self, path: str) -> bytes:
        return self._delegate().read_bytes(path)

    def write_bytes(self, path: str, data: bytes) -> None:
        self._delegate().write_bytes(path, data)

    def exists(self, path: str) -> bool:
        return self._delegate().exists(path)

    def remove(self, path: str) -> None:
        self._delegate().remove(path)

    def size(self, path: str) -> int:
        return self._delegate().size(path)

    def list(self, prefix: str) -> list[str]:
        return self._delegate().list(prefix)

    def create_exclusive(self, path: str, data: bytes = b"") -> None:
        self._delegate().create_exclusive(path, data)

    def mtime_ms(self, path: str) -> float:
        return self._delegate().mtime_ms(path)

    def __getattr__(self, name):
        # convenience passthrough (e.g. .client introspection). Never
        # delegate dunder/private lookups: pickle/copy probe
        # __setstate__/__reduce_ex__ via getattr BEFORE __init__ has
        # set _inner, and delegating '_inner' itself would recurse
        # infinitely on a half-constructed instance
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._inner, name)


# wins so a table-scoped credential shadows a bucket-wide one.
_PREFIX_STORES: dict[str, ObjectStore] = {}


def register_store(prefix: str, store: ObjectStore | None) -> None:
    """Route every path under ``prefix`` to ``store`` (None removes
    the registration). The hook the REST credentials route uses to
    make vended, scoped credentials effective without threading a
    session object through every reader/writer."""
    key = prefix.rstrip("/")
    if store is None:
        _PREFIX_STORES.pop(key, None)
    else:
        _PREFIX_STORES[key] = store


def store_for(path: str) -> ObjectStore:
    """Scheme dispatch (object_store/mod.rs:21-57); prefix-registered
    stores (vended credentials) take precedence, longest match
    first."""
    if _PREFIX_STORES:
        for prefix in sorted(_PREFIX_STORES, key=len, reverse=True):
            # whole-segment match only: a store registered for
            # s3://bucket/tab must NOT capture s3://bucket/tab2/...,
            # which would route a sibling table's I/O through another
            # table's scoped credentials
            if path == prefix or path.startswith(prefix + "/"):
                return _PREFIX_STORES[prefix]
    if path.startswith("memory://"):
        return MemoryStore()
    if path.startswith("s3://"):
        global _S3_SINGLETON
        if _S3_SINGLETON is None:
            _S3_SINGLETON = S3Store()
        return _S3_SINGLETON
    if path.startswith("file://"):
        return LocalStore()
    return LocalStore()


def strip_scheme(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path
