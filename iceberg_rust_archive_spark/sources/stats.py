"""Parquet footer → DataFile stats harvesting
(iceberg-rust/src/file_format/parquet.rs:30-267).

Two execution modes:
- ``distributed=True`` (default for many files): footer reads run on
  *executors* via an RDD over file paths — at 100 TB a commit can add tens
  of thousands of files and the driver must not read every footer serially
  (SURVEY §7 risks).
- driver-side fallback for small commits (cheaper than a Spark job).

Bound values are normalized JSON-native: date → ISO string,
timestamp → epoch micros int, bytes → skipped, NaN → skipped.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

from iceberg_rust_archive_spark.spec.manifest import CONTENT_DATA, DataFile


# String bounds are truncated like the spec's write.metadata default
# (truncate(16), TableMetadataBuilder METRICS defaults): a manifest row
# must stay O(small) per column even when the column holds documents —
# full-text min/max would make metadata scale with content length.
TRUNCATE_BOUND_LEN = 16


def _trunc_lower(v):
    """Lower bounds truncate plainly: prefix ≤ every value it bounds."""
    if isinstance(v, str) and len(v) > TRUNCATE_BOUND_LEN:
        return v[:TRUNCATE_BOUND_LEN]
    return v


def _trunc_upper(v):
    """Upper bounds truncate then increment the last incrementable code
    point, so the result still upper-bounds every value sharing the
    prefix; un-incrementable (all U+10FFFF) → drop the bound.

    Incrementing U+D7FF must jump over the UTF-16 surrogate block to
    U+E000 (mirrors Iceberg's UnicodeUtil.truncateStringMax): lone
    surrogates are not encodable, so chr(0xD800) would blow up the
    Avro manifest writer's UTF-8 encode and fail the commit."""
    if isinstance(v, str) and len(v) > TRUNCATE_BOUND_LEN:
        t = v[:TRUNCATE_BOUND_LEN]
        for i in range(len(t) - 1, -1, -1):
            cp = ord(t[i])
            if cp == 0xD7FF:
                return t[:i] + chr(0xE000)
            if cp < 0x10FFFF and not 0xD800 <= cp < 0xDFFF:
                return t[:i] + chr(cp + 1)
        return None
    return v


def _norm_bound(v):
    if v is None:
        return None
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, _dt.datetime):
        epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        return int((v - epoch).total_seconds() * 1_000_000)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None
    return v


def _harvest_one_orc(path: str, field_ids: dict[str, int],
                     partition: dict | None,
                     content: int,
                     equality_ids: tuple[int, ...] | None) -> DataFile:
    """ORC DataFile stats: pyarrow's ORC reader exposes no per-stripe
    column statistics API, so bounds come from reading the file back and
    reducing with pyarrow.compute (C-side, GIL-released). Costlier than
    a parquet footer read, but it runs once per written file, on the
    executors above the distributed threshold — the same I/O locality
    the write itself had. column_sizes are apportioned from in-memory
    Arrow buffer sizes (relative, not exact on-disk bytes)."""
    import pyarrow.compute as pc
    import pyarrow.orc as po

    f = po.ORCFile(path)
    tbl = f.read()
    fsize = os.path.getsize(path)
    col_sizes: dict[int, int] = {}
    value_counts: dict[int, int] = {}
    null_counts: dict[int, int] = {}
    lowers: dict[int, object] = {}
    uppers: dict[int, object] = {}
    mem_total = max(1, tbl.nbytes)
    for name in tbl.column_names:
        fid = field_ids.get(name)
        if fid is None:
            continue
        col = tbl.column(name)
        value_counts[fid] = len(col)
        null_counts[fid] = col.null_count
        col_sizes[fid] = max(1, fsize * col.nbytes // mem_total)
        if len(col) == col.null_count:
            continue
        try:
            lo = _norm_bound(pc.min(col).as_py())
            hi = _norm_bound(pc.max(col).as_py())
        except Exception:  # noqa: BLE001 — nested/unordered types
            continue
        if lo is not None:
            lowers[fid] = lo
        if hi is not None:
            uppers[fid] = hi

    lowers = {fid: _trunc_lower(v) for fid, v in lowers.items()}
    uppers = {fid: u for fid, v in uppers.items()
              if (u := _trunc_upper(v)) is not None}
    return DataFile(
        content=content, file_path=path, file_format="orc",
        partition=partition or {}, record_count=f.nrows,
        file_size_in_bytes=fsize,
        column_sizes=col_sizes, value_counts=value_counts,
        null_value_counts=null_counts, lower_bounds=lowers,
        upper_bounds=uppers, equality_ids=equality_ids)


def _parquet_num_rows(path: str) -> int:
    """Read FileMetaData.num_rows (field 3, i64) straight from the
    parquet footer with a minimal Thrift compact-protocol walker —
    used when pyarrow's footer parser predates a logical type in the
    file (e.g. Spark's v3 VARIANT annotation). Unknown fields are
    skipped structurally, so new annotations can never break it."""
    with open(path, "rb") as f:
        f.seek(-8, os.SEEK_END)
        tail = f.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError(f"not a parquet file: {path}")
        flen = int.from_bytes(tail[:4], "little")
        f.seek(-(8 + flen), os.SEEK_END)
        buf = f.read(flen)

    pos = 0

    def _uvarint():
        nonlocal pos
        out = shift = 0
        while True:
            b = buf[pos]
            pos += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def _skip(ftype, in_container=False):
        nonlocal pos
        if ftype in (1, 2):        # BOOLEAN_TRUE / BOOLEAN_FALSE
            if in_container:       # container bools are one byte each
                pos += 1
            return
        if ftype == 3:             # BYTE
            pos += 1
        elif ftype in (4, 5, 6):   # I16 / I32 / I64 (zigzag varints)
            _uvarint()
        elif ftype == 7:           # DOUBLE
            pos += 8
        elif ftype == 8:           # BINARY/STRING
            # NOTE: `pos += _uvarint()` would read the OLD pos before
            # the varint read advances it — evaluate the length first
            blen = _uvarint()
            pos += blen
        elif ftype in (9, 10):     # LIST / SET
            head = buf[pos]
            pos += 1
            size, etype = head >> 4, head & 0x0F
            if size == 15:
                size = _uvarint()
            for _ in range(size):
                _skip(etype, in_container=True)
        elif ftype == 11:          # MAP
            size = _uvarint()
            if size:
                types = buf[pos]
                pos += 1
                kt, vt = types >> 4, types & 0x0F
                for _ in range(size):
                    _skip(kt, in_container=True)
                    _skip(vt, in_container=True)
        elif ftype == 12:          # STRUCT
            _skip_struct()
        else:
            raise ValueError(f"bad thrift compact type {ftype}")

    def _skip_struct():
        nonlocal pos
        fid = 0
        while True:
            head = buf[pos]
            pos += 1
            if head == 0:          # STOP
                return
            delta, ftype = head >> 4, head & 0x0F
            if delta:
                fid += delta
            else:
                z = _uvarint()
                fid = (z >> 1) ^ -(z & 1)
            _skip(ftype)

    # walk the top-level FileMetaData struct looking for field 3 (I64)
    fid = 0
    while pos < len(buf):
        head = buf[pos]
        pos += 1
        if head == 0:
            break
        delta, ftype = head >> 4, head & 0x0F
        if delta:
            fid += delta
        else:
            z = _uvarint()
            fid = (z >> 1) ^ -(z & 1)
        if fid == 3 and ftype == 6:
            z = _uvarint()
            return (z >> 1) ^ -(z & 1)
        _skip(ftype)
    raise ValueError(f"num_rows not found in parquet footer: {path}")


def harvest_one(path: str, field_ids: dict[str, int],
                partition: dict | None = None,
                content: int = CONTENT_DATA,
                equality_ids: tuple[int, ...] | None = None) -> DataFile:
    """Read one footer with pyarrow; aggregate row-group stats per column.
    ``field_ids`` maps column name → iceberg field id. ORC files (by
    extension) route to the Arrow-reduction harvester."""
    if path.endswith(".orc"):
        return _harvest_one_orc(path, field_ids, partition, content,
                                equality_ids)
    import pyarrow.parquet as pq

    try:
        pf = pq.ParquetFile(path)
    except OSError as e:
        if "LogicalType" in str(e):
            # pyarrow predates a logical type in the footer (Spark
            # writes the v3 VARIANT annotation; pyarrow 16 can't parse
            # it) — degrade to a stats-less DataFile with the exact
            # record count parsed straight from the footer thrift
            # (_parquet_num_rows, dependency-free so it runs on
            # executors too). No bounds/value-counts means pruning and
            # the metadata-count fast path simply don't engage for
            # this file; correctness is unaffected (residual filters
            # always re-apply).
            nrows = _parquet_num_rows(path)
            # value_counts MUST still record which fields the file has:
            # the v3 initial-default fill detects pre-column files by a
            # field id being ABSENT from the harvested stats — an empty
            # map would read as "every column predates nothing" and
            # rows from files older than an ADD COLUMN ... DEFAULT
            # would silently null-fill (r12 probe). The spec's
            # value_count includes nulls, so record_count per written
            # top-level field is exact.
            return DataFile(
                content=content, file_path=path, file_format="parquet",
                partition=partition or {},
                record_count=nrows,
                file_size_in_bytes=os.path.getsize(path),
                value_counts={fid: nrows for fid in field_ids.values()},
                equality_ids=equality_ids)
        raise
    meta = pf.metadata
    n_cols = meta.num_columns
    names = [meta.row_group(0).column(i).path_in_schema if meta.num_row_groups
             else None for i in range(n_cols)] if meta.num_row_groups else []

    col_sizes: dict[int, int] = {}
    value_counts: dict[int, int] = {}
    null_counts: dict[int, int] = {}
    lowers: dict[int, object] = {}
    uppers: dict[int, object] = {}
    # A row group whose stat can't be represented (±inf, NaN, undecodable
    # bytes, failed lazy cast) poisons that column's FILE-level bound:
    # silently falling back to another row group's value would record a
    # bound that doesn't bound this group's rows, and prune_datafiles
    # would then wrongly drop the file for e.g. ``x > 100`` when the
    # skipped group holds +inf. Directional exception: st.min == +inf
    # (all values inf) is safely skipped for the LOWER bound — any other
    # group's lower still bounds it — and st.max == -inf symmetrically.
    no_lower: set[int] = set()
    no_upper: set[int] = set()
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for i in range(n_cols):
            c = g.column(i)
            name = names[i]
            fid = field_ids.get(name)
            if fid is None:
                continue
            col_sizes[fid] = col_sizes.get(fid, 0) + c.total_compressed_size
            value_counts[fid] = value_counts.get(fid, 0) + c.num_values
            try:
                st = c.statistics
            except Exception:  # noqa: BLE001 — nested-type leaves
                continue
            if st is None:
                continue
            if st.null_count is not None:
                null_counts[fid] = null_counts.get(fid, 0) + st.null_count
            if st.has_min_max:
                try:  # the min/max CAST is lazy and can be unsupported
                    raw_lo, raw_hi = st.min, st.max
                    lo, hi = _norm_bound(raw_lo), _norm_bound(raw_hi)
                except Exception:  # noqa: BLE001
                    no_lower.add(fid)
                    no_upper.add(fid)
                    continue
                if lo is None:
                    if not (isinstance(raw_lo, float)
                            and raw_lo == math.inf):
                        no_lower.add(fid)
                elif fid not in lowers or lo < lowers[fid]:
                    lowers[fid] = lo
                if hi is None:
                    if not (isinstance(raw_hi, float)
                            and raw_hi == -math.inf):
                        no_upper.add(fid)
                elif fid not in uppers or hi > uppers[fid]:
                    uppers[fid] = hi

    lowers = {fid: _trunc_lower(v) for fid, v in lowers.items()
              if fid not in no_lower}
    uppers = {fid: u for fid, v in uppers.items()
              if fid not in no_upper and (u := _trunc_upper(v)) is not None}

    return DataFile(
        content=content, file_path=path, file_format="parquet",
        partition=partition or {}, record_count=meta.num_rows,
        file_size_in_bytes=os.path.getsize(path),
        column_sizes=col_sizes, value_counts=value_counts,
        null_value_counts=null_counts, lower_bounds=lowers,
        upper_bounds=uppers, equality_ids=equality_ids)


def harvest_files(spark, paths_with_partitions: list[tuple[str, dict]],
                  field_ids: dict[str, int], content: int = CONTENT_DATA,
                  equality_ids: tuple[int, ...] | None = None,
                  distributed_threshold: int = 512) -> list[DataFile]:
    """Harvest many footers; distributes to executors above the threshold.
    Below it, a driver-side thread pool is faster than a Spark job —
    footer reads are I/O + C parsing and release the GIL; the job
    overhead (~1-2s) dwarfs a few hundred small footer reads."""
    items = paths_with_partitions
    if len(items) <= distributed_threshold or spark is None:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(16, max(len(items), 1))) as ex:
            return list(ex.map(
                lambda it: harvest_one(it[0], field_ids, it[1], content,
                                       equality_ids), items))
    sc = spark.sparkContext
    n_slices = min(len(items), 256)

    def _do(batch):
        return [harvest_one(p, field_ids, part, content, equality_ids).to_json()
                for p, part in batch]

    jsons = sc.parallelize(items, n_slices).mapPartitions(
        lambda it: _do(list(it))).collect()
    return [DataFile.from_json(j) for j in jsons]
