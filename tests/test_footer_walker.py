"""Property model for the thrift footer walker (sources/stats.py).

The walker is hand-rolled binary parsing on the write path's fallback
(variant-table footers pyarrow can't read), so it is graded against
pyarrow itself: for arbitrary pyarrow-written files — random schemas,
row-group sizes, null patterns, NaN/±inf, compression — the walker's
harvested DataFile must equal the pyarrow path's bit for bit, and
``_parquet_num_rows`` must match ``metadata.num_rows``. Both paths feed
one shared reduction (``_reduce_chunks``), so equality here proves the
walker's parse + stat decode, not a reimplementation of the policy.

Stats-harvest contract mirrored from the reference's footer reader
(iceberg-rust/src/file_format/parquet.rs:30-267).
"""

import datetime
import decimal
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_rust_archive_spark.sources.stats import (
    _parquet_num_rows,
    _reduce_chunks,
    _walk_parquet_stats,
    harvest_one,
)

# (arrow type, value strategy) pool — every kind the walker decodes
_TS_MIN = datetime.datetime(1, 1, 2)
_TS_MAX = datetime.datetime(9999, 12, 30)
_COLUMN_KINDS = [
    (pa.int64(), st.integers(-2**62, 2**62)),
    (pa.int32(), st.integers(-2**31, 2**31 - 1)),
    (pa.int16(), st.integers(-2**15, 2**15 - 1)),
    (pa.float64(), st.floats(allow_nan=True, allow_infinity=True)),
    (pa.float32(),
     st.floats(allow_nan=True, allow_infinity=True, width=32)),
    (pa.bool_(), st.booleans()),
    (pa.string(), st.text(max_size=40)),   # > TRUNCATE_BOUND_LEN too
    (pa.binary(), st.binary(max_size=20)),
    (pa.date32(), st.dates()),
    (pa.timestamp("us"), st.datetimes(min_value=_TS_MIN, max_value=_TS_MAX)),
    (pa.timestamp("us", tz="UTC"),
     st.datetimes(min_value=_TS_MIN, max_value=_TS_MAX)),
    (pa.decimal128(12, 2),
     st.decimals(min_value=-10**9, max_value=10**9, places=2,
                 allow_nan=False, allow_infinity=False)),
    (pa.list_(pa.int64()),                 # nested → group-fid path
     st.lists(st.integers(-100, 100), max_size=3)),
]


@st.composite
def _tables(draw):
    n_cols = draw(st.integers(1, 5))
    n_rows = draw(st.integers(0, 24))
    kinds = [draw(st.sampled_from(range(len(_COLUMN_KINDS))))
             for _ in range(n_cols)]
    arrays, fields = [], []
    for i, ki in enumerate(kinds):
        typ, vals = _COLUMN_KINDS[ki]
        col = draw(st.lists(st.one_of(st.none(), vals),
                            min_size=n_rows, max_size=n_rows))
        if typ == pa.timestamp("us", tz="UTC"):
            col = [None if v is None
                   else v.replace(tzinfo=datetime.timezone.utc) for v in col]
        arrays.append(pa.array(col, typ))
        fields.append(pa.field(f"c{i}", typ))
    tbl = pa.table(dict(zip([f.name for f in fields], arrays)))
    rg_size = draw(st.integers(1, 9))
    comp = draw(st.sampled_from(["NONE", "SNAPPY", "ZSTD"]))
    # sometimes suppress statistics for a column subset — exercises the
    # poison-on-missing-min/max and all-or-nothing null_count rules in
    # the shared reduction (a file with stats on SOME columns only)
    if draw(st.booleans()):
        stats_cols = [f.name for f in fields
                      if draw(st.booleans())] or True
    else:
        stats_cols = True
    return tbl, rg_size, comp, stats_cols


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_tables())
def test_walker_harvest_equals_pyarrow(tmp_path_factory, spec):
    tbl, rg_size, comp, stats_cols = spec
    path = str(tmp_path_factory.mktemp("fw") / "f.parquet")
    pq.write_table(tbl, path, row_group_size=rg_size, compression=comp,
                   write_statistics=stats_cols)
    fids = {name: i + 1 for i, name in enumerate(tbl.column_names)}

    via_pyarrow = harvest_one(path, fids)
    nrows, rg_chunks, group_fids = _walk_parquet_stats(path, fids)
    via_walker = _reduce_chunks(rg_chunks, nrows, group_fids, path,
                                fids, None, 0, None)

    assert _parquet_num_rows(path) == pq.ParquetFile(path).metadata.num_rows
    assert via_walker == via_pyarrow
    os.remove(path)


def test_walker_harvest_equals_pyarrow_on_testdata():
    """Differential sweep over the driver-generated tables — real
    files, not hypothesis-shaped ones (timestamps incl. NANOS-as-int64,
    list<float> embeddings, long text columns with truncated stats)."""
    import glob

    from tests.conftest import SF_DIR

    paths = sorted(glob.glob(f"{SF_DIR}/*.parquet"))
    assert paths
    for p in paths:
        pf = pq.ParquetFile(p)
        fids = {f.name: i + 1 for i, f in enumerate(pf.schema_arrow)}
        nrows, rg_chunks, group_fids = _walk_parquet_stats(p, fids)
        assert _reduce_chunks(rg_chunks, nrows, group_fids, p, fids,
                              None, 0, None) == harvest_one(p, fids)


def test_walker_harvest_superset_of_pyarrow_on_spark_written_file(
        spark, tmp_path):
    """Spark writes through parquet-mr, whose footer encoder (field
    order, deprecated min/max alongside min_value/max_value, zstd,
    decimals as INT64 below precision 19) differs from pyarrow's. The
    walker must agree with pyarrow on every stat pyarrow exposes, and
    may additionally harvest what pyarrow drops (int-backed decimal
    bounds — pyarrow only decodes FLBA decimal statistics). Timestamp
    bounds must be present: the engine forces TIMESTAMP_MICROS on
    write precisely so time-range predicates prune (INT96 harvests
    nothing)."""
    out = str(tmp_path / "sparkfile")
    df = spark.range(0, 50_000).selectExpr(
        "id", "cast(id % 7 as int) AS i32",
        "cast(id AS double) / 3 AS d",
        "concat('v', id) AS s",
        "date_add(date'2020-01-01', cast(id % 900 AS int)) AS dt",
        "timestamp'2021-06-01 12:00:00' + make_interval(0,0,0,0,0,0,id) "
        "AS ts",
        "cast(cast(id AS decimal(12,2)) / 100 AS decimal(12,2)) AS dec",
        "CASE WHEN id % 11 = 0 THEN NULL ELSE id END AS maybe_null")
    (df.coalesce(1).write.mode("overwrite")
       .option("parquet.block.size", str(64 * 1024))
       .option("compression", "zstd").parquet(out))
    import glob as _g
    files = _g.glob(out + "/*.parquet")
    assert files
    names = dict(enumerate(df.columns, start=1))
    for p in files:
        pf = pq.ParquetFile(p)
        assert pf.metadata.num_row_groups > 1  # multi-RG reduction real
        fids = {f.name: i + 1 for i, f in enumerate(pf.schema_arrow)}
        via_pyarrow = harvest_one(p, fids)
        nrows, rg_chunks, group_fids = _walk_parquet_stats(p, fids)
        via_walker = _reduce_chunks(rg_chunks, nrows, group_fids, p,
                                    fids, None, 0, None)
        assert _parquet_num_rows(p) == pf.metadata.num_rows
        assert via_walker.record_count == via_pyarrow.record_count
        assert via_walker.value_counts == via_pyarrow.value_counts
        assert via_walker.column_sizes == via_pyarrow.column_sizes
        for attr in ("null_value_counts", "lower_bounds", "upper_bounds"):
            a, b = getattr(via_pyarrow, attr), getattr(via_walker, attr)
            for fid, v in a.items():
                assert b[fid] == v, (attr, names[fid])
        # engine-critical richness: micros timestamp + int64-decimal
        # bounds present from the walker
        ts_id, dec_id = fids["ts"], fids["dec"]
        assert via_walker.lower_bounds[ts_id] == 1622548800000000
        assert isinstance(via_walker.lower_bounds[dec_id],
                          __import__("decimal").Decimal)


def test_walker_rejects_non_parquet(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="not a parquet"):
        _walk_parquet_stats(str(p), {})
