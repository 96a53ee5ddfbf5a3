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
    return tbl, rg_size, comp


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_tables())
def test_walker_harvest_equals_pyarrow(tmp_path_factory, spec):
    tbl, rg_size, comp = spec
    path = str(tmp_path_factory.mktemp("fw") / "f.parquet")
    pq.write_table(tbl, path, row_group_size=rg_size, compression=comp)
    fids = {name: i + 1 for i, name in enumerate(tbl.column_names)}

    via_pyarrow = harvest_one(path, fids)
    nrows, rg_chunks, group_fids = _walk_parquet_stats(path, fids)
    via_walker = _reduce_chunks(rg_chunks, nrows, group_fids, path,
                                fids, None, 0, None)

    assert _parquet_num_rows(path) == pq.ParquetFile(path).metadata.num_rows
    assert via_walker == via_pyarrow
    os.remove(path)


def test_walker_rejects_non_parquet(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="not a parquet"):
        _walk_parquet_stats(str(p), {})
