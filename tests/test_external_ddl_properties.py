"""Generative soak of the CREATE EXTERNAL TABLE parser (r15 verdict
#4): the r15 post-review found three edge regressions (USING ICEBERG,
TBLPROPERTIES, IF NOT EXISTS) by hand — this model finds that class
mechanically. One hypothesis generator drives clause order × quoting ×
nesting (decimal(9,2), quoted transforms, OPTIONS with and without '=')
and asserts the parse→register round trip; malformed forms must reject
LOUDLY (a typed error), never misparse or crash with AttributeError.

Parser under test: plans/engine.py external-table branch +
_create_external_table_sql (planner.rs:146-220 parity)."""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_UNIQ = itertools.count()

# (SQL type, iceberg type, spark simpleString)
TYPES = [
    ("BIGINT", "long", "bigint"),
    ("INT", "int", "int"),
    ("DOUBLE", "double", "double"),
    ("STRING", "string", "string"),
    ("VARCHAR", "string", "string"),
    ("DATE", "date", "date"),
    ("DECIMAL(9,2)", "decimal(9,2)", "decimal(9,2)"),
    ("DECIMAL(18, 4)", "decimal(18,4)", "decimal(18,4)"),
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    from iceberg_rust_archive_spark.catalog.file_catalog import FileCatalog
    from iceberg_rust_archive_spark.plans.engine import Engine
    base = tmp_path_factory.mktemp("extddl")
    e = Engine(spark, FileCatalog(str(base / "wh")))
    e.sql("CREATE SCHEMA db")
    loc = base / "data"
    loc.mkdir()
    e._test_location = str(loc)  # empty dir: schema is explicit, no read
    return e


@st.composite
def ddl_case(draw):
    fmt = draw(st.sampled_from(
        ["CSV", "PARQUET", "ICEBERG", "csv", "Parquet", "iceberg"]))
    is_ice = fmt.lower() == "iceberg"
    ncols = draw(st.integers(1, 4))
    cols = []
    for i in range(ncols):
        sql_t, ice_t, spark_t = draw(st.sampled_from(TYPES))
        nn = draw(st.booleans())
        cols.append((f"c{i}", sql_t, ice_t, spark_t, nn))
    part = None
    if is_ice and draw(st.booleans()):
        choices = [(cols[0][0], cols[0][0], "identity")]
        for name, _, ice_t, _, _ in cols:
            if ice_t == "date":
                # DataFusion quotes transform exprs in PARTITIONED BY
                choices += [(f"month({name})", f"{name}_month", "month"),
                            (f'"month({name})"', f"{name}_month", "month")]
            if ice_t in ("long", "int"):
                choices.append((f"bucket(4, {name})",
                                f"{name}_bucket", "bucket[4]"))
        part = draw(st.sampled_from(choices))
    eq = draw(st.sampled_from(["", "=", " = "]))
    opts = (f"'delimiter'{eq}'|', 'has_header'{eq}'true'"
            if fmt.lower() == "csv" and draw(st.booleans()) else None)
    props = "'engine.test-prop'='v1'" if draw(st.booleans()) else None
    ine = draw(st.booleans())
    ws = draw(st.sampled_from([" ", "  ", "\n "]))
    # tail clauses in a random order — the reference's scripts and
    # Spark DDL disagree on ordering, the parser must accept any
    clauses = [f"STORED{ws}AS {fmt}", f"LOCATION '@LOC@'"]
    if part:
        clauses.append(f"PARTITIONED BY ({part[0]})")
    if opts:
        clauses.append(f"OPTIONS ({opts})")
    if props:
        clauses.append(f"TBLPROPERTIES ({props})")
    clauses = draw(st.permutations(clauses))
    col_sql = ", ".join(
        f"{n} {t}{' NOT NULL' if nn else ''}"
        for n, t, _, _, nn in cols)
    return (fmt, cols, part, opts, props, ine, ws, col_sql,
            " ".join(clauses))


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=ddl_case())
def test_external_ddl_roundtrip(eng, case):
    fmt, cols, part, opts, props, ine, ws, col_sql, tail = case
    is_ice = fmt.lower() == "iceberg"
    ident = f"db.x{next(_UNIQ)}" if is_ice else f"x{next(_UNIQ)}"
    tail = tail.replace("@LOC@", eng._test_location)
    ddl = (f"CREATE EXTERNAL TABLE{ws}"
           f"{'IF NOT EXISTS ' if ine else ''}{ident}{ws}"
           f"({col_sql}){ws}{tail}")
    try:
        assert eng.sql(ddl) is None
        if ine:
            assert eng.sql(ddl) is None  # second create: clean no-op
        if is_ice:
            md = eng.catalog.load_tabular(ident.lower())
            fields = md.current_schema().fields
            assert [f.name for f in fields] == [c[0] for c in cols]
            assert [f.field_type for f in fields] == [c[2] for c in cols]
            assert [f.required for f in fields] == [c[4] for c in cols]
            if part:
                pf = md.default_spec().fields
                assert [(f.name, f.transform) for f in pf] == [
                    (part[1], part[2])]
            if props:
                assert md.properties.get("engine.test-prop") == "v1"
        else:
            df = eng._externals[ident.lower()]
            assert [f.name for f in df.schema.fields] == [
                c[0] for c in cols]
            assert [f.dataType.simpleString()
                    for f in df.schema.fields] == [c[3] for c in cols]
            # the external answers SQL through the engine's relation
            # substitution (zero rows — the location dir is empty)
            assert eng.sql(f"SELECT * FROM {ident}").count() == 0
    finally:
        eng.sql(f"DROP TABLE IF EXISTS {ident}")


def test_external_ddl_malformed_rejects_loudly(eng):
    """Malformed forms raise a typed error — never AttributeError (the
    r15 fm=None crash class) and never a silent misparse."""
    loc = eng._test_location
    # CSV/PARQUET external without LOCATION: typed refusal
    with pytest.raises(ValueError, match="LOCATION"):
        eng.sql("CREATE EXTERNAL TABLE nloc (x INT) STORED AS CSV")
    assert "nloc" not in eng._externals
    # 'stored as csv' text only INSIDE the column list: the gate runs
    # on the tail, so this falls through to the generic parser and
    # rejects — previously it crashed with AttributeError on fm=None
    with pytest.raises(Exception) as ei:
        eng.sql("CREATE EXTERNAL TABLE badcols (x INT, stored AS csv) "
                f"LOCATION '{loc}'")
    assert not isinstance(ei.value, AttributeError)
    assert "badcols" not in eng._externals
    # unsupported format keyword: loud, not a CSV misparse
    with pytest.raises(Exception) as ei:
        eng.sql("CREATE EXTERNAL TABLE badfmt (x INT) STORED AS "
                f"TEXTFILE LOCATION '{loc}'")
    assert not isinstance(ei.value, AttributeError)
    assert "badfmt" not in eng._externals
    # unbalanced column list: loud rejection
    with pytest.raises(Exception) as ei:
        eng.sql("CREATE EXTERNAL TABLE badparen (x INT STORED AS CSV "
                f"LOCATION '{loc}'")
    assert not isinstance(ei.value, AttributeError)


def test_external_ddl_using_iceberg_still_falls_through(eng):
    """`CREATE EXTERNAL TABLE … USING ICEBERG` (no STORED AS) takes the
    generic create-table branch — the r15 hand-found regression."""
    eng.sql("CREATE EXTERNAL TABLE db.ui (k BIGINT) USING ICEBERG")
    md = eng.catalog.load_tabular("db.ui")
    assert [f.name for f in md.current_schema().fields] == ["k"]
    eng.sql("DROP TABLE db.ui")
