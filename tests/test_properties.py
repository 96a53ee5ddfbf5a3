"""Property-based tests (hypothesis) for the semantics most prone to
subtle bugs: as-of matching, the inverted-index Jaccard pipeline, and
the MV incremental-refresh invariant (refresh == full recompute) under
random insert sequences. Spark jobs are slow per example, so example
counts are deliberately small — shrinking still isolates minimal
failing cases."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SLOW = settings(max_examples=int(__import__("os").environ.get("PROP_EXAMPLES", "6")), deadline=None,
                suppress_health_check=list(HealthCheck))


@SLOW
@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                  min_size=1, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                   min_size=0, max_size=15),
)
def test_asof_join_matches_bruteforce(spark, left, right):
    from iceberg_rust_archive_spark.operators.temporal import asof_join
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k long, t long, lid long")
    # unique (k, t, rid) so the matched row is deterministic
    rrows = [(k, t, i) for i, (k, t) in enumerate(right)]
    rdf = spark.createDataFrame(rrows, "k long, t long, rid long") \
        if rrows else spark.createDataFrame([], "k long, t long, rid long")

    got = {r.lid: r.rid_matched for r in asof_join(
        ldf, rdf, key="k", left_time="t", right_time="t",
        tiebreak="rid").collect()}

    for i, (k, t) in enumerate(left):
        cands = [(rt, rid) for (rk, rt, rid) in rrows
                 if rk == k and rt <= t]
        want = max(cands)[1] if cands else None  # latest t, rid tiebreak
        assert got[i] == want, (i, k, t, cands)


@SLOW
@given(docs=st.lists(
    st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=12),
    min_size=2, max_size=10))
def test_ngram_jaccard_matches_set_math(spark, docs):
    from iceberg_rust_archive_spark.operators.dedup import (
        _shingle_pairs, shingles_from_words,
    )
    texts = [" ".join(words) for words in docs]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = _shingle_pairs(d, n=2).collect()
    got = {(r.doc_a, r.doc_b):
           r.shared / (r.na + r.nb - r.shared) for r in rows}

    def shingles(words):
        return {" ".join(words[i:i + 2]) for i in range(len(words) - 1)}

    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = shingles(docs[a]), shingles(docs[b])
            inter = len(sa & sb)
            if inter == 0:
                assert (a, b) not in got
            else:
                want = inter / len(sa | sb)
                assert got[(a, b)] == pytest.approx(want), (a, b, sa, sb)


@settings(max_examples=3, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(
        st.lists(st.tuples(st.integers(0, 4), st.integers(0, 9),
                           st.integers(-50, 50)),
                 min_size=1, max_size=8),
        min_size=2, max_size=3),
)
def test_mv_incremental_equals_full_recompute(spark, tmp_path_factory,
                                              batches):
    """After any sequence of appends, an incrementally-refreshed
    aggregate MV must equal a from-scratch recompute of its SQL."""
    from iceberg_rust_archive_spark.catalog import FileCatalog
    from iceberg_rust_archive_spark.plans.engine import Engine

    eng = Engine(spark, FileCatalog(
        str(tmp_path_factory.mktemp("mvprop") / "wh")))
    eng.sql("CREATE SCHEMA db")
    eng.sql("CREATE TABLE db.t (g BIGINT, k BIGINT, v BIGINT)")
    q = ("SELECT g, sum(v) AS sv, count(k) AS ck, min(v) AS mn, "
         "max(v) AS mx FROM db.t GROUP BY g")
    eng.sql(f"CREATE MATERIALIZED VIEW db.mvp AS {q}")

    for batch in batches:
        vals = ", ".join(f"({g}, {k}, {v})" for g, k, v in batch)
        eng.sql(f"INSERT INTO db.t VALUES {vals}")
        eng.refresh_materialized_view("db.mvp")
        mv = {tuple(r) for r in
              eng.sql("SELECT g, sv, ck, mn, mx FROM db.mvp").collect()}
        direct = {tuple(r) for r in eng.sql(q).collect()}
        assert mv == direct, (batches, mv, direct)


def _rwp_op():
    rows = st.lists(st.tuples(st.integers(0, 9), st.integers(0, 1),
                              st.integers(1, 9)),
                    min_size=1, max_size=4)
    keys = st.lists(st.integers(0, 9), min_size=1, max_size=3,
                    unique=True)
    return st.one_of(
        st.tuples(st.just("append"), rows),
        st.tuples(st.just("del_eq"), keys, st.integers(0, 1)),
        st.tuples(st.just("del_pos"), keys, st.booleans()),
        st.tuples(st.just("rewrite"), st.integers(0, 1)),
    )


@SLOW
@given(ops=st.lists(_rwp_op(), min_size=1, max_size=5))
def test_rewrite_partition_preserves_state(spark, tmp_path_factory,
                                           ops):
    """r9 invariant: partition-scoped delete-absorbing compaction is
    INVISIBLE to readers — after any op sequence mixing appends,
    partition-scoped equality deletes, position deletes (parquet and
    DV), and rewrite_partition calls, the scan equals a pure-Python
    multiset model (compaction is never observable in query
    results)."""
    import datetime as dtm
    from collections import Counter

    from pyspark.sql import functions as F

    from iceberg_rust_archive_spark.catalog import FileCatalog
    from iceberg_rust_archive_spark.maintenance import rewrite_partition
    from iceberg_rust_archive_spark.predicates import Pred
    from iceberg_rust_archive_spark.spec import (
        NestedField, PartitionField, PartitionSpec, Schema,
        StructTypeSpec,
    )
    from iceberg_rust_archive_spark.table import Table

    days = [dtm.date(2022, 5, 1), dtm.date(2022, 6, 2)]
    wh = tmp_path_factory.mktemp("rwp-prop")
    cat = FileCatalog(str(wh / "wh"))
    schema = Schema(0, StructTypeSpec((
        NestedField(1, "k", "long", True),
        NestedField(2, "d", "date", True),
        NestedField(3, "v", "long", False))))
    spec = PartitionSpec(0, (PartitionField(2, 1000, "d_day", "day"),))
    t = Table.create(cat, "db.rwp", schema, spec)

    state: Counter = Counter()  # multiset of live (k, date, v)

    def check():
        got = Counter((r.k, r.d, r.v)
                      for r in t.scan(spark).collect())
        assert got == state, (ops, got, state)

    for op in ops:
        kind = op[0]
        if kind == "append":
            rows = [(k, days[di], v) for k, di, v in op[1]]
            t = t.append(spark, spark.createDataFrame(
                rows, "k long, d date, v long"))
            state.update(rows)
        elif kind == "del_eq":
            keys, di = op[1], op[2]
            day = days[di]
            t = t.delete_where_equal(
                spark,
                spark.createDataFrame([(k, day) for k in keys],
                                      ["k", "d"]),
                ["k", "d"])
            removed = Counter({r: n for r, n in state.items()
                               if r[0] in set(keys) and r[1] == day})
            state.subtract(removed)
            state = +state
        elif kind == "del_pos":
            keys, use_dv = op[1], op[2]
            t = t.delete_where_pos(
                spark, F.col("k").isin([int(x) for x in keys]),
                use_dv=use_dv)
            removed = Counter({r: n for r, n in state.items()
                               if r[0] in set(keys)})
            state.subtract(removed)
            state = +state
        else:  # rewrite one day's partition
            day = days[op[1]]
            t = rewrite_partition(spark, t, [Pred("d", "=", day)])
        t = t.refresh()
        check()


def _ujmv_op():
    frows = st.lists(st.tuples(st.integers(0, 5), st.integers(1, 9)),
                     min_size=1, max_size=3)
    drows = st.lists(st.integers(0, 5), min_size=1, max_size=2,
                     unique=True)
    return st.one_of(
        st.tuples(st.just("ins_a"), frows),
        st.tuples(st.just("ins_b"), frows),
        st.tuples(st.just("ins_dim"), drows),
        st.tuples(st.just("del_a"), st.integers(0, 5)),
        st.tuples(st.just("del_dim"), st.integers(0, 5)),
    )


@SLOW
@given(ops=st.lists(_ujmv_op(), min_size=1, max_size=5))
def test_union_join_mv_matches_recompute(spark, tmp_path_factory, ops):
    """r9 invariant: an aggregate MV over (A UNION ALL B) JOIN dim
    equals a from-scratch recompute after ANY op sequence mixing fact
    inserts into either branch, dim inserts, and fact/dim deletes —
    covering the PosDelta triangle (branch passes + outer-dim pass)
    AND the weighted-changelog retraction through the joined union."""
    from iceberg_rust_archive_spark.catalog import FileCatalog
    from iceberg_rust_archive_spark.plans.engine import Engine

    eng = Engine(spark, FileCatalog(
        str(tmp_path_factory.mktemp("ujmvprop") / "wh")))
    eng.sql("CREATE SCHEMA db")
    eng.sql("CREATE TABLE db.fa (k BIGINT, v BIGINT)")
    eng.sql("CREATE TABLE db.fb (k BIGINT, v BIGINT)")
    eng.sql("CREATE TABLE db.dim (k BIGINT, name VARCHAR)")
    eng.sql("INSERT INTO db.fa VALUES (0, 1)")
    eng.sql("INSERT INTO db.dim VALUES (0, 'n0')")
    q = ("SELECT d.name, count(*) AS n, sum(u.v) AS sv "
         "FROM ( SELECT k, v FROM db.fa UNION ALL "
         "SELECT k, v * 2 AS v FROM db.fb ) u "
         "JOIN db.dim d ON u.k = d.k GROUP BY d.name")
    eng.sql(f"CREATE MATERIALIZED VIEW db.ujp AS {q}")
    eng.refresh_materialized_view("db.ujp")

    next_dim = [1]
    for op in ops:
        kind = op[0]
        if kind in ("ins_a", "ins_b"):
            tbl = "db.fa" if kind == "ins_a" else "db.fb"
            vals = ", ".join(f"({k}, {v})" for k, v in op[1])
            eng.sql(f"INSERT INTO {tbl} VALUES {vals}")
        elif kind == "ins_dim":
            rows = [k for k in op[1]]
            vals = ", ".join(
                f"({k}, 'n{next_dim[0] + i}')"
                for i, k in enumerate(rows))
            next_dim[0] += len(rows)
            eng.sql(f"INSERT INTO db.dim VALUES {vals}")
        elif kind == "del_a":
            eng.sql(f"DELETE FROM db.fa WHERE k = {op[1]}")
        else:
            eng.sql(f"DELETE FROM db.dim WHERE k = {op[1]}")
        eng.refresh_materialized_view("db.ujp")
        mv = sorted(tuple(r) for r in
                    eng.sql("SELECT name, n, sv FROM db.ujp").collect())
        direct = sorted(tuple(r) for r in eng.sql(q).collect())
        assert mv == direct, (ops, mv, direct)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12),
       st.sampled_from([1, 3, 4]), st.integers(0, 2**31 - 1))
def test_png_codec_roundtrip_property(h, w, ch, seed):
    """decode(encode(x)) == x for arbitrary small images across all
    channel counts — the encoder cycles every PNG filter type, so
    height ≥ 5 cases exercise Paeth/Average/Up/Sub unfilters too."""
    import numpy as np

    from iceberg_rust_archive_spark.operators.multimodal import (
        decode_png, encode_png,
    )
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    out = decode_png(encode_png(arr))
    assert out.shape == (h, w, ch)
    assert (out == arr).all()


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_trunc_upper_is_valid_upper_bound(s):
    """For any string, the truncated upper bound must be UTF-8
    encodable and ≥ the original (or dropped): the manifest-stats
    invariant that makes file pruning sound."""
    from iceberg_rust_archive_spark.sources.stats import (
        TRUNCATE_BOUND_LEN, _trunc_lower, _trunc_upper,
    )
    up = _trunc_upper(s)
    lo = _trunc_lower(s)
    if up is not None:
        up.encode("utf-8")          # never a lone surrogate
        assert up >= s or len(s) <= TRUNCATE_BOUND_LEN
    assert lo <= s


@SLOW
@given(
    tgt=st.lists(st.tuples(st.integers(0, 6), st.integers(-20, 20)),
                 min_size=0, max_size=10, unique_by=lambda r: r[0]),
    src=st.lists(st.tuples(st.integers(0, 6), st.integers(-20, 20)),
                 min_size=0, max_size=10, unique_by=lambda r: r[0]),
    thresh=st.integers(-10, 10),
)
def test_merge_general_matches_model(spark, tmp_path_factory, tgt, src,
                                     thresh):
    """General MERGE vs a Python reference model over random tables:

        WHEN MATCHED AND s.v < thresh THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = t.v + s.v
        WHEN NOT MATCHED AND s.v >= thresh THEN INSERT *

    (unique keys per side — Iceberg MERGE semantics require an
    unambiguous source match)."""
    from iceberg_rust_archive_spark.catalog import FileCatalog
    from iceberg_rust_archive_spark.plans.engine import Engine

    wh = tmp_path_factory.mktemp("merge-prop")
    eng = Engine(spark, FileCatalog(str(wh / "wh")))
    eng.sql("CREATE SCHEMA db")
    eng.sql("CREATE TABLE db.m (k BIGINT, v BIGINT)")
    if tgt:
        eng.sql("INSERT INTO db.m VALUES "
                + ",".join(f"({k},{v})" for k, v in tgt))
    (spark.createDataFrame(src, "k long, v long") if src
     else spark.createDataFrame([], "k long, v long")
     ).createOrReplaceTempView("merge_prop_src")

    eng.sql(f"""
        MERGE INTO db.m t USING merge_prop_src s ON t.k = s.k
        WHEN MATCHED AND s.v < {thresh} THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = t.v + s.v
        WHEN NOT MATCHED AND s.v >= {thresh} THEN INSERT *
    """)

    model = dict(tgt)
    smap = dict(src)
    for k, sv in smap.items():
        if k in model:
            if sv < thresh:
                del model[k]
            else:
                model[k] = model[k] + sv
        elif sv >= thresh:
            model[k] = sv

    got = {r.k: r.v for r in eng.sql("SELECT k, v FROM db.m").collect()}
    assert got == model
    eng.sql("DROP TABLE db.m")
    eng.sql("DROP SCHEMA db")


# --- pure-function properties (no Spark per example → many examples) ---

@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(0, 500),
    width=st.integers(1, 60),
    overlap_frac=st.floats(0, 0.99),
)
def test_chunk_boundary_math_covers_exactly(n, width, overlap_frac):
    """The chunk-count formula (1 if L<=W else ceil((L-W)/S)+1) always
    yields windows that (a) cover every character, (b) never start past
    the end, (c) overlap consecutive windows by exactly `overlap` except
    possibly the last."""
    overlap = min(int(width * overlap_frac), width - 1)
    stride = width - overlap
    n_chunks = 1 if n <= width else -(-(n - width) // stride) + 1
    starts = [i * stride for i in range(n_chunks)]
    covered = set()
    for s_ in starts:
        covered.update(range(s_, min(s_ + width, n)))
    assert covered == set(range(n))
    assert all(s_ < max(n, 1) for s_ in starts)
    # minimality: one fewer window would leave a tail uncovered
    if n_chunks > 1:
        assert (n_chunks - 2) * stride + width < n


@settings(max_examples=300, deadline=None)
@given(
    values=st.lists(st.one_of(st.integers(-50, 50), st.none()),
                    min_size=1, max_size=30),
    op=st.sampled_from(["=", "!=", "<", "<=", ">", ">=", "in",
                        "is_null", "not_null"]),
    lit=st.integers(-50, 50),
    lit2=st.integers(-50, 50),
)
def test_file_fully_matches_is_sound(values, op, lit, lit2):
    """If file_fully_matches says yes, EVERY row of the simulated file
    satisfies the predicate — the soundness requirement behind the
    metadata-only count (an unsound yes = silently wrong counts)."""
    from iceberg_rust_archive_spark.predicates import (
        Pred, file_fully_matches,
    )
    from iceberg_rust_archive_spark.spec import (
        NestedField, Schema, StructTypeSpec,
    )
    from iceberg_rust_archive_spark.spec.manifest import DataFile
    schema = Schema(0, StructTypeSpec((
        NestedField(1, "x", "int", True),)))
    non_null = [v for v in values if v is not None]
    f = DataFile(
        content=0, file_path="/f", file_format="parquet", partition={},
        record_count=len(values), file_size_in_bytes=1,
        column_sizes={}, value_counts={1: len(values)},
        null_value_counts={1: len(values) - len(non_null)},
        lower_bounds={1: min(non_null)} if non_null else {},
        upper_bounds={1: max(non_null)} if non_null else {})
    pval = [lit, lit2] if op == "in" else lit
    p = Pred("x", op, None if op in ("is_null", "not_null") else pval)

    def sat(v):
        if op == "is_null":
            return v is None
        if v is None:
            return False
        if op == "not_null":
            return True
        if op == "in":
            return v in pval
        return {"=": v == lit, "!=": v != lit, "<": v < lit,
                "<=": v <= lit, ">": v > lit, ">=": v >= lit}[op]

    if file_fully_matches([p], schema, f):
        assert all(sat(v) for v in values), \
            f"unsound full-match: {op} {pval} over {values}"


@given(positions=st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=2**16),          # container 0
        st.integers(min_value=0, max_value=2**32 - 1),      # any 32-bit
        st.integers(min_value=2**32, max_value=2**34),      # bucket 1+
        st.builds(lambda k: k * 65536, st.integers(0, 70)), # boundaries
    ), max_size=3000))
@settings(max_examples=60, deadline=None)
def test_roaring_roundtrip_property(positions):
    """Deletion-vector serialization is lossless for ANY u64 position
    set: deserialize(serialize(S)) == sorted(set(S)) across container
    types (array/bitmap), container boundaries, and 4 GiB buckets."""
    from iceberg_rust_archive_spark.sources.roaring import (
        deserialize_positions, serialize_positions,
    )
    assert deserialize_positions(serialize_positions(positions)) \
        == sorted(set(positions))


@given(dense_start=st.integers(min_value=0, max_value=2**20),
       n=st.integers(min_value=4097, max_value=9000))
@settings(max_examples=10, deadline=None)
def test_roaring_dense_runs_stay_compact(dense_start, n):
    """A dense run serializes via bitmap containers: ≤ ~8 KiB per 64k
    block plus headers, never 2 bytes/value array growth."""
    from iceberg_rust_archive_spark.sources.roaring import (
        serialize_positions,
    )
    vals = list(range(dense_start, dense_start + n))
    blocks = len({v >> 16 for v in vals})
    assert len(serialize_positions(vals)) <= blocks * 8192 + 64 * blocks + 64


# --- changelog ordering property (r7 verdict next #8) -------------------

def _chg_op():
    rows = st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)),
                    min_size=1, max_size=4)
    keys = st.lists(st.integers(0, 5), min_size=1, max_size=3,
                    unique=True)
    # files-per-commit 1..4: the merged-DV double-retraction bug hid
    # for ten rounds because every append drew coalesce(1) — the model
    # must draw BOTH shared-file shapes (several del_pos commits
    # DV-merging against one file) and multi-file shapes (one delete
    # spanning file boundaries)
    nfiles = st.integers(1, 4)
    return st.one_of(
        st.tuples(st.just("append"), rows, nfiles),
        st.tuples(st.just("del_eq"), keys),
        st.tuples(st.just("del_pos"), keys, st.booleans()),  # use_dv
        st.tuples(st.just("upsert"), rows),
    )


@SLOW
@given(ops=st.lists(_chg_op(), min_size=1, max_size=5))
def test_changelog_matches_model(spark, tmp_path_factory, ops):
    """Table.changes vs a Python multiset model over random commit
    sequences mixing appends, equality deletes, position deletes (both
    parquet-pair and deletion-vector formats) and one-commit upserts —
    the foundation under all three changelog MV strategies:

    - per commit, the (inserts, deletes) event multisets match the
      model exactly (deletes surface the REMOVED ROWS, not keys);
    - ``_change_ordinal`` is each commit's sequence number: strictly
      monotone in commit order, shared by all of a commit's events;
    - replaying the changelog in ordinal order from empty reproduces
      the final table state (the property incremental consumers rely
      on)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from iceberg_rust_archive_spark.catalog import FileCatalog
    from iceberg_rust_archive_spark.spec import (
        NestedField, PartitionSpec, Schema, StructTypeSpec,
    )
    from iceberg_rust_archive_spark.table import Table

    wh = tmp_path_factory.mktemp("chg-prop")
    cat = FileCatalog(str(wh / "wh"))
    schema = Schema(0, StructTypeSpec((
        NestedField(1, "k", "long", True),
        NestedField(2, "v", "long", False))))
    t = Table.create(cat, "db.chg", schema, PartitionSpec(0, ()),
                     properties={"identifier-fields": "k"})

    state: Counter = Counter()          # multiset of live (k, v) rows
    expected: list[tuple[Counter, Counter]] = []  # (inserts, deletes)

    def snap_count():
        return len(t.metadata.snapshots)

    for op in ops:
        kind = op[0]
        before = snap_count()
        if kind == "append":
            rows = list(op[1])
            # drawn files-per-commit: nf=1 keeps successive del_pos
            # commits hitting the SAME file (they must DV-merge — the
            # r11 double-retraction shape), nf>1 spreads rows so one
            # delete spans file boundaries
            nf = min(op[2], len(rows))
            t.append(spark, spark.createDataFrame(
                rows, "k long, v long").repartition(nf))
            state.update(rows)
            expected.append((Counter(rows), Counter()))
        elif kind == "del_eq":
            keys = op[1]
            t.delete_where_equal(
                spark, spark.createDataFrame([(k,) for k in keys], ["k"]),
                ["k"])
            removed = Counter({r: n for r, n in state.items()
                               if r[0] in set(keys)})
            state.subtract(removed)
            state = +state
            expected.append((Counter(), removed))
        elif kind == "del_pos":
            keys, use_dv = op[1], op[2]
            t.delete_where_pos(spark, F.col("k").isin([int(x) for x in keys]),
                               use_dv=use_dv)
            removed = Counter({r: n for r, n in state.items()
                               if r[0] in set(keys)})
            if not removed:
                assert snap_count() == before  # no-op commits nothing
                continue
            state.subtract(removed)
            state = +state
            expected.append((Counter(), removed))
        else:  # one-commit upsert on key k
            rows = list(op[1])
            latest = {}
            for k, v in rows:
                latest[k] = v  # upsert keeps the last source row per key
            rows = sorted(latest.items())
            t.upsert(spark, spark.createDataFrame(rows, "k long, v long"),
                     keys=["k"])
            removed = Counter({r: n for r, n in state.items()
                               if r[0] in latest})
            state.subtract(removed)
            state = +state
            state.update(rows)
            expected.append((Counter(rows), removed))
        t = t.refresh()

    events = t.changes(spark).collect()
    by_ord: dict[int, list] = {}
    for e in events:
        by_ord.setdefault(e["_change_ordinal"], []).append(e)

    # one ordinal per expected commit, strictly increasing, snapshot-tied
    ordinals = sorted(by_ord)
    assert len(ordinals) == sum(
        1 for ins, dels in expected if ins or dels)
    want_iter = [x for x in expected if x[0] or x[1]]
    for o, (ins_want, del_want) in zip(ordinals, want_iter):
        evs = by_ord[o]
        assert len({e["_commit_snapshot_id"] for e in evs}) == 1
        snap = t.metadata.snapshot_by_id(evs[0]["_commit_snapshot_id"])
        assert snap.sequence_number == o
        ins_got = Counter((e["k"], e["v"]) for e in evs
                          if e["_change_type"] == "insert")
        del_got = Counter((e["k"], e["v"]) for e in evs
                          if e["_change_type"] == "delete")
        assert ins_got == ins_want, f"ordinal {o} inserts"
        assert del_got == del_want, f"ordinal {o} deletes"

    # replay from empty in ordinal order reproduces the final state
    replay: Counter = Counter()
    for o in ordinals:
        for e in by_ord[o]:
            if e["_change_type"] == "insert":
                replay[(e["k"], e["v"])] += 1
            else:
                replay[(e["k"], e["v"])] -= 1
    replay = +replay
    assert replay == state
    got_rows = Counter((r["k"], r["v"])
                       for r in t.scan(spark).collect())
    assert got_rows == state


# --- partition-scoped merge-on-read (r11 single-pass rewrite) ---------------

def _pmor_op():
    rows = st.lists(st.tuples(st.integers(0, 3), st.integers(0, 6)),
                    min_size=1, max_size=4)
    ks = st.lists(st.integers(0, 3), min_size=1, max_size=2, unique=True)
    vs = st.lists(st.integers(0, 6), min_size=1, max_size=2, unique=True)
    return st.one_of(
        st.tuples(st.just("append"), rows),
        st.tuples(st.just("del_k"), ks),      # partition-SCOPED eq delete
        st.tuples(st.just("del_v"), vs),      # GLOBAL eq delete
        st.tuples(st.just("del_pos"), ks, st.booleans()),
        st.tuples(st.just("upsert"), rows),
        st.tuples(st.just("update"), ks),     # DV-routed UPDATE (r11)
        # r12: partition-spec evolution mid-sequence — deletes written
        # AFTER it must still hit rows in old-spec files (the writer
        # falls back to GLOBAL deletes once the tuple is no longer
        # lossless; the r12 lossless-only rule exists because exactly
        # this sequence silently lost deletes before)
        st.tuples(st.just("evolve"), st.just(None)),
    )


@SLOW
@given(ops=st.lists(_pmor_op(), min_size=2, max_size=5))
def test_partitioned_mor_matches_model(spark, tmp_path_factory, ops):
    """Scan of an identity(k)-partitioned table vs a Python multiset
    model over random commit sequences. Each sequence mixes the shapes
    the r11 single-pass merge-on-read resolves with ONE sequence-tagged
    relation: partition-SCOPED equality deletes (eq columns include the
    partition source, so the writer stamps each delete file with its
    partition tuple and the scan must apply it only inside that
    partition), GLOBAL equality deletes (eq columns exclude k — all-null
    partition tuple applies table-wide), position deletes / deletion
    vectors, and upserts; appends after deletes populate the
    newer-than-every-delete 'clear' branch. The batch chain this
    replaced was per-(stratum × partition); equivalence here pins the
    rewrite's residual-condition join (operators/scan.py:583-626)."""
    from collections import Counter

    from iceberg_rust_archive_spark.catalog import FileCatalog
    from iceberg_rust_archive_spark.spec import (
        NestedField, PartitionField, PartitionSpec, Schema,
        StructTypeSpec,
    )
    from iceberg_rust_archive_spark.table import Table

    wh = tmp_path_factory.mktemp("pmor-prop")
    cat = FileCatalog(str(wh / "wh"))
    schema = Schema(0, StructTypeSpec((
        NestedField(1, "k", "long", True),
        NestedField(2, "v", "long", False))))
    spec = PartitionSpec(0, (PartitionField(1, 1000, "k", "identity"),))
    t = Table.create(cat, "db.pmor", schema, spec,
                     properties={"identifier-fields": "k"})

    state: Counter = Counter()  # multiset of live (k, v) rows
    for op in ops:
        kind = op[0]
        if kind == "append":
            rows = list(op[1])
            t.append(spark, spark.createDataFrame(rows, "k long, v long"))
            state.update(rows)
        elif kind == "del_k":
            keys = set(op[1])
            t.delete_where_equal(
                spark,
                spark.createDataFrame([(k,) for k in sorted(keys)], ["k"]),
                ["k"])
            state = +Counter({r: n for r, n in state.items()
                              if r[0] not in keys})
        elif kind == "del_v":
            vals = set(op[1])
            t.delete_where_equal(
                spark,
                spark.createDataFrame([(v,) for v in sorted(vals)], ["v"]),
                ["v"])
            state = +Counter({r: n for r, n in state.items()
                              if r[1] not in vals})
        elif kind == "del_pos":
            keys, use_dv = set(op[1]), op[2]
            t.delete_where_pos(
                spark, F.col("k").isin([int(x) for x in sorted(keys)]),
                use_dv=use_dv)
            state = +Counter({r: n for r, n in state.items()
                              if r[0] not in keys})
        elif kind == "upsert":  # upsert on key k
            latest = {}
            for k, v in op[1]:
                latest[k] = v
            rows = sorted(latest.items())
            t.upsert(spark, spark.createDataFrame(rows, "k long, v long"),
                     keys=["k"])
            state = +Counter({r: n for r, n in state.items()
                              if r[0] not in latest})
            state.update(rows)
        elif kind == "update":  # DV-routed UPDATE: v += 100 where k ∈ ks
            keys = set(op[1])
            pred = "k IN (" + ",".join(str(k) for k in sorted(keys)) + ")"
            t.update_where_pos(spark, pred, {"v": "v + 100"})
            nxt: Counter = Counter()
            for (k, v), n in state.items():
                nxt[(k, v + 100) if k in keys else (k, v)] += n
            state = nxt
        else:  # evolve: add truncate(2, v) to the partition spec — a
            # metadata-only commit; rows are unchanged but every LATER
            # eq delete must go global (lossless-only scoping) and
            # still hit old-spec files
            if len(t.metadata.partition_specs) == 1:
                t.new_transaction().update_spec([
                    *t.metadata.default_spec().fields,
                    PartitionField(2, 0, "v_trunc", "truncate[2]"),
                ]).commit()
        t = t.refresh()

    got = Counter((r["k"], r["v"]) for r in t.scan(spark).collect())
    assert got == state, (ops,)
    # point-scan with a partition predicate resolves the same state
    # through the pruned plan (scoped deletes must still apply)
    from iceberg_rust_archive_spark.predicates import Pred
    got0 = Counter((r["k"], r["v"])
                   for r in t.scan(spark, filter=[Pred("k", "=", 0)])
                   .collect())
    assert got0 == Counter({r: n for r, n in state.items() if r[0] == 0})
    # changelog replay from empty reproduces the same state — the
    # partition-SCOPED eq resolution and merged-DV dedup must hold
    # through the CDC surface too (r11 fixes)
    replay: Counter = Counter()
    for e in t.changes(spark).collect():
        replay[(e["k"], e["v"])] += (1 if e["_change_type"] == "insert"
                                     else -1)
    assert +replay == state, (ops,)


# --- pruning soundness (r11: parsed-literal type gate) ---------------------

_PRUNE_COLS = [("s", 1, "string"), ("i", 2, "long"),
               ("x", 3, "double")]

_FLOAT_SPECIALS = (float("nan"), float("inf"), float("-inf"))


def _prune_lit():
    # literals INCLUDING the parser-skew shapes: numeric-looking
    # strings and ints against either column
    return st.one_of(
        st.integers(-5, 20005),
        st.text(alphabet="0123456789ab", min_size=1, max_size=5),
    )


def _float_lit():
    return st.one_of(st.floats(-10, 10, allow_nan=False),
                     st.sampled_from(_FLOAT_SPECIALS))


def _prune_pred():
    return st.one_of(
        st.tuples(st.sampled_from(["s", "i"]),
                  st.sampled_from(["=", "<", "<=", ">", ">=", "in",
                                   "is_null"]),
                  st.lists(_prune_lit(), min_size=1, max_size=3)),
        st.tuples(st.just("x"),
                  st.sampled_from(["=", "<", "<=", ">", ">=", "in",
                                   "is_null"]),
                  st.lists(_float_lit(), min_size=1, max_size=3)),
    )


@settings(max_examples=300, deadline=None)
@given(
    files=st.lists(st.lists(st.tuples(
        st.one_of(st.none(), st.text(alphabet="0123456789ab",
                                     min_size=1, max_size=5)),
        st.one_of(st.none(), st.integers(-5, 20005)),
        st.one_of(st.none(), st.floats(-10, 10, allow_nan=False),
                  st.sampled_from(_FLOAT_SPECIALS))),
        min_size=1, max_size=5), min_size=1, max_size=4),
    preds=st.lists(_prune_pred(), min_size=1, max_size=3),
    # truncate[1] collides heavily (12-char alphabet) so strict <;>
    # predicates OFF the truncation boundary — the r13 inclusive-
    # projection bug class — are reachable in few examples
    transform=st.sampled_from(["identity", "bucket[8]", "truncate[2]",
                               "truncate[1]"]),
)
def test_pruning_soundness_vs_row_eval(files, preds, transform):
    """Pruning may never drop a file that CONTAINS a matching row —
    for any mix of literal types (including the pyspark-Column parser
    skew of r11: int literals against string columns and vice versa),
    bounds pruning, exact-partition-value pruning, and manifest
    FieldSummary pruning must all keep every file holding a row that
    satisfies the conjunction. Matching follows SQL comparison
    semantics (incomparable types / NULLs never match)."""
    from iceberg_rust_archive_spark.functions.transforms import (
        transform_value,
    )
    from iceberg_rust_archive_spark.predicates import (
        Pred, prune_datafiles, prune_manifests,
    )
    from iceberg_rust_archive_spark.spec import (
        NestedField, PartitionField, PartitionSpec, Schema,
        StructTypeSpec,
    )
    from iceberg_rust_archive_spark.spec.manifest import (
        DataFile, FieldSummary, ManifestListEntry,
    )

    schema = Schema(0, StructTypeSpec(tuple(
        NestedField(fid, name, typ, True)
        for name, fid, typ in _PRUNE_COLS)))
    # partition on the string column under the drawn transform
    spec = PartitionSpec(0, (PartitionField(1, 1000, "p", transform),))

    # a partitioned WRITE splits rows by transformed partition value —
    # one file per (drawn file × partition value) group — so every
    # file's rows agree with its partition tuple. (A straddling file
    # can't occur in a real layout, and partition-value pruning is
    # entitled to assume the invariant: an earlier fixture that stamped
    # the FIRST row's transform over a mixed file produced exactly the
    # invalid shape and flagged sound pruning as a false positive.)
    plist, file_rows = [], []
    for rows in files:
        groups: dict = {}
        for r in rows:
            pv = transform_value(transform, r[0], "string") \
                if r[0] is not None else None
            groups.setdefault(pv, []).append(r)
        for pv, grp in groups.items():
            import math as _m
            svals = [r[0] for r in grp]
            ivals = [r[1] for r in grp]
            xvals = [r[2] for r in grp]
            sv = [v for v in svals if v is not None]
            iv = [v for v in ivals if v is not None]
            # the harvested float bounds mirror sources/stats.py: NaN
            # never enters min/max (parquet skips it) and an ±inf
            # extreme drops the bound in its unrepresentable direction
            xv = [v for v in xvals if v is not None and not _m.isnan(v)]
            xlo = {3: min(xv)} if xv and min(xv) != float("-inf") else {}
            xhi = {3: max(xv)} if xv and max(xv) != float("inf") else {}
            plist.append(DataFile(
                0, f"/f{len(plist)}.parquet", "parquet", {"p": pv},
                len(grp), 1,
                value_counts={1: len(grp), 2: len(grp), 3: len(grp)},
                null_value_counts={
                    1: len(svals) - len(sv),
                    2: len(ivals) - len(iv),
                    3: sum(1 for v in xvals if v is None)},
                lower_bounds={**({1: min(sv)} if sv else {}),
                              **({2: min(iv)} if iv else {}), **xlo},
                upper_bounds={**({1: max(sv)} if sv else {}),
                              **({2: max(iv)} if iv else {}), **xhi}))
            file_rows.append(grp)

    pred_objs = []
    for col, op, lits in preds:
        if op == "in":
            pred_objs.append(Pred(col, "in", tuple(lits)))
        elif op == "is_null":
            pred_objs.append(Pred(col, "is_null", None))
        else:
            pred_objs.append(Pred(col, op, lits[0]))

    import math as _m

    def _fkey(v):
        # Spark total order for floating point: NaN sorts LARGEST and
        # NaN = NaN is true
        return (1, 0.0) if _m.isnan(v) else (0, v)

    def row_matches(row):
        vals = {"s": row[0], "i": row[1], "x": row[2]}
        for p in pred_objs:
            v = vals[p.column]
            if p.op == "is_null":
                if v is not None:
                    return False
                continue
            if v is None:
                return False
            use_f = p.column == "x" and isinstance(v, float)
            try:
                k = _fkey(v) if use_f else v

                def _lit(x):
                    return _fkey(x) if use_f and isinstance(x, float) \
                        else x
                if p.op == "=":
                    ok = k == _lit(p.value)
                elif p.op == "in":
                    ok = any(k == _lit(x) for x in p.value)
                elif p.op == "<":
                    ok = k < _lit(p.value)
                elif p.op == "<=":
                    ok = k <= _lit(p.value)
                elif p.op == ">":
                    ok = k > _lit(p.value)
                else:
                    ok = k >= _lit(p.value)
            except TypeError:
                return False  # SQL: cross-type comparison never matches
            if not ok:
                return False
        return True

    must_keep = {f.file_path for f, rows in zip(plist, file_rows)
                 if any(row_matches(r) for r in rows)}

    kept = {f.file_path
            for f in prune_datafiles(pred_objs, schema, plist, spec)}
    assert must_keep <= kept, (must_keep - kept, pred_objs, files)

    # manifest-level: ONE manifest whose FieldSummary covers all files
    pvs = [f.partition["p"] for f in plist if f.partition["p"] is not None]
    comparable = pvs and all(type(v) is type(pvs[0]) for v in pvs)
    summary = FieldSummary(
        contains_null=any(f.partition["p"] is None for f in plist),
        contains_nan=False,
        lower_bound=min(pvs) if comparable else None,
        upper_bound=max(pvs) if comparable else None)
    mle = ManifestListEntry(
        "m.avro", 1, 0, 0, 1, 0, 1,
        added_files_count=len(plist),
        added_rows_count=sum(f.record_count for f in plist),
        partitions=(summary,))
    surviving = prune_manifests(pred_objs, spec, schema, [mle])
    if must_keep:
        assert surviving, (pred_objs, files)


# --- SQL shim top-level splitter (r12: replaced the comma regex at all
# seven engine sites — this model pins the primitive itself) -----------

def _sql_expr(depth=3):
    """Expressions with NO top-level comma: atoms, quoted runs of all
    three Spark kinds ('…' / "…" string literals, `…` identifiers —
    commas, parens, dashes, the OTHER quote chars, and doubled-quote
    escapes inside), f(a, b) calls, (a + b) parens."""
    _junk = "ab,()-- %"

    def _quoted(q):
        return st.text(alphabet=_junk + "'\"`".replace(q, ""),
                       min_size=0, max_size=8).map(
            lambda t: q + t.replace(q, q * 2) + q)

    atoms = st.one_of(
        st.from_regex(r"[a-z_][a-z0-9_]{0,6}", fullmatch=True),
        st.integers(-999, 999).map(str),
        st.text(alphabet=_junk + '"`', min_size=0, max_size=8).map(
            lambda t: "'" + t.replace("'", "''") + "'"),
        _quoted('"'),
        _quoted("`"),
    )
    if depth <= 0:
        return atoms
    sub = st.deferred(lambda: _sql_expr(depth - 1))
    return st.one_of(
        atoms,
        st.tuples(sub, sub).map(lambda p: f"f({p[0]}, {p[1]})"),
        st.tuples(sub, sub).map(lambda p: f"({p[0]} + {p[1]})"),
        st.tuples(sub, sub).map(lambda p: f"g(({p[0]}), {p[1]})"),
    )


@settings(max_examples=300, deadline=None)
@given(st.lists(_sql_expr(), min_size=1, max_size=6))
def test_split_top_inverts_comma_join(exprs):
    from iceberg_rust_archive_spark.predicates import _split_top

    joined = ",".join(exprs)
    assert _split_top(joined, ",") == exprs
    # lossless: concatenating the parts with the separator restores
    # the input even when parts are empty or whitespace
    parts = _split_top(joined, ",")
    assert ",".join(parts) == joined


@settings(max_examples=200, deadline=None)
@given(st.lists(_sql_expr(2), min_size=2, max_size=4),
       st.sampled_from([" OR ", " AND "]))
def test_split_top_word_separator_respects_quotes(exprs, sep):
    """Word separators (the predicate parser's ' OR ' refusal) must not
    match inside quoted strings or parens."""
    from iceberg_rust_archive_spark.predicates import _split_top

    # embed the separator text INSIDE a quoted atom of each expr: it
    # must never produce an extra split
    decoys = [f"'{sep.strip().lower()},{sep}'" for _ in exprs]
    joined = sep.join(f"h({d}, {e})" for d, e in zip(decoys, exprs))
    parts = _split_top(joined, sep)
    assert len(parts) == len(exprs)
    assert sep.join(parts) == joined


@settings(max_examples=200, deadline=None)
@given(st.lists(_sql_expr(2), min_size=1, max_size=4))
def test_sub_outside_quotes_preserves_literals(exprs):
    """MERGE's target-qualifier normalization must rewrite ONLY outside
    quoted runs: splice `db.t.` decoys into quoted atoms of every kind
    around real qualifier references — the quoted occurrences survive
    verbatim, the bare ones rewrite, and stripping the substitution
    target from both sides leaves identical text."""
    import re

    from iceberg_rust_archive_spark.plans.engine import _sub_outside_quotes

    rx = re.compile(r"\bdb\.t\.", re.IGNORECASE)
    decoys = ["'see db.t.k'", '"db.t. in a string"', "`db.t.weird`"]
    joined = " + ".join(f"{decoys[i % 3]} + db.t.c{i} + {e}"
                        for i, e in enumerate(exprs))
    out = _sub_outside_quotes(rx, "t.", joined)
    # every quoted decoy survives verbatim
    for d in decoys[:min(len(exprs), 3)]:
        assert d in out
    # every bare qualifier is rewritten
    for i in range(len(exprs)):
        assert f" t.c{i} " in out + " "
        assert f" db.t.c{i}" not in out


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    chunks=st.lists(
        st.lists(st.tuples(st.one_of(st.none(), st.integers(-50, 50)),
                           st.integers(0, 1500)),
                 min_size=1, max_size=6),
        min_size=1, max_size=3),
    col=st.sampled_from(["k", "d", "price"]),
    op=st.sampled_from(["=", "<", "<=", ">", ">=", "is_null", "not_null"]),
    lit=st.integers(-40, 1400),
)
def test_variant_table_pruning_soundness_e2e(spark, tmp_path_factory,
                                             chunks, col, op, lit):
    """End-to-end soundness of file pruning over WALKER-harvested stats
    (r13): variant-table footers are unreadable to pyarrow, so every
    bound/null count these scans prune on came from the thrift footer
    walker — including the DECIMAL column (int64-backed, whose stats
    only the walker decodes; bounds round-trip Appendix-D-encoded
    through the manifest). For random multi-file tables and random
    predicates, the pruned scan must return exactly the rows a full
    scan + Spark filter returns, and the metadata-only count must
    agree."""
    import datetime as dtm
    import decimal as dec

    from iceberg_rust_archive_spark.catalog import FileCatalog
    from iceberg_rust_archive_spark.plans.engine import Engine
    from iceberg_rust_archive_spark.predicates import Pred

    eng = Engine(spark, FileCatalog(
        str(tmp_path_factory.mktemp("vprune") / "wh")))
    eng.sql("CREATE SCHEMA db")
    eng.sql("CREATE TABLE db.vp (k BIGINT, d DATE, "
            "price DECIMAL(10,2), p VARIANT)")
    rows = []
    for chunk in chunks:
        vals = ", ".join(
            ("(NULL, " if k is None else f"({k}, ")
            + f"date_add(date'2020-01-01', {dd}), "
            + f"cast({dd - 700} as decimal(10,2)) / 100, "
            + f"parse_json('{dd}'))" for k, dd in chunk)
        eng.sql("INSERT INTO db.vp VALUES " + vals
                .replace("(NULL, ", "(CAST(NULL AS BIGINT), "))
        rows += chunk
    t = eng.load_table("db.vp")

    def key(r):
        if col == "k":
            return r[0]
        if col == "d":
            return r[1]
        return dec.Decimal(r[1] - 700) / 100  # price, exact 2-dec

    if col == "d":
        pv = (dtm.date(2020, 1, 1) + dtm.timedelta(days=lit)).isoformat()
        plit = lit  # compare in day-offset space (same order)
        cmp_key = lambda r: r[1]  # noqa: E731
    elif col == "price":
        pv = float(lit) / 100
        plit = dec.Decimal(lit) / 100
        cmp_key = key
    else:
        pv = plit = lit
        cmp_key = key

    if op == "is_null":
        want = sum(1 for r in rows if key(r) is None)
    elif op == "not_null":
        want = sum(1 for r in rows if key(r) is not None)
    else:
        import operator as _op
        f = {"=": _op.eq, "<": _op.lt, "<=": _op.le,
             ">": _op.gt, ">=": _op.ge}[op]
        want = sum(1 for r in rows
                   if cmp_key(r) is not None and f(cmp_key(r), plit))

    pred = Pred(col, op, pv if op not in ("is_null", "not_null") else None)
    got = t.scan(spark, filter=[pred]).count()
    assert got == want, (chunks, col, op, lit, got, want)
    assert t.count(spark, filter=[pred]) == want


# --- timestamptz transforms: zone independence (r13) -----------------------

_TZ_ZONES = ("UTC", "America/New_York", "Asia/Kathmandu",  # +05:45
             "Australia/Lord_Howe",  # +10:30 with a 30-min DST shift
             "Pacific/Kiritimati")   # +14, the extreme east


@settings(max_examples=int(
    __import__("os").environ.get("PROP_EXAMPLES_TZ", "8")), deadline=None)
@given(
    micros=st.lists(st.integers(-2_000_000_000_000_000,   # ~1906
                                4_000_000_000_000_000),   # ~2096
                    min_size=1, max_size=6),
    zone=st.sampled_from(_TZ_ZONES),
    transform=st.sampled_from(["year", "month", "day", "hour"]),
)
def test_tstz_transform_column_zone_independent(spark, micros, zone,
                                                transform):
    """transform_column on timestamptz must equal the driver-side
    transform_value (the spec's UTC-epoch semantics) under EVERY session
    zone — including sub-hour offsets (+05:45) and half-hour DST shifts,
    where an hour-granular leak would still cancel out. Catches any
    future reintroduction of session-zone field extraction."""
    import datetime as dt

    from iceberg_rust_archive_spark.functions.transforms import (
        transform_column, transform_value,
    )
    insts = [dt.datetime.fromtimestamp(m / 1e6, tz=dt.timezone.utc)
             for m in micros]
    want = [transform_value(transform, v, "timestamptz") for v in insts]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(insts)], "i int, ts timestamp")
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", zone)
        got = [r.t for r in df.select(
            "i", transform_column(transform, "ts", "timestamptz")
            .alias("t")).orderBy("i").collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert got == want, (zone, transform, micros)


# --- DML router literal survival (r13 s3) -----------------------------------

_KEYWORD_SOUP = [
    "where", "when matched then delete", "on", "from t", "union all",
    "group by v", "order by k", "version as of 1", "db.t.files",
    "select", "values", " as ", "join u", "--", "/*", "insert *",
]


@settings(max_examples=int(
    __import__("os").environ.get("PROP_EXAMPLES_LIT", "6")), deadline=None)
@given(
    words=st.lists(st.sampled_from(_KEYWORD_SOUP), min_size=1, max_size=4),
    pad=st.text(alphabet="ab ._,()", max_size=6),
    stmt=st.sampled_from(["insert", "update", "merge_upd", "merge_ins"]),
)
def test_dml_router_literal_survival(spark, tmp_path_factory, words, pad,
                                     stmt):
    """Generative closure over the literal-masking seam: a literal
    assembled from router keywords (clause openers, comment markers,
    time-travel phrases, metadata suffixes) must survive byte-exact
    through INSERT, UPDATE SET, and both MERGE actions."""
    from iceberg_rust_archive_spark.catalog import FileCatalog
    from iceberg_rust_archive_spark.plans.engine import Engine

    lit = (pad + " ".join(words) + pad).replace("'", "''")
    want = lit.replace("''", "'")
    wh = tmp_path_factory.mktemp("lit-prop")
    eng = Engine(spark, FileCatalog(str(wh / "wh")))
    eng.sql("CREATE SCHEMA db")
    eng.sql("CREATE TABLE db.t (k BIGINT, v STRING)")
    if stmt == "insert":
        eng.sql(f"INSERT INTO db.t VALUES (1, '{lit}')")
    elif stmt == "update":
        eng.sql("INSERT INTO db.t VALUES (1, 'seed')")
        eng.sql(f"UPDATE db.t SET v = '{lit}' WHERE k = 1")
    elif stmt == "merge_upd":
        eng.sql("INSERT INTO db.t VALUES (1, 'seed')")
        eng.sql("MERGE INTO db.t t USING (SELECT 1 AS k) s ON t.k = s.k "
                f"WHEN MATCHED THEN UPDATE SET v = '{lit}' "
                "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, 'x')")
    else:
        eng.sql("MERGE INTO db.t t USING (SELECT 1 AS k) s ON t.k = s.k "
                "WHEN MATCHED THEN DELETE "
                "WHEN NOT MATCHED THEN INSERT (k, v) "
                f"VALUES (s.k, '{lit}')")
    got = eng.sql("SELECT v FROM db.t WHERE k = 1").collect()
    assert len(got) == 1 and got[0].v == want, (stmt, lit, got)


# --- metadata min/max soundness (r13 s3) ------------------------------------

@SLOW
@given(batches=st.lists(
    st.lists(st.tuples(
        st.one_of(st.none(), st.integers(-50, 50)),
        st.one_of(st.none(), st.text(alphabet="abc0189 ",
                                     min_size=0, max_size=20)),
        st.one_of(st.none(), st.floats(-9, 9, allow_nan=False),
                  st.sampled_from([float("nan"), float("inf"),
                                   float("-inf")]))),
        min_size=1, max_size=5),
    min_size=1, max_size=3))
def test_metadata_min_max_matches_spark_agg(spark, tmp_path_factory,
                                            batches):
    """Whenever metadata_min_max claims provability, its answer must
    equal Spark's min/max over the scan — across nulls, NaN/±inf
    injections, short and truncation-length strings, and multi-commit
    bound merges. Unprovable cases must raise (never a wrong value)."""
    import math as _m

    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from iceberg_rust_archive_spark.catalog import FileCatalog
    from iceberg_rust_archive_spark.spec import (
        NestedField, PartitionSpec, Schema, StructTypeSpec,
    )
    from iceberg_rust_archive_spark.table import Table

    wh = tmp_path_factory.mktemp("mm-prop")
    cat = FileCatalog(str(wh / "wh"))
    schema = Schema(0, StructTypeSpec((
        NestedField(1, "k", "long", True),
        NestedField(2, "s", "string", True),
        NestedField(3, "x", "double", True))))
    t = Table.create(cat, "db.mm", schema, PartitionSpec(0, ()))
    sschema = StructType([StructField("k", LongType()),
                          StructField("s", StringType()),
                          StructField("x", DoubleType())])
    for rows in batches:
        t.append(spark, spark.createDataFrame(rows, sschema))
        t = t.refresh()
    want = t.scan(spark).selectExpr(
        "min(k)", "max(k)", "min(s)", "max(s)", "min(x)", "max(x)"
    ).collect()[0]
    for col, wlo, whi in (("k", want[0], want[1]),
                          ("s", want[2], want[3]),
                          ("x", want[4], want[5])):
        try:
            lo, hi = t.metadata_min_max(col)
        except ValueError:
            continue  # unprovable — fallback contract
        def norm(v):
            return None if v is None else (
                (1, 0.0) if isinstance(v, float) and _m.isnan(v)
                else (0, v) if isinstance(v, float) else v)
        assert norm(lo) == norm(wlo) and norm(hi) == norm(whi), \
            (col, lo, hi, wlo, whi, batches)


_MM_DATES = __import__("datetime").date


@SLOW
@given(
    rows=st.lists(st.tuples(
        st.integers(-50, 50),
        st.dates(_MM_DATES(2021, 1, 1), _MM_DATES(2021, 4, 30)),
        st.one_of(st.floats(-9, 9, allow_nan=False),
                  st.just(float("nan")))),
        min_size=1, max_size=10),
    op=st.sampled_from(["<", "<=", ">", ">="]),
    cutoff=st.one_of(
        # month-aligned cutoffs → the fast path usually proves
        st.sampled_from([_MM_DATES(2021, 2, 1), _MM_DATES(2021, 3, 1)]),
        # arbitrary mid-month cutoffs → partial matches force fallback
        st.dates(_MM_DATES(2021, 1, 5), _MM_DATES(2021, 4, 20))),
)
def test_metadata_agg_where_matches_spark(spark, tmp_path_factory,
                                          rows, op, cutoff):
    """``SELECT count/min/max … WHERE`` through ``engine.sql`` must
    equal vanilla Spark over the identical rows, WHICHEVER path answers
    — the manifest-bounds fast path (month-aligned cutoffs over a
    month-partitioned table) or the exact fallback (mid-month cutoffs,
    NaN-bearing files, partially-matched files). ``event()`` records
    which path each draw took so a soak shows both populated."""
    import math as _m

    from hypothesis import event

    from iceberg_rust_archive_spark.catalog import FileCatalog
    from iceberg_rust_archive_spark.plans.engine import Engine

    wh = tmp_path_factory.mktemp("mmw-prop")
    eng = Engine(spark, FileCatalog(str(wh / "wh")))
    eng.sql("CREATE SCHEMA db")
    eng.sql("CREATE TABLE db.t (k BIGINT, d DATE, x DOUBLE) "
            "PARTITIONED BY (month(d))")

    def lit(v):
        return "CAST('NaN' AS DOUBLE)" if _m.isnan(v) else repr(v)
    half = max(1, len(rows) // 2)
    for chunk in (rows[:half], rows[half:]):
        if chunk:
            eng.sql("INSERT INTO db.t VALUES " + ", ".join(
                f"({k}, DATE '{d}', {lit(x)})" for k, d, x in chunk))

    agg = ("SELECT count(*) AS n, min(k) AS mnk, max(k) AS mxk, "
           "min(d) AS mnd, max(d) AS mxd, min(x) AS mnx, max(x) AS mxx "
           f"FROM db.t WHERE d {op} DATE '{cutoff}'")
    event("fast" if eng._metadata_agg_fast_path(agg) is not None
          else "fallback")
    got = eng.sql(agg).collect()[0]

    spark.createDataFrame(rows, "k long, d date, x double") \
        .createOrReplaceTempView("mmw_vt")
    want = spark.sql(agg.replace("FROM db.t", "FROM mmw_vt")).collect()[0]

    def norm(v):
        return ((1, 0.0) if isinstance(v, float) and _m.isnan(v) else v)
    for field in ("n", "mnk", "mxk", "mnd", "mxd", "mnx", "mxx"):
        assert norm(got[field]) == norm(want[field]), \
            (field, got, want, op, cutoff, rows)
