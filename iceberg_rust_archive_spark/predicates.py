"""Predicate model for two-level metadata pruning (SURVEY §2 A2/A3).

A scan filter is a conjunction of simple predicates
``Pred(column, op, value)`` — exactly the shape the reference prunes with
(datafusion pruning rewrites conjuncts independently;
pruning_statistics.rs:47-234). Anything not expressible here stays a
residual Spark filter (filters are *inexact*, table.rs:253-261, so
re-evaluation above the scan is always applied).

Literals are normalized like stats bounds (sources/stats.py): date → ISO
string, datetime → epoch micros, so comparisons are plain Python ``<``/``>``.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math as _math
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from iceberg_rust_archive_spark.functions.transforms import transform_value
from iceberg_rust_archive_spark.spec.manifest import DataFile
from iceberg_rust_archive_spark.spec.partition import PartitionSpec
from iceberg_rust_archive_spark.spec.schema import Schema

OPS = {"=", "!=", "<", "<=", ">", ">=", "in", "is_null", "not_null"}
_MONOTONIC = {"identity", "year", "month", "day", "hour"}


@dataclass(frozen=True)
class Pred:
    column: str
    op: str
    value: object = None
    # Conservative escape hatch: the literal could not be normalized to
    # the bounds' value space (e.g. a naive timestamptz literal under a
    # session timezone we cannot resolve), so metadata pruning must skip
    # this conjunct entirely — the residual Spark filter, which evaluates
    # the literal under Spark's own session-zone rules, stays exact.
    no_prune: bool = False

    def __post_init__(self):
        if self.op not in OPS:
            raise ValueError(f"unsupported op {self.op!r}")


def _norm_literal(v, iceberg_type: str):
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            # normalize the INSTANT to naive-UTC first; subtracting an
            # epoch stamped with the literal's own tzinfo (the previous
            # code) shifted the result by that zone's offset
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        if iceberg_type == "date":
            return v.date().isoformat()
        return int((v - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, str) and iceberg_type in ("timestamp", "timestamptz"):
        dt = _dt.datetime.fromisoformat(v)
        return int((dt - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    if isinstance(v, str) and iceberg_type == "date":
        return v[:10]
    return v


def _lit_for_transform(v, iceberg_type: str):
    """Un-normalized python value for transform_value (needs real dates)."""
    if isinstance(v, str) and iceberg_type in ("date", "timestamp",
                                               "timestamptz"):
        if iceberg_type == "date":
            return _dt.date.fromisoformat(v[:10])
        return _dt.datetime.fromisoformat(v)
    return v


def _lit_type_ok(v, iceberg_type: str) -> bool:
    """True iff the literal's Python type can represent a value of the
    Iceberg column type — the gate that keeps a PARSER-GUESSED literal
    from being transformed as the wrong type. pyspark Column reprs
    don't quote strings, so ``F.col("zip") == "01234"`` round-trips
    through ``try_parse_preds`` as the int 1234; ``bucket_value(1234,
    n, "string")`` then hashes ``"1234"`` ≠ ``"01234"`` and transform
    pruning would drop the very files holding the matching rows (the
    reference never guesses — pruning literals are typed ``Value``s,
    pruning_statistics.rs:285-350). On mismatch callers SKIP transform
    pruning for that predicate: conservative keep, residual filter
    preserves correctness."""
    if isinstance(v, bool):
        return iceberg_type == "boolean"
    if isinstance(v, int):
        return iceberg_type in ("int", "long") \
            or iceberg_type.startswith("decimal")
    if isinstance(v, float):
        return iceberg_type in ("float", "double") \
            or iceberg_type.startswith("decimal")
    if isinstance(v, _dt.datetime):
        return iceberg_type in ("timestamp", "timestamptz", "date")
    if isinstance(v, _dt.date):
        return iceberg_type == "date"
    if isinstance(v, str):
        if iceberg_type in ("string", "uuid", "binary"):
            return True
        if iceberg_type == "date":
            import re as _re
            return bool(_re.fullmatch(r"\d{4}-\d{2}-\d{2}.*", v))
        if iceberg_type in ("timestamp", "timestamptz"):
            try:
                _dt.datetime.fromisoformat(v)
                return True
            except ValueError:
                return False
        return False
    return False


def _pred_lit_ok(p: Pred, iceberg_type: str) -> bool:
    if p.op in ("is_null", "not_null"):
        return True
    if p.op == "in":
        return all(_lit_type_ok(v, iceberg_type) for v in p.value)
    return _lit_type_ok(p.value, iceberg_type)


def localize_naive_tstz(preds: list[Pred], schema, tz_name: str) -> list[Pred]:
    """Interpret NAIVE timestamp literals on ``timestamptz`` columns in
    the session timezone — exactly what Spark's parser does with
    ``TIMESTAMP '…'`` against a TimestampType column — converting them
    to aware-UTC instants once at plan entry. File bounds for
    timestamptz are UTC-instant micros, so pruning a naive literal AS
    UTC under a non-UTC session disagrees with the engine's own filter
    evaluation: for ``<=`` in a session east of UTC the UTC-read
    literal falls short of Spark's instant and pruning can drop files
    holding rows the filter accepts (lost rows). NTZ ``timestamp``
    columns keep naive literals — their fields ARE the value.

    DST edges verified against Spark (r13 probe): for an AMBIGUOUS wall
    time (fall-back) and a NONEXISTENT one (spring-forward) Spark's
    parser picks the same instant as zoneinfo's default ``fold=0``
    localization used here, so pruning agrees with the engine's filter
    even inside the two transition hours."""
    if not preds:
        return preds
    tz = _resolve_session_tz(tz_name)

    def loc(v):
        if isinstance(v, str):
            try:
                v = _dt.datetime.fromisoformat(v)
            except ValueError:
                return v
        if isinstance(v, _dt.datetime) and v.tzinfo is None:
            return v.replace(tzinfo=tz).astimezone(_dt.timezone.utc)
        return v

    def has_naive(p):
        vals = p.value if p.op == "in" and isinstance(
            p.value, (list, tuple)) else (p.value,)
        for v in vals:
            if isinstance(v, str):
                try:
                    v = _dt.datetime.fromisoformat(v)
                except ValueError:
                    continue
            if isinstance(v, _dt.datetime) and v.tzinfo is None:
                return True
        return False

    out = []
    for p in preds:
        f = schema.field_by_name(p.column) if schema is not None else None
        if getattr(f, "field_type", None) != "timestamptz" \
                or p.op in ("is_null", "not_null"):
            out.append(p)
        elif tz is None:
            # Unresolvable session zone: interpreting the naive literal
            # as UTC would disagree with Spark's session-offset reading
            # and mis-prune (lost rows). Keep the literal naive and bar
            # this conjunct from metadata pruning; the residual filter
            # (Spark interprets naive literals in ITS session zone)
            # keeps results exact.
            out.append(Pred(p.column, p.op, p.value,
                            no_prune=has_naive(p)) if has_naive(p) else p)
        elif p.op == "in" and isinstance(p.value, (list, tuple)):
            out.append(Pred(p.column, p.op, tuple(loc(v) for v in p.value)))
        else:
            out.append(Pred(p.column, p.op, loc(p.value)))
    return out


# java.time.ZoneId.SHORT_IDS — the legacy three-letter zone aliases
# Spark's parser accepts (it calls ZoneId.of(id, SHORT_IDS))
_JAVA_SHORT_IDS = {
    "ACT": "Australia/Darwin", "AET": "Australia/Sydney",
    "AGT": "America/Argentina/Buenos_Aires", "ART": "Africa/Cairo",
    "AST": "America/Anchorage", "BET": "America/Sao_Paulo",
    "BST": "Asia/Dhaka", "CAT": "Africa/Harare",
    "CNT": "America/St_Johns", "CST": "America/Chicago",
    "CTT": "Asia/Shanghai", "EAT": "Africa/Addis_Ababa",
    "ECT": "Europe/Paris", "IET": "America/Indiana/Indianapolis",
    "IST": "Asia/Kolkata", "JST": "Asia/Tokyo",
    "MIT": "Pacific/Apia", "NET": "Asia/Yerevan",
    "NST": "Pacific/Auckland", "PLT": "Asia/Karachi",
    "PNT": "America/Phoenix", "PRT": "America/Puerto_Rico",
    "PST": "America/Los_Angeles", "SST": "Pacific/Guadalcanal",
    "VST": "Asia/Ho_Chi_Minh", "EST": "America/Panama",
    "MST": "America/Phoenix", "HST": "Pacific/Honolulu",
}


def _resolve_session_tz(tz_name: str):
    """Session-timezone string → tzinfo, or None when unresolvable.
    Spark validates the conf through ``ZoneId.of``, which accepts region
    IDs (zoneinfo's domain) AND fixed-offset forms zoneinfo rejects:
    ``Z``, ``+08``, ``+08:00``, ``-0330``, ``GMT+8`` / ``UTC+05:30`` /
    ``UT-2``. Treating those as UTC (the previous fallback) silently
    shifted every naive timestamptz literal by the session offset —
    wrong pruning AND a wrong pushed filter under such sessions."""
    try:
        import zoneinfo
        return zoneinfo.ZoneInfo(tz_name)
    except Exception:
        pass
    # Java ZoneId.SHORT_IDS (Spark resolves these; zoneinfo does not)
    region = _JAVA_SHORT_IDS.get((tz_name or "").strip())
    if region is not None:
        try:
            import zoneinfo
            return zoneinfo.ZoneInfo(region)
        except Exception:
            return None
    import re as _re
    s = (tz_name or "").strip()
    for prefix in ("UTC", "GMT", "UT"):   # check UTC before UT
        if s.upper().startswith(prefix):
            s = s[len(prefix):]
            break
    if s.upper() in ("", "Z"):
        return _dt.timezone.utc
    m = _re.fullmatch(r"([+-])(\d{1,2})(?::?(\d{2}))?(?::?(\d{2}))?", s)
    if not m:
        return None
    sign = -1 if m.group(1) == "-" else 1
    h, mi, se = int(m.group(2)), int(m.group(3) or 0), int(m.group(4) or 0)
    if h > 18 or mi > 59 or se > 59:
        return None
    return _dt.timezone(
        sign * _dt.timedelta(hours=h, minutes=mi, seconds=se))


def to_spark_filter(preds: list[Pred]) -> Column | None:
    """Residual re-evaluation filter (A7 inexact semantics)."""
    col = None
    for p in preds:
        c = F.col(p.column)

        def lit(v, _np=p.no_prune):
            # A no_prune naive-datetime literal means "session-zone wall
            # time" under a zone Python could not resolve; F.lit(datetime)
            # would interpret it in the PYTHON PROCESS zone instead.  A
            # string→timestamp cast happens JVM-side in Spark's session
            # zone — exactly the TIMESTAMP '…' semantics we owe.
            if _np and isinstance(v, _dt.datetime) and v.tzinfo is None:
                return F.lit(v.isoformat(sep=" ")).cast("timestamp")
            return F.lit(v)

        if p.op == "=":
            e = c == lit(p.value)
        elif p.op == "!=":
            e = c != lit(p.value)
        elif p.op == "<":
            e = c < lit(p.value)
        elif p.op == "<=":
            e = c <= lit(p.value)
        elif p.op == ">":
            e = c > lit(p.value)
        elif p.op == ">=":
            e = c >= lit(p.value)
        elif p.op == "in":
            if p.no_prune:
                e = None
                for v in p.value:
                    t = (c == lit(v))
                    e = t if e is None else (e | t)
                if e is None:
                    e = F.lit(False)
            else:
                e = c.isin(list(p.value))
        elif p.op == "is_null":
            e = c.isNull()
        else:
            e = c.isNotNull()
        col = e if col is None else (col & e)
    return col


def _range_overlaps(op: str, lit, lo, hi, contains_null=False) -> bool:
    """Can any value in [lo, hi] satisfy ``value <op> lit``? Unknown bounds
    → keep (pruning must be conservative)."""
    try:
        if op == "=":
            return (lo is None or lo <= lit) and (hi is None or lit <= hi)
        if op == "!=":
            return True
        if op == "<":
            return lo is None or lo < lit
        if op == "<=":
            return lo is None or lo <= lit
        if op == ">":
            return hi is None or hi > lit
        if op == ">=":
            return hi is None or hi >= lit
        if op == "in":
            return any(_range_overlaps("=", v, lo, hi) for v in lit)
        if op == "is_null":
            return contains_null or (lo is None and hi is None)
        if op == "not_null":
            return True
    except TypeError:
        return True  # incomparable types → keep
    return True


def _align_decimal_bounds(lit, lo, hi):
    """FLOAT literal vs DECIMAL bounds: Python compares the pair
    exactly (float expands to its binary rational), but Spark promotes
    the decimal column to DOUBLE — so a boundary literal like ``0.57``
    (binary ≈ 0.56999…) matches rows Python's exact order says it
    shouldn't, and an exact-space prune would drop their file. Compare
    in double space instead: ``float(Decimal)`` rounds monotonically,
    so the converted bounds still bound every row's double cast."""
    vals = lit if isinstance(lit, (list, tuple)) else [lit]
    if any(isinstance(v, float) for v in vals):
        if isinstance(lo, _decimal.Decimal):
            lo = float(lo)
        if isinstance(hi, _decimal.Decimal):
            hi = float(hi)
    return lo, hi


def _nan_blind(op: str, lit, ftype, nan_count=None) -> bool:
    """True when a float/double column's BOUNDS cannot refute the
    predicate: NaN values are excluded from parquet min/max (spec-
    sanctioned), and Spark orders NaN LARGEST — NaN > lit, NaN >= lit,
    and NaN == NaN (eqNullSafe/comparison) are all TRUE. So a hidden
    NaN row can satisfy ``>``/``>=`` in a file whose upper bound says
    otherwise, and a NaN literal can match where ``lo <= NaN`` is
    plain-Python False. Without nan counts the only sound move is to
    keep the file; a recorded count of exactly ZERO (manifests written
    by Iceberg-java harvest nan_value_counts / FieldSummary
    contains_nan) proves there is no hidden NaN and bounds regain
    their full refuting power."""
    if ftype not in ("float", "double"):
        return False
    if nan_count == 0:
        return False
    if op in (">", ">="):
        return True
    vals = lit if isinstance(lit, (list, tuple)) else [lit]
    return any(isinstance(v, float) and _math.isnan(v) for v in vals)


def prune_manifests(preds: list[Pred], spec: PartitionSpec, schema: Schema,
                    manifest_entries):
    """Partition-level pruning (A2): rewrite each conjunct into partition
    space by applying the partition transform to the literal
    (pruning_statistics.rs:285-350) and test against per-field
    FieldSummary bounds (:47-142). Returns surviving entries."""
    if not preds or not spec.fields:
        return list(manifest_entries)
    out = []
    for mle in manifest_entries:
        # Delete manifests (content=1) prune ONLY when the summary
        # proves every delete inside is scoped to excluded partitions:
        # a GLOBAL delete (all-null partition tuple) rides a summary
        # with contains_null=True, and dropping its manifest would
        # resurrect rows the predicate selects (every delete must
        # apply — A5). Data-predicate range checks therefore skip any
        # field whose summary admits nulls on delete manifests.
        is_delete_manifest = getattr(mle, "content", 0) != 0
        keep = True
        for idx, pf in enumerate(spec.fields):
            if idx >= len(mle.partitions):
                continue
            src = schema.field_by_id(pf.source_id)
            if src is None:
                continue
            summary = mle.partitions[idx]
            if is_delete_manifest and summary.contains_null:
                continue  # may hold global deletes — cannot prune on k
            for p in preds:
                if p.column != src.name or p.no_prune:
                    continue
                if p.op == "is_null":
                    # every transform except void is NULL-PRESERVING
                    # (spec: null in → null out), so a summary proving
                    # no null partition VALUES proves no null SOURCE
                    # rows in the manifest's data files. Delete
                    # manifests stay un-prunable here (their scoping
                    # semantics are value-, not null-, driven).
                    if not is_delete_manifest \
                            and pf.transform != "void" \
                            and summary.contains_null is False:
                        keep = False
                        break
                    continue
                if p.op in ("not_null", "!="):
                    continue
                if pf.transform.startswith("bucket") and p.op not in ("=", "in"):
                    continue  # bucket is not order-preserving
                if (not pf.transform.startswith("bucket")
                        and pf.transform not in _MONOTONIC
                        and not pf.transform.startswith("truncate")):
                    continue
                if not _pred_lit_ok(p, src.field_type):
                    continue  # type-skewed parsed literal → no pruning
                try:
                    if p.op == "in":
                        tlit = [transform_value(
                            pf.transform,
                            _lit_for_transform(v, src.field_type),
                            src.field_type) for v in p.value]
                    else:
                        tlit = transform_value(
                            pf.transform,
                            _lit_for_transform(p.value, src.field_type),
                            src.field_type)
                except (TypeError, ValueError):
                    continue  # un-transformable literal → keep
                _conflated = ("", "__HIVE_DEFAULT_PARTITION__")
                if summary.contains_null and (
                        any(v in _conflated for v in tlit)
                        if p.op == "in" else tlit in _conflated):
                    # legacy-writer rescue (r16): pre-r16 tables
                    # conflated an empty-string partition value (and
                    # the literal default-partition string) with null
                    # (Spark's __HIVE_DEFAULT_PARTITION__ dir covers
                    # all three), so a null-admitting manifest may
                    # hide matching rows its bounds don't — keep it
                    continue
                # Iceberg's INCLUSIVE projection (Projections.inclusive
                # / pruning_statistics.rs:285-350): a many-to-one
                # monotone transform maps an OPEN interval to a CLOSED
                # one — ``d < D`` only implies ``month(d) <= month(D)``
                # (rows strictly below D still live IN month(D) unless
                # D sits exactly on the boundary), so strict ops must
                # test inclusively in transformed space. Identity keeps
                # strict: the transform is one-to-one. Testing the raw
                # strict op pruned the partition holding the matching
                # rows — lost rows on every non-boundary ``<``/``>``.
                eop = p.op
                if pf.transform != "identity" and eop in ("<", ">"):
                    eop = "<=" if eop == "<" else ">="
                if _nan_blind(eop, tlit, src.field_type,
                              0 if summary.contains_nan is False else None):
                    continue  # hidden NaN could satisfy the predicate
                if not _range_overlaps(eop, tlit, summary.lower_bound,
                                       summary.upper_bound,
                                       summary.contains_null):
                    keep = False
                    break
            if not keep:
                break
        if keep:
            out.append(mle)
    return out


def _partition_value_excludes(preds: list[Pred], spec: PartitionSpec,
                              schema: Schema, f: DataFile) -> bool:
    """File-level partition pruning on the EXACT transformed value in
    the file's partition tuple. Column bounds can't express bucket
    membership (murmur3 destroys order), but the partition tuple stores
    ``bucket(key)`` itself — so ``key = lit`` / ``key IN (...)`` prunes
    any file whose bucket value can't match. Applies to every transform
    for equality predicates (transform(lit) must equal the stored
    value); this is what turns an LSH key probe into a file lookup."""
    for pf in spec.fields:
        src = schema.field_by_id(pf.source_id)
        if src is None or not isinstance(src.field_type, str):
            continue
        pv = f.partition.get(pf.name)
        if pv is None:
            continue
        def same_kind(a, b):
            # guard against representation skew: both sides are
            # spec-typed since r14 (identity date → days, timestamp →
            # micros), but tuples parsed from FOREIGN or pre-r14
            # manifests may still carry ISO strings — mismatched kinds
            # must keep the file, never prune it
            num = (int, float)
            return (isinstance(a, num) and isinstance(b, num)
                    and not isinstance(a, bool) and not isinstance(b, bool)) \
                or type(a) is type(b)

        for p in preds:
            if p.column != src.name or p.op not in ("=", "in") \
                    or p.no_prune:
                continue
            if not _pred_lit_ok(p, src.field_type):
                continue  # type-skewed parsed literal → keep the file
            try:
                def _is_nan(v):
                    return isinstance(v, float) and _math.isnan(v)
                if p.op == "=":
                    lit = _lit_for_transform(p.value, src.field_type)
                    tv = transform_value(pf.transform, lit, src.field_type)
                    if _is_nan(tv) or _is_nan(pv):
                        continue  # NaN != NaN in Python; Spark says =
                    if same_kind(tv, pv) and tv != pv:
                        return True
                else:
                    lits = [transform_value(
                        pf.transform, _lit_for_transform(v, src.field_type),
                        src.field_type) for v in p.value]
                    if any(_is_nan(t) for t in lits) or _is_nan(pv):
                        continue
                    if all(same_kind(t, pv) for t in lits) \
                            and pv not in lits:
                        return True
            except (TypeError, ValueError):
                continue  # un-transformable literal → conservative keep
    return False


def prune_datafiles(preds: list[Pred], schema: Schema,
                    files: list[DataFile],
                    spec: PartitionSpec | None = None) -> list[DataFile]:
    """File-level pruning (A3) on per-column lower/upper bounds and null
    counts (pruning_statistics.rs:144-234), plus exact partition-value
    pruning when the partition spec is provided."""
    if not preds:
        return files
    out = []
    for f in files:
        keep = True
        if spec is not None and _partition_value_excludes(
                preds, spec, schema, f):
            continue
        for p in preds:
            if p.no_prune:
                continue
            fld = schema.field_by_name(p.column)
            if fld is None or not isinstance(fld.field_type, str):
                continue
            lo = f.lower_bounds.get(fld.field_id)
            hi = f.upper_bounds.get(fld.field_id)
            nulls = f.null_value_counts.get(fld.field_id)
            values = f.value_counts.get(fld.field_id)
            if p.op == "not_null" and nulls is not None and values is not None \
                    and nulls == values:
                keep = False
                break
            lit = _norm_literal(p.value, fld.field_type) if p.op != "in" else \
                [_norm_literal(v, fld.field_type) for v in p.value]
            if _nan_blind(p.op, lit, fld.field_type,
                          f.nan_value_counts.get(fld.field_id)):
                continue  # hidden NaN could satisfy the predicate
            # UNKNOWN null count (no harvested entry) must read as "may
            # contain nulls": with bounds present but nulls unrecorded,
            # `IS NULL` would otherwise prune a file that holds null rows
            contains_null = True if nulls is None else bool(nulls)
            lo, hi = _align_decimal_bounds(lit, lo, hi)
            if not _range_overlaps(p.op, lit, lo, hi, contains_null):
                keep = False
                break
        if keep:
            out.append(f)
    return out


def file_fully_matches(preds: list[Pred], schema: Schema,
                       f: DataFile) -> bool:
    """EVERY row of ``f`` provably satisfies every predicate — the
    precondition for answering ``count(*)`` from manifest metadata
    alone (``Table.count``). Conservative by construction: missing
    bounds or any null in a filtered column → False (a NULL fails
    every comparison predicate).

    Truncated string bounds stay sound here: a truncated lower bound
    is still ≤ every value (so ``lo >= lit`` proves ``value >= lit``)
    and the truncate-increment upper is still ≥ every value."""
    for p in preds:
        if p.no_prune:
            return False  # literal not in bounds space — unprovable
        fld = schema.field_by_name(p.column)
        if fld is None or not isinstance(fld.field_type, str):
            return False
        lo = f.lower_bounds.get(fld.field_id)
        hi = f.upper_bounds.get(fld.field_id)
        nulls = f.null_value_counts.get(fld.field_id)
        values = f.value_counts.get(fld.field_id)
        if p.op == "is_null":
            if not (nulls is not None and values is not None
                    and nulls == values):
                return False
            continue
        if nulls is None or nulls != 0:
            return False
        if p.op == "not_null":
            continue
        if fld.field_type in ("float", "double") \
                and p.op in ("=", "<", "<=", "in") \
                and f.nan_value_counts.get(fld.field_id) != 0:
            # a NaN row is invisible to bounds yet FAILS these under
            # Spark's NaN-largest order — full match is unprovable
            # unless a harvested nan count proves ZERO NaNs ('>', '>=',
            # '!=' stay provable: a hidden NaN satisfies them anyway)
            return False
        if lo is None or hi is None:
            return False
        lit = _norm_literal(p.value, fld.field_type) if p.op != "in" \
            else [_norm_literal(v, fld.field_type) for v in p.value]
        lo, hi = _align_decimal_bounds(lit, lo, hi)
        try:
            ok = {
                "=": lambda: lo == hi == lit,
                "!=": lambda: hi < lit or lo > lit,
                "<": lambda: hi < lit,
                "<=": lambda: hi <= lit,
                ">": lambda: lo > lit,
                ">=": lambda: lo >= lit,
                "in": lambda: lo == hi and lo in lit,
            }.get(p.op, lambda: False)()
        except TypeError:
            return False
        if not ok:
            return False
    return True


# --- best-effort predicate extraction (DML pruning) ------------------------

def _parse_literal_token(tok: str, allow_spaces: bool = True):
    """One literal token of either surface syntax → python value.
    ``DATE '…'`` / ``TIMESTAMP '…'`` keep the reference's typed-literal
    shape; bare ISO-looking tokens (how pyspark 4 reprs date literals)
    stay strings — stats bounds normalize dates to ISO strings anyway
    (``_norm_literal``), so string comparison is the pruning order.

    ``allow_spaces=False`` (the SQL-string surface) rejects bare
    tokens containing spaces: in SQL text a space after a literal can
    only be trailing clause text (e.g. ``1 OR flag IS NULL`` swallowed
    whole by the comparison regex), and accepting it would build a
    Pred with a WRONG literal and prune matching files. Only the
    pyspark-Column repr path needs spacey bare tokens (timestamp
    reprs like ``2020-01-02 03:04:05``)."""
    t = tok.strip()
    m = __import__("re").match(r"(?i)(?:date|timestamp)\s+'([^']*)'$", t)
    if m:
        return m.group(1)
    if len(t) >= 2 and t[0] == "'" and t[-1] == "'":
        return t[1:-1].replace("''", "'")
    low = t.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    import re as _re
    if _re.fullmatch(r"-?\d+", t):
        return int(t)
    if _re.fullmatch(r"-?\d+\.\d*(?:[eE][+-]?\d+)?", t):
        return float(t)
    body = r"[0-9][\w:.\- ]*" if allow_spaces else r"[0-9][\w:.\-]*"
    if _re.fullmatch(body, t):
        return t  # bare date/timestamp repr (pyspark Column literals)
    return _UNPARSEABLE


_UNPARSEABLE = object()


_QUOTE_CHARS = ("'", '"', "`")


def _scan_quoted(s: str, i: int) -> int:
    """``s[i]`` is a quote opener (``'``, ``"`` or a backtick); return
    the index one PAST the closing quote. Spark's lexical rules: the
    doubled-quote escape stays inside the run for all three kinds, and
    backslash escapes apply inside ``'``/``"`` string literals (not
    inside backtick identifiers). A raw literal (``r'…'``/``R"…"`` —
    the quote directly preceded by a bare r/R) processes NO escapes at
    all: it closes at the first same-quote (Spark lexes ``r'a''b'`` as
    two adjacent literals). An unterminated run extends to end of
    string — callers never re-scan inside it, which is the conservative
    reading (treat the tail as literal text, split/strip nothing)."""
    q = s[i]
    raw = (q != "`" and i >= 1 and s[i - 1] in "rR"
           and (i == 1 or not (s[i - 2].isalnum() or s[i - 2] == "_")))
    j, n = i + 1, len(s)
    while j < n:
        ch = s[j]
        if raw:
            if ch == q:
                return j + 1
            j += 1
            continue
        if ch == "\\" and q != "`" and j + 1 < n:
            j += 2
            continue
        if ch == q:
            if j + 1 < n and s[j + 1] == q:
                j += 2
                continue
            return j + 1
        j += 1
    return n


def _mask_quoted(s: str) -> str:
    """Length-preserving copy of ``s`` with every quoted run's INTERIOR
    blanked to spaces (delimiters kept) — for structural regexes that
    must never see literal content. Same-length means match SPANS on
    the masked text slice the ORIGINAL text exactly, so extracted
    fragments keep their literals verbatim."""
    out, i, n = [], 0, len(s)
    while i < n:
        ch = s[i]
        if ch in _QUOTE_CHARS:
            j = _scan_quoted(s, i)
            seg = s[i:j]
            if len(seg) >= 2 and seg[-1] == seg[0]:
                out.append(seg[0] + " " * (len(seg) - 2) + seg[-1])
            else:  # unterminated run: blank to end of string
                out.append(seg[0] + " " * (len(seg) - 1))
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` at paren depth 0, respecting ``'…'``/``"…"``
    string literals and backtick-quoted identifiers (Spark treats
    double quotes as string literals by default, and any of the three
    may carry a separator in its body)."""
    parts, depth, cur, i = [], 0, [], 0
    up, n = s.upper(), len(sep)
    while i < len(s):
        ch = s[i]
        if ch in _QUOTE_CHARS:
            j = _scan_quoted(s, i)
            cur.append(s[i:j])
            i = j
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and up[i:i + n] == sep:
            parts.append("".join(cur))
            cur = []
            i += n
            continue
        cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def _strip_parens(s: str) -> str:
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(s) - 1:
                    return s
        s = s[1:-1].strip()
    return s


def _parse_sql_term(term: str) -> Pred | None:
    import re as _re
    t = _strip_parens(term)
    if len(_split_top(t, " OR ")) > 1:
        return None  # disjunction — outside the conjunctive fragment
    m = _re.match(r"(?i)^([\w.]+)\s+is\s+not\s+null$", t)
    if m:
        return Pred(m.group(1), "not_null")
    m = _re.match(r"(?i)^([\w.]+)\s+is\s+null$", t)
    if m:
        return Pred(m.group(1), "is_null")
    m = _re.match(r"(?i)^([\w.]+)\s+in\s*\((.*)\)$", t, _re.DOTALL)
    if m:
        vals = [_parse_literal_token(v, allow_spaces=False)
                for v in _split_top(m.group(2), ",")]
        if any(v is _UNPARSEABLE for v in vals):
            return None
        return Pred(m.group(1), "in", tuple(vals))
    m = _re.match(r"^([\w.]+)\s*(<=|>=|<>|!=|=|<|>)\s*(.+?)\s*$", t,
                  _re.DOTALL)
    if not m:
        return None
    op = {"<>": "!="}.get(m.group(2), m.group(2))
    val = _parse_literal_token(m.group(3), allow_spaces=False)
    if val is _UNPARSEABLE:
        return None
    return Pred(m.group(1), op, val)


def _parse_prefix(expr: str) -> list[Pred] | None:
    """pyspark 4 ``Column`` repr is prefix notation — ``and(<=(a, 2),
    =(d, 2020-01-02))`` / ``isNull(x)`` / ``not(=(id, 1))``."""
    import re as _re
    e = expr.strip()
    m = _re.match(r"^([\w<>=!]+|<=|>=|=|<|>)\((.*)\)$", e, _re.DOTALL)
    if not m:
        return None
    head, body = m.group(1), m.group(2)
    if head == "!":
        head = "not"
    argv = [a.strip() for a in _split_top(body, ",")]
    if head == "and":
        out = []
        for a in argv:
            sub = _parse_prefix(a)
            if sub is None:
                return None
            out.extend(sub)
        return out
    if head == "not" and len(argv) == 1:
        m2 = _re.match(r"^=\((.*)\)$", argv[0], _re.DOTALL)
        if not m2:
            return None
        inner = [a.strip() for a in _split_top(m2.group(1), ",")]
        if len(inner) != 2:
            return None
        val = _parse_literal_token(inner[1])
        if val is _UNPARSEABLE or not _re.fullmatch(r"[\w.]+", inner[0]):
            return None
        return [Pred(inner[0], "!=", val)]
    if head in ("isNull", "isnull") and len(argv) == 1 \
            and _re.fullmatch(r"[\w.]+", argv[0]):
        return [Pred(argv[0], "is_null")]
    if head in ("isNotNull", "isnotnull") and len(argv) == 1 \
            and _re.fullmatch(r"[\w.]+", argv[0]):
        return [Pred(argv[0], "not_null")]
    if head == "in" and len(argv) >= 2 \
            and _re.fullmatch(r"[\w.]+", argv[0]):
        vals = [_parse_literal_token(v) for v in argv[1:]]
        if any(v is _UNPARSEABLE for v in vals):
            return None
        return [Pred(argv[0], "in", tuple(vals))]
    if head in ("=", "<=", ">=", "<", ">", "==") and len(argv) == 2 \
            and _re.fullmatch(r"[\w.]+", argv[0]):
        val = _parse_literal_token(argv[1])
        if val is _UNPARSEABLE:
            return None
        return [Pred(argv[0], {"==": "="}.get(head, head), val)]
    return None


def try_parse_preds(predicate) -> list[Pred] | None:
    """Best-effort conversion of a DML predicate — a SQL string or a
    pyspark ``Column`` — into pruning ``Pred``s, or ``None`` when the
    shape is outside the conjunction-of-(col op literal) fragment.

    Callers use the result ONLY for metadata pruning and always
    re-apply the original predicate as the residual filter, so a
    ``None`` (or a partial parse we refuse) costs performance, never
    correctness — the same inexact-filter contract as the scan
    (table.rs:253-261). This is how ``Table.delete_where_pos`` bounds
    a point DELETE's hit scan to candidate files instead of planning
    the whole table (the reference's two-level pruning feeds every
    scan, datafusion_iceberg/src/table.rs:337-427)."""
    import re as _re
    if isinstance(predicate, str):
        text = predicate
        if len(_split_top(text, " OR ")) > 1:
            # a top-level disjunction cannot be pruned as a
            # conjunction — e.g. "id = 1 OR flag IS NULL AND d = X"
            # must NOT prune on d alone (that drops files matching
            # only via the id=1 branch)
            return None
        terms = _split_top(text, " AND ")
        preds = []
        for t in terms:
            t = _strip_parens(t)
            p = _parse_sql_term(t)
            if p is None:
                return None
            preds.append(p)
        return preds or None
    if isinstance(predicate, Column):
        s = repr(predicate)
        m = _re.match(r"^Column<'(.*)'>$", s, _re.DOTALL)
        if not m or "\\" in m.group(1):
            # backslash-escaped quotes would mis-tokenize to a WRONG
            # literal — pruning with a wrong value could drop matching
            # files, so refuse (costs pruning, never correctness)
            return None
        try:
            return _parse_prefix(m.group(1))
        except ValueError:
            return None
    return None
