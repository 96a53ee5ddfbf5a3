"""Minimal SQL analysis for the MV rewriter and the DDL shim.

The reference extracts source relations with a sqlparser visitor
(iceberg-rust/src/sql.rs:12-21) and classifies refresh strategy by logical
plan shape (materialized_view/mod.rs:370-415). We operate on the SQL text
of the limited grammar the reference's MV tests use (SELECT-FROM-JOIN-
WHERE-GROUP BY); anything outside it is classified FULL (always-correct
fallback, exactly the reference's behavior for unknown plan nodes).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from iceberg_rust_archive_spark.predicates import (
    _mask_quoted, _scan_quoted, _split_top,
)

_AGG_RE = re.compile(r"^(sum|count|min|max|avg)\s*\((.*)\)$",
                     re.IGNORECASE | re.DOTALL)
_RELATION_RE = re.compile(r"\b(?:from|join)\s+([A-Za-z_][\w.]*)",
                          re.IGNORECASE)


def find_relations(sql: str) -> list[str]:
    """Source tables of a query (sql.rs:12-21). Subqueries contribute their
    own FROM/JOIN matches; duplicates removed, order preserved. Scans the
    literal-MASKED text so 'from x' inside a string literal never adds a
    phantom relation (identifiers live outside quotes, so matches read
    the same either way)."""
    seen, out = set(), []
    for m in _RELATION_RE.finditer(_mask_quoted(sql)):
        name = m.group(1)
        if name.lower() not in seen:
            seen.add(name.lower())
            out.append(name)
    return out


_COMMA_FROM_RE = re.compile(
    r"\bfrom\s+[A-Za-z_][\w.]*(?:\s+(?:as\s+)?\w+)?\s*,", re.IGNORECASE)
_JOIN_SHAPE_RE = re.compile(
    r"\bjoin\b|\b(?:in|exists)\s*\(\s*select\b", re.IGNORECASE)


def is_join_shaped(sql: str, masked: str | None = None) -> bool:
    """True when the statement can APPLY a broadcast hint: an explicit
    JOIN, a comma-list FROM (implicit cross/inner join), or an
    IN/EXISTS subquery (Spark rewrites those to left-semi/anti joins
    whose build side accepts the hint). The single definition shared
    by the engine's SQL surface and the MV refresh rewriter — r15
    shipped two divergent copies and an MV defined with `FROM a, b
    WHERE …` or an IN-subquery silently lost its broadcast hint in the
    refresh replay (perf-only, results unaffected). Pass ``masked``
    when the caller already holds ``_mask_quoted(sql)``."""
    m = masked if masked is not None else _mask_quoted(sql)
    return bool(_COMMA_FROM_RE.search(m)) or bool(_JOIN_SHAPE_RE.search(m))


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Depth-0 split via the engine's quote-complete splitter (doubled
    quotes, backticks, raw strings, backslash escapes — the naive
    in_str tracker this replaces desynced on every one of those)."""
    return [p for p in (x.strip() for x in _split_top(s, sep)) if p]


@dataclass
class SelectItem:
    expr: str
    alias: str | None = None
    agg_fn: str | None = None    # sum|count|min|max|avg for top-level aggs
    agg_inner: str | None = None

    @property
    def out_name(self) -> str:
        if self.alias:
            return self.alias
        # a bare (possibly qualified) column ref surfaces as its last
        # segment in the output schema ("o.st" → "st")
        if re.fullmatch(r"[A-Za-z_]\w*(\.[A-Za-z_]\w*)*", self.expr):
            return self.expr.rsplit(".", 1)[-1]
        return self.expr


@dataclass
class ParsedSelect:
    items: list[SelectItem] = field(default_factory=list)
    relations: list[str] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    has_order_by: bool = False
    has_window: bool = False
    has_distinct: bool = False
    has_subquery: bool = False
    has_outer_join: bool = False
    # both break the one-delta-view-per-relation assumption of the
    # incremental rewrites: a self-join ("FROM t a JOIN t b") would bind
    # every mention to the SAME delta view (computing dA⋈dA and dropping
    # the dA⋈A_old / A_new⋈dA cross terms), and a comma-style FROM list
    # only captures its first relation. Classified FULL (always correct).
    has_repeated_relation: bool = False
    has_comma_from: bool = False
    # HAVING filters on the TOTAL aggregate; a delta pass would apply it
    # to the delta-local aggregate and drop groups whose delta fails but
    # whose merged total passes. Classified FULL (always correct).
    has_having: bool = False
    # LIMIT bounds the TOTAL result; an incremental append/merge would
    # grow past it. Classified FULL.
    has_limit: bool = False

    @property
    def is_aggregate(self) -> bool:
        return bool(self.group_by) or any(i.agg_fn for i in self.items)

    def agg_items(self) -> list[SelectItem]:
        return [i for i in self.items if i.agg_fn]

    def key_items(self) -> list[SelectItem]:
        return [i for i in self.items if not i.agg_fn]


_ALIAS_RE = re.compile(r"^(.*?)\s+as\s+([A-Za-z_]\w*)$",
                       re.IGNORECASE | re.DOTALL)


def parse_select(sql: str) -> ParsedSelect:
    text = sql.strip().rstrip(";")
    p = ParsedSelect(relations=find_relations(text))
    # structure is read from the literal-MASKED text (spans slice the
    # original): 'order by' / 'group by' / 'from' INSIDE a string
    # literal is data — binding on it either misclassified the MV
    # (conservative) or extracted garbage group-by keys (not)
    masked = _mask_quoted(text)
    low = masked.lower()
    p.has_order_by = bool(re.search(r"\border\s+by\b", low))
    p.has_window = bool(re.search(r"\bover\s*\(", low))
    p.has_distinct = bool(re.search(r"\bselect\s+distinct\b", low))
    p.has_outer_join = bool(re.search(r"\b(left|right|full)\s+(outer\s+)?join\b",
                                      low))
    mentions = [m.group(1).lower()
                for m in _RELATION_RE.finditer(masked)]
    p.has_repeated_relation = len(mentions) != len(set(mentions))
    fm = re.search(r"\bfrom\s+(.*?)(?:\bwhere\b|\bgroup\s+by\b|"
                   r"\border\s+by\b|\bhaving\b|\blimit\b|$)",
                   masked, re.IGNORECASE | re.DOTALL)
    if fm:
        p.has_comma_from = len(split_top_level(
            text[fm.start(1):fm.end(1)])) > 1
    body = re.search(r"select\s+(.*?)\s+from\s", masked,
                     re.IGNORECASE | re.DOTALL)
    if body:
        p.has_subquery = "select" in masked[body.end():].lower()
        for raw in split_top_level(text[body.start(1):body.end(1)]):
            alias = None
            m = _ALIAS_RE.match(raw)
            expr = raw
            if m:
                expr, alias = m.group(1).strip(), m.group(2)
            item = SelectItem(expr=expr, alias=alias)
            am = _AGG_RE.match(expr)
            if am:
                item.agg_fn = am.group(1).lower()
                item.agg_inner = am.group(2).strip()
            p.items.append(item)
    p.has_having = bool(re.search(r"\bhaving\b", low))
    p.has_limit = bool(re.search(r"\blimit\s+\d", low))
    g = re.search(r"\bgroup\s+by\s+(.*?)(\bhaving\b|\border\s+by\b"
                  r"|\blimit\b|$)", masked, re.IGNORECASE | re.DOTALL)
    if g:
        p.group_by = split_top_level(text[g.start(1):g.end(1)].strip())
    return p


def split_union(sql: str) -> tuple[list[str], str | None]:
    """Split a TOP-LEVEL ``UNION [ALL]`` query into its branches.

    Returns ``([sql], None)`` when no top-level union exists, else
    ``(branches, kind)`` with ``kind`` = ``'all'`` when every connector
    is UNION ALL, ``'distinct'`` otherwise (a single bare UNION makes
    the whole chain distinct-deduplicating, so the incremental rewrite
    must not touch it). Unions inside parentheses (subqueries) and
    string literals are ignored — they belong to a nested scope."""
    text = sql.strip().rstrip(";")
    parts: list[str] = []
    kinds: list[str] = []
    depth, i, n, cur_start = 0, 0, len(text), 0
    while i < n:
        ch = text[i]
        if ch in ("'", '"', "`"):
            # quote-complete jump (doubled quotes, raw strings,
            # backslash escapes, backtick identifiers)
            i = _scan_quoted(text, i)
            continue
        if ch == "(":
            depth += 1
            i += 1
            continue
        if ch == ")":
            depth -= 1
            i += 1
            continue
        if depth == 0 and ch in "uU":
            m = re.match(r"union\b(\s+all\b)?", text[i:], re.IGNORECASE)
            prev = text[i - 1] if i else " "
            if m and not (prev.isalnum() or prev == "_"):
                parts.append(text[cur_start:i])
                kinds.append("all" if m.group(1) else "distinct")
                i += m.end()
                cur_start = i
                continue
        i += 1
    if not parts:
        return [text], None
    parts.append(text[cur_start:])
    kind = "all" if all(k == "all" for k in kinds) else "distinct"
    return [_strip_outer_parens(p) for p in parts], kind


def _strip_outer_parens(s: str) -> str:
    """``(SELECT ...) UNION ALL (SELECT ...)`` is legal SQL — peel each
    branch's enclosing parens (only when they match each other, so a
    branch like ``(a) x JOIN (b) y`` is left alone)."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(s) - 1:
                    return s  # first paren closes early — not enclosing
        s = s[1:-1].strip()
    return s


def strip_order_by(sql: str) -> str:
    """Drop the query's TOP-LEVEL ORDER BY tail. Masked scan: 'order by'
    inside a string literal must not truncate the query from mid-
    literal; depth gate: an ORDER BY inside a parenthesized subquery
    belongs to that scope (parens inside literals are masked away, so
    the depth count is literal-proof too)."""
    text = sql.strip().rstrip(";")
    masked = _mask_quoted(text)
    for m in re.finditer(r"\border\s+by\b", masked, re.IGNORECASE):
        prefix = masked[:m.start()]
        if prefix.count("(") == prefix.count(")"):
            return text[:m.start()].strip()
    return text


def rewrite_relations(sql: str, mapping: dict[str, str]) -> str:
    """Replace table identifiers after FROM/JOIN with view names —
    matched on the literal-MASKED text so 'from x' inside a string
    literal survives verbatim."""
    masked = _mask_quoted(sql)
    out, last = [], 0
    for m in re.finditer(r"\b(from|join)\s+([A-Za-z_][\w.]*)", masked,
                         re.IGNORECASE):
        kw = sql[m.start(1):m.end(1)]
        name = sql[m.start(2):m.end(2)]
        out.append(sql[last:m.start()])
        out.append(f"{kw} {mapping.get(name.lower(), name)}")
        last = m.end()
    out.append(sql[last:])
    return "".join(out)
