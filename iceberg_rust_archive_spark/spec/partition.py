"""Partition specs and transforms (iceberg-rust-spec/src/spec/partition.rs:36-279).

Transform strings are the Iceberg spec forms: ``identity``, ``bucket[N]``,
``truncate[W]``, ``year``, ``month``, ``day``, ``hour``, ``void``.
Value-level transform semantics live in ``functions.transforms``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNCATE_RE = re.compile(r"^truncate\[(\d+)\]$")
TRANSFORMS = {"identity", "year", "month", "day", "hour", "void"}


def validate_transform(t: str) -> None:
    if t in TRANSFORMS or _BUCKET_RE.match(t) or _TRUNCATE_RE.match(t):
        return
    raise ValueError(f"unknown transform: {t!r}")


def transform_param(t: str) -> int | None:
    m = _BUCKET_RE.match(t) or _TRUNCATE_RE.match(t)
    return int(m.group(1)) if m else None


def transform_result_type(transform: str, source_type: str) -> str:
    """Result type of a transform (types.rs:445-459)."""
    if transform == "identity":
        return source_type
    if transform in ("year", "month", "hour"):
        return "int"
    if transform == "day":
        return "int"  # days-from-epoch ordinal (date-compatible int)
    if _BUCKET_RE.match(transform):
        return "int"
    if _TRUNCATE_RE.match(transform):
        return source_type
    if transform == "void":
        return source_type
    raise ValueError(f"unknown transform: {transform!r}")


@dataclass(frozen=True)
class PartitionField:
    """(source-id, field-id ≥1000, name, transform) (partition.rs:143-200)."""
    source_id: int
    field_id: int
    name: str
    transform: str

    def __post_init__(self):
        validate_transform(self.transform)

    def to_json(self) -> dict:
        return {"source-id": self.source_id, "field-id": self.field_id,
                "name": self.name, "transform": self.transform}

    @staticmethod
    def from_json(d: dict) -> "PartitionField":
        return PartitionField(d["source-id"], d["field-id"], d["name"],
                              d["transform"])


@dataclass(frozen=True)
class PartitionSpec:
    spec_id: int = 0
    fields: tuple[PartitionField, ...] = field(default_factory=tuple)

    def is_unpartitioned(self) -> bool:
        return all(f.transform == "void" for f in self.fields)

    def to_json(self) -> dict:
        return {"spec-id": self.spec_id,
                "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(d: dict) -> "PartitionSpec":
        return PartitionSpec(d.get("spec-id", 0),
                             tuple(PartitionField.from_json(f)
                                   for f in d["fields"]))

    @staticmethod
    def parse_transform_expr(expr: str, next_field_id, schema) -> "PartitionField":
        """Parse ``"month(col)"`` / ``"bucket(16, col)"`` / ``"col"`` style
        transform expressions (mirrors parse_transform regex,
        datafusion_iceberg/src/planner.rs:81-116)."""
        expr = expr.strip()
        m = re.match(r"^(\w+)\(([^)]*)\)$", expr)
        if m:
            fn = m.group(1).lower()
            args = [a.strip() for a in m.group(2).split(",")]
            if fn in ("bucket", "truncate"):
                n, col = int(args[0]), args[1]
                transform = f"{fn}[{n}]"
            else:
                col = args[0]
                transform = {"years": "year", "months": "month", "days": "day",
                             "hours": "hour"}.get(fn, fn)
        else:
            col, transform = expr, "identity"
        f = schema.field_by_name(col)
        if f is None:
            raise KeyError(f"partition source column {col!r} not in schema")
        if f.field_type == "variant":
            # spec §Partitioning: variant has no defined sort/transform
            # semantics — a hash of the binary encoding would split
            # equal values across partitions
            raise ValueError(
                f"variant column {col!r} cannot be a partition source")
        name = col if transform == "identity" else f"{col}_{transform.split('[')[0]}"
        return PartitionField(f.field_id, next_field_id(), name, transform)
