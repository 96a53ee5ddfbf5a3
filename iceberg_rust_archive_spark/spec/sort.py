"""Sort orders (iceberg-rust-spec/src/spec/sort.rs:27-75).

Stored in table metadata for parity with the reference, which stores but
never applies them on write (SURVEY §1.3). Our writer optionally applies
them via ``sortWithinPartitions`` — a strict improvement that keeps files
clustered for min/max pruning.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from iceberg_rust_archive_spark.spec.partition import validate_transform


@dataclass(frozen=True)
class SortField:
    source_id: int
    transform: str = "identity"
    direction: str = "asc"          # asc | desc
    null_order: str = "nulls-first"  # nulls-first | nulls-last

    def __post_init__(self):
        validate_transform(self.transform)
        if self.direction not in ("asc", "desc"):
            raise ValueError(self.direction)
        if self.null_order not in ("nulls-first", "nulls-last"):
            raise ValueError(self.null_order)

    def to_json(self) -> dict:
        return {"source-id": self.source_id, "transform": self.transform,
                "direction": self.direction, "null-order": self.null_order}

    @staticmethod
    def from_json(d: dict) -> "SortField":
        return SortField(d["source-id"], d.get("transform", "identity"),
                         d.get("direction", "asc"),
                         d.get("null-order", "nulls-first"))


@dataclass(frozen=True)
class SortOrder:
    order_id: int = 0
    fields: tuple[SortField, ...] = field(default_factory=tuple)

    def to_json(self) -> dict:
        return {"order-id": self.order_id,
                "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(d: dict) -> "SortOrder":
        return SortOrder(d.get("order-id", 0),
                         tuple(SortField.from_json(f) for f in d["fields"]))
