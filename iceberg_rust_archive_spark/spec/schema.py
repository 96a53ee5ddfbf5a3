"""Versioned schema (iceberg-rust-spec/src/spec/schema.rs:31-108)."""

from __future__ import annotations

from dataclasses import dataclass, field

from iceberg_rust_archive_spark.spec.types import (
    NestedField, StructTypeSpec,
)


@dataclass(frozen=True)
class Schema:
    schema_id: int
    struct: StructTypeSpec
    identifier_field_ids: tuple[int, ...] = field(default_factory=tuple)

    @property
    def fields(self) -> tuple[NestedField, ...]:
        return self.struct.fields

    def field_by_id(self, fid: int) -> NestedField | None:
        # ids can live at any nesting level; search recursively
        def walk(struct: StructTypeSpec):
            for f in struct.fields:
                if f.field_id == fid:
                    return f
                if isinstance(f.field_type, StructTypeSpec):
                    hit = walk(f.field_type)
                    if hit is not None:
                        return hit
            return None
        return walk(self.struct)

    def field_by_name(self, name: str) -> NestedField | None:
        return self.struct.field_by_name(name)

    def project(self, field_ids: list[int]) -> "Schema":
        """Projection by field ids (schema.rs:91-108) — used for
        equality-delete schemas; order follows ``field_ids``."""
        fields = []
        for fid in field_ids:
            f = self.field_by_id(fid)
            if f is None:
                raise KeyError(f"field id {fid} not in schema {self.schema_id}")
            fields.append(f)
        return Schema(self.schema_id, StructTypeSpec(tuple(fields)),
                      self.identifier_field_ids)

    def highest_field_id(self) -> int:
        top = 0

        def walk(t):
            nonlocal top
            from iceberg_rust_archive_spark.spec.types import (
                ListTypeSpec, MapTypeSpec)
            if isinstance(t, StructTypeSpec):
                for f in t.fields:
                    top = max(top, f.field_id)
                    walk(f.field_type)
            elif isinstance(t, ListTypeSpec):
                top = max(top, t.element_id)
                walk(t.element)
            elif isinstance(t, MapTypeSpec):
                top = max(top, t.key_id, t.value_id)
                walk(t.key)
                walk(t.value)
        walk(self.struct)
        return top

    def to_json(self) -> dict:
        d = {"type": "struct", "schema-id": self.schema_id,
             "fields": [f.to_json() for f in self.struct.fields]}
        if self.identifier_field_ids:
            d["identifier-field-ids"] = list(self.identifier_field_ids)
        return d

    @staticmethod
    def from_json(d: dict) -> "Schema":
        return Schema(
            d.get("schema-id", 0),
            StructTypeSpec(tuple(NestedField.from_json(f) for f in d["fields"])),
            tuple(d.get("identifier-field-ids", ())),
        )
