"""Iceberg spec layer: metadata types mirroring the reference's
``iceberg-rust-spec`` crate (SURVEY.md §1), pure Python, JSON round-trippable.
"""

from iceberg_rust_archive_spark.spec.types import (  # noqa: F401
    IcebergType, NestedField, StructTypeSpec, ListTypeSpec, MapTypeSpec,
    type_from_json, type_to_json, iceberg_to_spark_type, spark_schema_for,
)
from iceberg_rust_archive_spark.spec.schema import Schema  # noqa: F401
from iceberg_rust_archive_spark.spec.partition import (  # noqa: F401
    PartitionField, PartitionSpec,
)
from iceberg_rust_archive_spark.spec.sort import SortField, SortOrder  # noqa: F401
from iceberg_rust_archive_spark.spec.snapshot import (  # noqa: F401
    Snapshot, SnapshotReference,
)
from iceberg_rust_archive_spark.spec.manifest import (  # noqa: F401
    DataFile, ManifestEntry, ManifestListEntry, FieldSummary,
)
from iceberg_rust_archive_spark.spec.table_metadata import TableMetadata  # noqa: F401
from iceberg_rust_archive_spark.spec.view_metadata import (  # noqa: F401
    ViewMetadata, ViewVersion, MaterializedViewMetadata, RefreshState,
)
