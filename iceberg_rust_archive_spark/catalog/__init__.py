"""Catalog backends (SURVEY §2 A26-A29): pointer-to-metadata stores with
optimistic-CAS commits."""

from iceberg_rust_archive_spark.catalog.base import (  # noqa: F401
    Catalog, CommitFailedError, NoSuchTableError, TableAlreadyExistsError,
)
from iceberg_rust_archive_spark.catalog.file_catalog import FileCatalog  # noqa: F401
from iceberg_rust_archive_spark.catalog.glue_catalog import GlueCatalog  # noqa: F401
from iceberg_rust_archive_spark.catalog.rest_catalog import RestCatalog  # noqa: F401
from iceberg_rust_archive_spark.catalog.s3tables_catalog import (  # noqa: F401
    S3TablesCatalog,
)
from iceberg_rust_archive_spark.catalog.sql_catalog import SqlCatalog  # noqa: F401
