from iceberg_rust_archive_spark.streaming.ops import (  # noqa: F401
    events_stream_windowed, sessionize_stream, table_changes_stream,
)
