from iceberg_rust_archive_spark.streaming.dedup_stream import (  # noqa: F401
    run_dedup_stream_once,
)
from iceberg_rust_archive_spark.streaming.ops import (  # noqa: F401
    events_stream_windowed, sessionize_stream, table_changes_stream,
)
