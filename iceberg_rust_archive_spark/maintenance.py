"""Table maintenance operations.

``compact_table`` — rewrite the table's current contents into
target-sized data files and commit as a Replace. The scan applies
pending equality deletes, so compaction also *absorbs* delete files
(merge-on-read debt becomes zero) — after it, reads are pure data-file
scans again. Old files are physically removed post-commit, matching the
reference's Replace behavior (transaction/mod.rs:377-379 →
table/mod.rs:359-411; it has no explicit compaction API, but a
100 TB deployment of this engine needs one: the streaming sink commits
one snapshot per micro-batch, and small files otherwise accumulate
without bound).

``expire_snapshots`` — drop snapshot metadata entries older than a
cutoff while keeping every snapshot still referenced by a branch/tag
ref (retention semantics of SnapshotReference, snapshot.rs:258-297).
Metadata-only: data files of expired snapshots that are still part of
the current state are untouched.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from iceberg_rust_archive_spark.table import Table


def compact_table(spark: SparkSession, table: Table,
                  branch: str | None = None) -> Table:
    """Rewrite current table state into fresh files (Replace commit)."""
    df = table.scan(spark, branch=branch)
    return table.overwrite(spark, df, branch=branch)


def expire_snapshots(table: Table, older_than_ms: int) -> Table:
    """Remove snapshot entries with timestamp < older_than_ms, except
    those pinned by refs; rewrites table metadata via the catalog CAS."""
    md = table.metadata
    keep_ids = {r.snapshot_id for r in md.refs.values()}
    current = md.current_snapshot()
    if current is not None:
        keep_ids.add(current.snapshot_id)
    kept = {sid: s for sid, s in md.snapshots.items()
            if sid in keep_ids or s.timestamp_ms >= older_than_ms}
    import dataclasses
    new_md = dataclasses.replace(
        md, snapshots=kept,
        snapshot_log=tuple(e for e in md.snapshot_log
                           if e.get("snapshot-id") in kept))
    table.catalog.update_tabular(table.identifier, new_md,
                                 table.metadata_location)
    return table.refresh()
