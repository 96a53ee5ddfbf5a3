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

``remove_orphan_files`` — delete data files under the table location
that no live snapshot's manifests reference (left behind by failed
writes whose commit lost the CAS race, or by expired snapshots). An
``older_than_ms`` guard skips recently written files so an in-flight
append that has written data but not yet committed is never clobbered.
The referenced-file set is read driver-side from manifests (metadata is
O(files), small); at 100 TB the *listing* side is the expensive half —
above ``PARALLEL_LIST_THRESHOLD`` directories the walk fans out over
Spark executors.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

from iceberg_rust_archive_spark.table import Table

PARALLEL_LIST_THRESHOLD = 256


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


def remove_orphan_files(table: Table, older_than_ms: int | None = None,
                        spark: SparkSession | None = None) -> list[str]:
    """Delete unreferenced files under ``<location>/data``; returns the
    deleted paths. Files with mtime >= older_than_ms (default: 3h ago)
    are kept — they may belong to an uncommitted in-flight write."""
    from iceberg_rust_archive_spark.sources.manifests import (
        read_manifest, read_manifest_list,
    )
    if older_than_ms is None:
        older_than_ms = int(time.time() * 1000) - 3 * 3600 * 1000
    md = table.metadata
    referenced: set[str] = set()
    seen_lists: set[str] = set()
    for snap in md.snapshots.values():
        if snap.manifest_list in seen_lists:
            continue
        seen_lists.add(snap.manifest_list)
        for mle in read_manifest_list(snap.manifest_list):
            for e in read_manifest(mle.manifest_path):
                referenced.add(os.path.abspath(
                    e.data_file.file_path.replace("file:", "")))
    data_dir = os.path.join(md.location, "data")
    candidates: list[str] = []
    dirs = [d for d, _, _ in os.walk(data_dir)] if os.path.isdir(data_dir) \
        else []
    if spark is not None and len(dirs) > PARALLEL_LIST_THRESHOLD:
        listed = (spark.sparkContext.parallelize(dirs, min(len(dirs), 256))
                  .flatMap(lambda d: [os.path.join(d, f)
                                      for f in os.listdir(d)
                                      if os.path.isfile(os.path.join(d, f))])
                  .collect())
        candidates = listed
    else:
        for d in dirs:
            for f in os.listdir(d):
                p = os.path.join(d, f)
                if os.path.isfile(p):
                    candidates.append(p)
    removed = []
    for p in candidates:
        ap = os.path.abspath(p)
        if ap in referenced:
            continue
        if os.path.getmtime(ap) * 1000 >= older_than_ms:
            continue
        os.remove(ap)
        removed.append(ap)
    return removed
