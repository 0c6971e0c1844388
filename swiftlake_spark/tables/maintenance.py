"""Table maintenance: small-file compaction, snapshot expiry, vacuum.

The reference leans on Iceberg for table maintenance and on its writer
for target file sizes (``write.target-file-size-bytes``,
``WriteUtil.splitParquetFile``, SURVEY.md §2.A A19); a lakehouse needs
the reverse operation too — binpacking small files — plus snapshot
expiry and orphan-file removal.  All three are metadata-first:

- :func:`compact` rewrites only partitions whose files are below the
  target size, one Spark job per compaction batch;
- :func:`expire_snapshots` trims the snapshot log (refs and the current
  lineage are always kept);
- :func:`vacuum` deletes data/manifest files no remaining snapshot
  references (run expire first; two-phase so a concurrent reader of a
  kept snapshot never loses files).
"""

from __future__ import annotations

import os
from typing import Any

from swiftlake_spark.tables.metadata import (
    ManifestEntry,
    Snapshot,
    now_ms,
    write_new_version,
)
from swiftlake_spark.tables.table import Table


def compact(
    table: Table,
    *,
    target_file_size_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    branch: str = "main",
) -> Snapshot | None:
    """Binpack small files per partition: any partition with ≥min_files
    files under the target size gets its small files rewritten into
    target-sized ones.  Returns the new snapshot, or None if nothing to
    do."""
    current = table.meta.read_manifest(table.meta.current_snapshot(branch))
    by_part: dict[tuple, list[ManifestEntry]] = {}
    for e in current:
        key = tuple(sorted(e.partition.items()))
        by_part.setdefault(key, []).append(e)

    to_rewrite: list[ManifestEntry] = []
    for _, entries in by_part.items():
        small = [e for e in entries if e.size_bytes < target_file_size_bytes]
        if len(small) >= min_files:
            to_rewrite.extend(small)
    if not to_rewrite:
        return None

    src = table._read_entries(to_rewrite)
    # coalesce toward the target size: estimate output file count from
    # input bytes (compressed) and write that many partitions per group
    total = sum(e.size_bytes for e in to_rewrite)
    n_out = max(1, total // target_file_size_bytes + 1)
    new_entries = table._write_files(src.coalesce(int(n_out)) if not table.transforms else src)
    removed = {e.path for e in to_rewrite}

    def mutate(cur):
        return [e for e in cur if e.path not in removed] + new_entries

    def validate(cur):
        from swiftlake_spark.tables.metadata import CommitConflict

        missing = removed - {e.path for e in cur}
        if missing:
            raise CommitConflict(f"files compacted away concurrently: {sorted(missing)[:3]}")

    return table._commit(
        op="replace",
        branch=branch,
        mutate=mutate,
        validate=validate,
        summary={
            "compacted-files": len(removed),
            "added-files": len(new_entries),
            "rewritten-bytes": total,
        },
    )


def expire_snapshots(
    table: Table,
    *,
    older_than_ms: int | None = None,
    keep_last: int = 1,
) -> list[int]:
    """Drop snapshots from the log.  Kept: every ref target (branches and
    tags) and the ``keep_last`` most recent snapshots.  Ancestors are NOT
    specially kept — manifests are complete per snapshot, so current
    reads never depend on history; time travel to an expired snapshot
    stops working (Iceberg's expire semantics).  Returns expired ids."""
    meta = table.meta
    keep: set[int] = set(meta.refs.values())
    recent = sorted(meta.snapshots, key=lambda s: s.timestamp_ms)[-keep_last:]
    keep.update(s.snapshot_id for s in recent)

    cutoff = older_than_ms if older_than_ms is not None else now_ms() + 1
    expired = [
        s.snapshot_id
        for s in meta.snapshots
        if s.snapshot_id not in keep and s.timestamp_ms < cutoff
    ]
    if not expired:
        return []
    meta.snapshots = [s for s in meta.snapshots if s.snapshot_id not in set(expired)]
    write_new_version(meta)
    return expired


def vacuum(table: Table, *, dry_run: bool = False) -> dict[str, Any]:
    """Delete data files and manifests referenced by NO remaining
    snapshot.  Returns {'data_files': [...], 'manifests': [...]}."""
    meta = table.meta
    live_data: set[str] = set()
    live_manifests: set[str] = set()
    for s in meta.snapshots:
        live_manifests.add(os.path.basename(s.manifest))
        for e in meta.read_manifest(s):
            live_data.add(os.path.normpath(e.path))

    orphan_data: list[str] = []
    data_root = os.path.join(meta.location, "data")
    for root, _dirs, files in os.walk(data_root):
        for fn in files:
            rel = os.path.normpath(
                os.path.relpath(os.path.join(root, fn), meta.location)
            )
            if fn.endswith(".parquet") and rel not in live_data:
                orphan_data.append(rel)
    orphan_manifests = [
        fn
        for fn in os.listdir(meta.metadata_dir)
        if fn.startswith("manifest-") and fn not in live_manifests
    ]
    if not dry_run:
        for rel in orphan_data:
            os.remove(os.path.join(meta.location, rel))
        for fn in orphan_manifests:
            os.remove(os.path.join(meta.metadata_dir, fn))
    return {"data_files": sorted(orphan_data), "manifests": sorted(orphan_manifests)}
