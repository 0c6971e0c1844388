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
    # ceil, not floor+1: floor+1 always yields sub-target outputs, so the
    # same partition re-selects on EVERY maintenance run (non-convergent
    # full rewrites forever); also skip when rewriting wouldn't reduce
    # the file count
    n_out = max(1, -(-total // target_file_size_bytes))
    if len(to_rewrite) <= n_out:
        return None
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


def cluster_by(
    table: Table,
    columns: list[str],
    *,
    bits: int | None = None,
    target_file_size_bytes: int = 128 * 1024 * 1024,
    branch: str = "main",
) -> Snapshot | None:
    """Z-order rewrite: relayout the whole table so files are clustered
    on a space-filling curve over ``columns``.

    Multi-column data skipping: a linear sort gives narrow file min/max
    ranges on the *first* sort column only; interleaving the bits of all
    cluster columns gives every column narrow-ish ranges, so manifest
    pruning works for filters on any of them (the same layout Iceberg's
    ``rewrite_data_files(strategy => 'sort', sort_order => 'zorder(..)')``
    and Delta ``OPTIMIZE ZORDER BY`` produce).

    Normalization per column: numerics/timestamps map min→max onto
    ``[0, 2^bits)`` (range locality); strings/binaries hash into the same
    domain (bucketing only — hashes have no order locality).  The key is
    built from shift/and/or expressions — pure whole-stage codegen, no
    Python.  One extra aggregate job computes the per-column bounds
    (driver receives 2·k scalars).

    Scale: the rewrite is one ``repartitionByRange`` shuffle on the
    z-key — the same cost as a sorted write — and the range partitioner
    gives near-uniform output file sizes regardless of key skew.
    Unpartitioned tables only (partition transforms already define the
    coarse layout; cluster within partitions by declaring a sort order).
    """
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    if table.transforms:
        raise ValueError(
            "cluster_by applies to unpartitioned tables; partitioned tables "
            "already have a coarse layout — use the table sort order instead"
        )
    if not columns:
        raise ValueError("cluster_by needs at least one column")
    if table.meta.sort_order:
        raise ValueError(
            "table declares a sort order; z-ordering would fight it — drop "
            "the sort order or keep the sorted layout"
        )
    k = len(columns)
    nbits = bits if bits is not None else min(16, 63 // k)
    if nbits * k > 63:
        raise ValueError(f"bits={nbits} × {k} columns exceeds the 63-bit key")
    mask = (1 << nbits) - 1

    entries = table.meta.read_manifest(table.meta.current_snapshot(branch))
    if not entries:
        return None
    src = table._read_entries(entries)

    numericish = {"tinyint", "smallint", "int", "bigint", "float", "double", "date",
                  "timestamp", "timestamp_ntz"}

    def widen(col: str) -> Column:
        dt = table._dtype(col)
        base = dt.split("(")[0]
        if base in ("date",):
            return F.datediff(F.col(col), F.lit("1970-01-01").cast("date")).cast("double")
        if base in ("timestamp", "timestamp_ntz"):
            return F.unix_micros(F.col(col)).cast("double")
        if base in numericish or base == "decimal":
            return F.col(col).cast("double")
        return None  # hash path

    bounds_exprs = []
    hashed: set[str] = set()
    for c in columns:
        w = widen(c)
        if w is None:
            hashed.add(c)
        else:
            bounds_exprs += [F.min(w).alias(f"mn_{c}"), F.max(w).alias(f"mx_{c}")]
    bounds = src.agg(*bounds_exprs).collect()[0].asDict() if bounds_exprs else {}

    def normalized(c: str) -> Column:
        if c in hashed:
            return F.xxhash64(F.col(c)).bitwiseAND(F.lit(mask))
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            return F.lit(0).cast("long")
        scaled = (widen(c) - F.lit(mn)) / F.lit(mx - mn) * F.lit(float(mask))
        return F.coalesce(F.round(scaled).cast("long"), F.lit(0)).bitwiseAND(F.lit(mask))

    zkey = F.lit(0).cast("long")
    norms = [normalized(c) for c in columns]
    for j in range(nbits):
        for i, nc in enumerate(norms):
            bit = F.shiftright(nc, j).bitwiseAND(F.lit(1))
            zkey = zkey.bitwiseOR(F.shiftleft(bit, j * k + i))

    total = sum(e.size_bytes for e in entries)
    n_out = int(max(1, total // target_file_size_bytes + 1))
    shaped = (
        src.withColumn("__zkey__", zkey)
        .repartitionByRange(n_out, F.col("__zkey__"))
        .sortWithinPartitions("__zkey__")
        .drop("__zkey__")
    )
    new_entries = table._write_files(shaped)
    removed = {e.path for e in entries}

    def mutate(cur):
        return [e for e in cur if e.path not in removed] + new_entries

    def validate(cur):
        from swiftlake_spark.tables.metadata import CommitConflict

        missing = removed - {e.path for e in cur}
        if missing:
            raise CommitConflict(f"files rewritten concurrently: {sorted(missing)[:3]}")

    return table._commit(
        op="replace",
        branch=branch,
        mutate=mutate,
        validate=validate,
        summary={
            "clustered-by": ",".join(columns),
            "zorder-bits": nbits,
            "rewritten-files": len(removed),
            "added-files": len(new_entries),
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
    # [-0:] slices EVERYTHING — keep_last=0 must keep nothing extra
    recent = (
        sorted(meta.snapshots, key=lambda s: s.timestamp_ms)[-keep_last:]
        if keep_last > 0
        else []
    )
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


def vacuum(
    table: Table,
    *,
    dry_run: bool = False,
    older_than_ms: int | None = 3 * 24 * 3600 * 1000,
) -> dict[str, Any]:
    """Delete data files and manifests referenced by NO remaining
    snapshot.  Returns {'data_files', 'manifests', 'metadata_files'}.

    Safety (both matter at any concurrency):
    - liveness is computed against FRESHLY LOADED metadata, never the
      handle's snapshot — a stale handle must not classify files of a
      concurrent commit as orphans;
    - ``older_than_ms`` (default 3 days, Iceberg's remove_orphan_files
      default) skips young files: writers stage parquet under data/
      BEFORE their commit, so an age gate is what keeps vacuum from
      deleting an in-flight write.  Pass 0/None only when no writer can
      be active (tests, offline maintenance windows)."""
    from swiftlake_spark.tables.metadata import load_metadata as _load

    meta = _load(table.location)
    live_data: set[str] = set()
    live_manifests: set[str] = set()
    for s in meta.snapshots:
        live_manifests.add(os.path.basename(s.manifest))
        for e in meta.read_manifest(s):
            live_data.add(os.path.normpath(e.path))

    from swiftlake_spark import fileio as _fio

    io = _fio.fileio_for(meta.location)
    import time as _time

    cutoff = (
        _time.time() - older_than_ms / 1000.0
        if older_than_ms
        else None
    )

    def _old_enough(rel: str) -> bool:
        if cutoff is None:
            return True
        try:
            return io.mtime(_fio.join(meta.location, rel)) <= cutoff
        except (FileNotFoundError, OSError):
            return False

    orphan_data: list[str] = [
        "data/" + sub
        for sub in io.list_recursive(_fio.join(meta.location, "data"))
        if sub.endswith(".parquet")
        and os.path.normpath("data/" + sub) not in live_data
        and _old_enough("data/" + sub)
    ]
    # Manifests get the same age gate as data files and for the same
    # reason: Table._commit writes the manifest BEFORE the metadata
    # version that references it, so a vacuum whose fresh metadata load
    # races ahead of a concurrent commit would otherwise classify that
    # commit's just-staged manifest as orphan and delete it while the
    # commit still succeeds — leaving the new current snapshot pointing
    # at a missing manifest (permanent corruption).
    orphan_manifests = [
        fn
        for fn in io.list(meta.metadata_dir)
        if fn.startswith("manifest-")
        and fn not in live_manifests
        and _old_enough("metadata/" + fn)
    ]
    # catalog-cas loser metadata: only files AT an already-decided head
    # version that are not that version's winner are DEFINITE losers —
    # files above the current version may be in-flight winners (uploaded
    # before their CAS lands), and past-version duplicates are ambiguous
    # (the winner of an old race is unrecorded), so both are kept.  The
    # pointer is re-fetched from the catalog service at vacuum time: a
    # stale handle must never GC around a newer head.
    orphan_meta: list[str] = []
    if meta.pointer_file is not None:
        from swiftlake_spark.catalog_service import default_catalog_service
        from swiftlake_spark.tables.metadata import _CAS_FILE_RE

        live_ptr = default_catalog_service().current(meta.location) or meta.pointer_file
        cur_v = int(live_ptr[1:].split("-", 1)[0])
        for fn in io.list(meta.metadata_dir):
            m = _CAS_FILE_RE.match(fn)
            if m and fn != live_ptr and int(m.group(1)) == cur_v:
                orphan_meta.append(fn)
    if not dry_run:
        for rel in orphan_data:
            io.delete(_fio.join(meta.location, rel))
        for fn in orphan_manifests:
            io.delete(_fio.join(meta.metadata_dir, fn))
        for fn in orphan_meta:
            io.delete(_fio.join(meta.metadata_dir, fn))
    return {
        "data_files": sorted(orphan_data),
        "manifests": sorted(orphan_manifests),
        "metadata_files": sorted(orphan_meta),
    }
