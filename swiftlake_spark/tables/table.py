"""Table: pruned scans, transactional writes, copy-on-write DML.

Spark-first re-design of the reference's scan/write machinery
(SURVEY.md §2.A):

- scan      ≙ A1/A2: manifest pruning (partition projection + min/max
  stats) before Spark ever lists a file; residual filter compiled to a
  Catalyst Column so parquet row-group pruning also applies.
- append    ≙ A10/A18/A19/A20: hash-distributed partitioned write with
  in-partition sort, footer stats harvested into the manifest.
- overwrite ≙ A11: strict filter overwrite — a file that only partially
  matches fails the commit (writer/Transaction.java:266-278).
- update    ≙ A12: distinct-touched-file probe, rewrite only those files
  with CASE WHEN (commands/Update.java:125-210, dao/update.xml:10-24).
- delete    ≙ A13: files fully covered by the predicate are dropped from
  the manifest without being read; partially-matching files rewritten
  with NOT(cond) (commands/Delete.java:106-180).
- commit    ≙ A21: optimistic metadata-version claim, retry loop with
  conflict validation (deleted files must still exist; SERIALIZABLE
  additionally rejects concurrently-added files matching the conflict
  filter).

Scale notes: data moves only through Spark jobs (no collect of rows —
the only driver materialization is file *names*, same as the reference's
distinct-filename probe); writes distribute by partition hash; the
manifest prune is O(files) driver-side, the same cost Iceberg pays.
"""

from __future__ import annotations

import datetime as dt
import os
import urllib.parse
import uuid
from typing import Any, Callable, Iterable, Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.expressions import Expr, FileStatsView
from swiftlake_spark.tables.metadata import (
    CommitConflict,
    ManifestEntry,
    Snapshot,
    TableMetadata,
    ValidationError,
    load_metadata,
    new_snapshot_id,
    now_ms as _now_ms,
    write_manifest,
    write_new_version,
)
from swiftlake_spark.tables import transforms as TR
from swiftlake_spark.tables.transforms import Transform

_PCOL = "__p__"  # physical partition-column prefix (keeps source cols in files)
_MAX_COMMIT_RETRIES = 5


class Table:
    def __init__(
        self,
        spark: SparkSession,
        meta: TableMetadata,
        guard=None,
        metric_collectors=None,
    ) -> None:
        self.spark = spark
        self.meta = meta
        self.guard = guard  # plans.guards.ScanGuard | None
        self.last_scan_metrics = None  # plans.metrics.ScanMetrics | None
        # shared list (engine-owned): callables receiving ScanMetrics /
        # CommitMetrics (≙ reference metrics/MetricCollector.java) —
        # held by reference so collectors added after table creation
        # still see this table's events
        self.metric_collectors = metric_collectors if metric_collectors is not None else []
        self.last_commit_metrics = None  # plans.metrics.CommitMetrics | None

    # ------------------------------------------------------------ basics
    @property
    def location(self) -> str:
        return self.meta.location

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.meta.schema_json)

    @property
    def transforms(self) -> list[Transform]:
        return [
            Transform(d["name"], d["source"], d.get("param"))
            for d in self.meta.partition_spec
        ]

    def refresh(self) -> "Table":
        self.meta = load_metadata(self.meta.location)
        return self

    def _dtype(self, col: str) -> str:
        return self.schema[col].dataType.simpleString()

    # --------------------------------------------------------- storage
    @property
    def _remote(self) -> bool:
        """True when the table lives on a non-filesystem FileIO backend
        (currently the mem:// object-store fake)."""
        loc = self.location
        return "://" in loc and not loc.startswith("file://")

    def _abs_paths(self, rels: list[str]) -> list[str]:
        """Local filesystem paths for table-relative data files, staging
        through FileIO for remote tables (≙ SwiftLakeS3FileIO
        newInputFiles download-to-staging).  Scale note: driver-side
        staging fits the in-process fake; a production object store
        whose scheme Spark reads natively (s3a://) should pass URIs to
        the scan directly — that's a new FileIO subclass whose
        local_path is identity for Spark-readable paths."""
        if not self._remote:
            return [os.path.join(self.location, r) for r in rels]
        from swiftlake_spark import fileio as _fio

        io = _fio.fileio_for(self.location)
        return [io.local_path(_fio.join(self.location, r)) for r in rels]

    # ------------------------------------------------------------ scan
    def scan(
        self,
        filter: Expr | None = None,
        *,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        branch: str = "main",
        tag: str | None = None,
        with_file_name: bool = False,
        filter_rows: bool = True,
    ) -> DataFrame:
        """Pruned read.  ``filter`` prunes at the manifest level AND is
        applied as a row filter (files may contain non-matching rows).
        ``filter_rows=False`` keeps the manifest prune but skips the row
        filter — for callers whose own query re-applies the predicate
        verbatim (resolve_sql's extracted conjuncts), so the pruning
        expression can never alter row semantics, only the file list."""
        import time as _time

        from swiftlake_spark.plans.metrics import ScanMetrics

        t0 = _time.perf_counter()
        snap = self._resolve_snapshot(snapshot_id, as_of_ms, branch, tag)
        all_entries = self.meta.read_manifest(snap)
        entries = self.prune(all_entries, filter)
        if self.guard is not None:
            self.guard.check(self.meta.location, filter, entries)
        self.last_scan_metrics = ScanMetrics(
            table=self.meta.location,
            total_files=len(all_entries),
            scanned_files=len(entries),
            pruned_files=len(all_entries) - len(entries),
            scanned_bytes=sum(e.size_bytes for e in entries),
            scanned_records=sum(e.records for e in entries),
            planning_ms=(_time.perf_counter() - t0) * 1000,
        )
        if self.metric_collectors:
            from swiftlake_spark.plans.metrics import dispatch

            dispatch(self.metric_collectors, self.last_scan_metrics)
        df = self._read_entries(entries, with_file_name=with_file_name)
        if filter is not None and filter_rows:
            df = df.filter(filter.column())
        return df

    def history(self) -> DataFrame:
        from swiftlake_spark.plans.metrics import table_history

        return table_history(self.spark, self)

    def files(self, branch: str = "main") -> DataFrame:
        """Manifest as a DataFrame (path, records, bytes, partition JSON) —
        a queryable metadata table, which the reference explicitly cannot
        expose (README.md:66-68)."""
        import json as _json

        rows = [
            {
                "path": e.path,
                "records": e.records,
                "size_bytes": e.size_bytes,
                "partition": _json.dumps(e.partition, default=str, sort_keys=True),
            }
            for e in self.meta.read_manifest(self.meta.current_snapshot(branch))
        ]
        return self.spark.createDataFrame(
            rows, schema="path STRING, records BIGINT, size_bytes BIGINT, partition STRING"
        )

    def partitions(self, branch: str = "main") -> DataFrame:
        """Per-partition rollup from the manifest alone (files, records,
        bytes) — ≙ Iceberg's ``db.t.partitions`` metadata table, computed
        without touching data (reference A23 exposes only record counts
        via ``getPartitionLevelRecordCounts``)."""
        import json as _json

        agg: dict[str, dict] = {}
        for e in self.meta.read_manifest(self.meta.current_snapshot(branch)):
            key = _json.dumps(e.partition, default=str, sort_keys=True)
            a = agg.setdefault(
                key, {"partition": key, "files": 0, "records": 0, "size_bytes": 0}
            )
            a["files"] += 1
            a["records"] += e.records
            a["size_bytes"] += e.size_bytes
        return self.spark.createDataFrame(
            list(agg.values()) or [],
            schema="partition STRING, files BIGINT, records BIGINT, size_bytes BIGINT",
        )

    def prune(
        self, entries: list[ManifestEntry], filter: Expr | None
    ) -> list[ManifestEntry]:
        if filter is None or isinstance(filter, E.AlwaysTrue):
            return entries
        # inclusive partition projection for every transform, ANDed with
        # direct stats evaluation of the source predicate
        projected: Expr = filter
        for t in self.transforms:
            projected = E.and_(projected, t.project(filter))
        return [
            e
            for e in entries
            if projected.eval_stats(e.stats_view(self._rename_map(e))) is not False
        ]

    def _rename_map(self, e: ManifestEntry) -> dict[str, str] | None:
        """file-time column name → current name, via field IDs.  None when
        the file's names already match (fast path)."""
        if not e.column_ids:
            return None
        # the inverse map is per-metadata-state, not per-entry: memoize it
        # (prune calls this once per manifest entry — O(files × columns)
        # dict builds otherwise)
        key = (self.meta.version, len(self.meta.field_ids))
        cached = self.__dict__.get("_id_map_cache")
        if cached is not None and cached[0] == key:
            id_to_current = cached[1]
        else:
            id_to_current = {fid: n for n, fid in self.meta.field_ids.items()}
            self.__dict__["_id_map_cache"] = (key, id_to_current)
        m = {
            fname: id_to_current[fid]
            for fname, fid in e.column_ids.items()
            if fid in id_to_current and id_to_current[fid] != fname
        }
        return m or None

    def _read_entries(
        self, entries: list[ManifestEntry], with_file_name: bool = False
    ) -> DataFrame:
        schema = self.schema
        if not entries:
            df = self.spark.createDataFrame([], schema)
            return df.withColumn("_file", F.lit(None).cast("string")) if with_file_name else df

        # Group files by their field-ID → name mapping so renamed columns
        # resolve by ID, not name (≙ SchemaEvolution.java:200-236 grouping
        # by distinct file schema + UNION ALL BY NAME; here the per-group
        # projection renames/NULL-fills and unionByName recombines).
        groups: dict[tuple, list[ManifestEntry]] = {}
        for e in entries:
            groups.setdefault(tuple(sorted(e.column_ids.items())), []).append(e)

        from swiftlake_spark.tables import evolution as EV

        parts: list[DataFrame] = []
        for key, es in groups.items():
            paths = self._abs_paths([e.path for e in es])
            if not key:  # legacy files: names match current schema
                plans = [(None, None, paths)]
            else:
                # ID-based resolution at every depth: renamed fields read
                # under their file-time names and re-alias, retired IDs
                # NULL-fill, widened leaves upcast in the parquet reader;
                # nested rebuilds are Catalyst struct/transform expressions
                # (evolution.build_read_plan, ≙ SchemaEvolution.java:511-587)
                plans = EV.plan_file_group(schema, self.meta.field_ids, dict(key), paths)
            for read_schema, select_cols, fpaths in plans:
                if read_schema is None:
                    df = self.spark.read.schema(schema).parquet(*fpaths)
                else:
                    df = (
                        self.spark.read.schema(read_schema)
                        .parquet(*fpaths)
                        .select(*select_cols)
                    )
                if with_file_name:
                    df = df.withColumn("_file", F.input_file_name())
                parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _resolve_snapshot(
        self,
        snapshot_id: int | None,
        as_of_ms: int | None,
        branch: str,
        tag: str | None,
    ) -> Snapshot | None:
        if snapshot_id is not None:
            return self.meta.snapshot_by_id(snapshot_id)
        if tag is not None:
            sid = self.meta.refs.get(f"tag:{tag}")
            if sid is None:
                raise ValueError(f"unknown tag {tag!r}")
            return self.meta.snapshot_by_id(sid)
        if branch != "main" and f"branch:{branch}" not in self.meta.refs:
            # consistent with unknown tags: a typo'd branch must raise,
            # not silently read as an empty table
            raise ValueError(f"unknown branch {branch!r}")
        if as_of_ms is not None:
            return self.meta.snapshot_as_of(as_of_ms, branch)
        return self.meta.current_snapshot(branch)

    # --------------------------------------------------- partition stats
    def partition_record_counts(
        self, filter: Expr | None = None, branch: str = "main"
    ) -> list[tuple[dict[str, Any], int]]:
        """Record counts per partition straight from the manifest, no data
        read (reference A23, IcebergScanExecutor.java:515-570)."""
        entries = self.prune(self.meta.read_manifest(self.meta.current_snapshot(branch)), filter)
        acc: dict[tuple, int] = {}
        keys: dict[tuple, dict] = {}
        for e in entries:
            k = tuple(sorted(e.partition.items()))
            acc[k] = acc.get(k, 0) + e.records
            keys[k] = e.partition
        return [(keys[k], n) for k, n in sorted(acc.items())]

    # ------------------------------------------------------------ writes
    def append(
        self, df: DataFrame, branch: str = "main", skip_sort: bool = False,
        extra_summary: dict | None = None,
    ) -> Snapshot:
        new_entries = self._write_files(df, skip_sort=skip_sort)
        return self._commit(
            op="append",
            branch=branch,
            mutate=lambda current: current + new_entries,
            validate=None,
            summary={
                "added-files": len(new_entries),
                "added-records": sum(e.records for e in new_entries),
                **(extra_summary or {}),
            },
        )

    def overwrite_by_filter(
        self, df: DataFrame, filter: Expr, branch: str = "main",
        validate_added: bool = True, skip_sort: bool = False,
        extra_summary: dict | None = None, isolation: str = "snapshot",
    ) -> Snapshot:
        """Replace every file whose rows ALL match ``filter`` with ``df``.
        Files that might contain both matching and non-matching rows fail
        the operation (strict semantics, reference A11)."""
        if validate_added and df is not None:
            # non-match = NOT TRUE, which includes NULL-evaluating rows —
            # a bare ~cond would let rows outside the filter domain slip
            # past the strict check (3VL: ~NULL is NULL, filtered out)
            bad = df.filter(~F.coalesce(filter.column(), F.lit(False))).limit(1).count()
            if bad:
                raise ValidationError("added rows do not all match the overwrite filter")
        new_entries = self._write_files(df, skip_sort=skip_sort) if df is not None else []

        def mutate(current: list[ManifestEntry]) -> list[ManifestEntry]:
            keep: list[ManifestEntry] = []
            for e in current:
                v = filter.eval_stats(e.stats_view(self._rename_map(e)))
                if v is True:
                    continue  # fully replaced
                if v is None:
                    # strict check could not prove all-or-nothing from
                    # stats → verify row-level (reads just this file).
                    # "doesn't match" must include NULL-evaluating rows
                    # (3VL): a file holding {match, NULL} rows is PARTIAL
                    # — with a bare ~cond the NULL rows were invisible and
                    # the whole file (NULL rows included) was dropped
                    part = self._read_entries([e])
                    n_no = part.filter(
                        ~F.coalesce(filter.column(), F.lit(False))
                    ).limit(1).count()
                    n_yes = part.filter(filter.column()).limit(1).count()
                    if n_yes and n_no:
                        raise ValidationError(
                            f"file {e.path} matches the overwrite filter only partially"
                        )
                    if n_yes:
                        continue
                keep.append(e)
            return keep + new_entries

        base_paths = {
            e.path
            for e in self.meta.read_manifest(self.meta.current_snapshot(branch))
        }
        return self._commit(
            op="overwrite",
            branch=branch,
            mutate=mutate,
            validate=None,
            summary={"added-files": len(new_entries), **(extra_summary or {})},
            isolation=isolation,
            conflict_filter=filter,
            base_paths=base_paths,
        )

    def update(
        self,
        condition: Expr,
        set_exprs: dict[str, Column],
        branch: str = "main",
        isolation: str = "snapshot",
        batch=None,
        skip_sort: bool = False,
        extra_summary: dict | None = None,
    ) -> Snapshot:
        """Copy-on-write UPDATE: rewrite only files containing matches.
        ``batch``: a TableBatchTransaction to defer the commit into."""
        unknown = set(set_exprs) - set(self.schema.fieldNames())
        if unknown:
            raise ValidationError(
                f"update sets unknown columns {sorted(unknown)} — the "
                "rewrite would commit without applying them"
            )
        return self._cow_rewrite(
            condition,
            branch,
            op="overwrite",
            rewrite=lambda df: df.select(
                *[
                    F.when(condition.column(), set_exprs[c.name])
                    .otherwise(F.col(c.name))
                    .cast(c.dataType)
                    .alias(c.name)
                    if c.name in set_exprs
                    else F.col(c.name)
                    for c in self.schema.fields
                ]
            ),
            drop_fully_matching=False,
            isolation=isolation,
            batch=batch,
            skip_sort=skip_sort,
            extra_summary=extra_summary,
        )

    def delete_where(
        self, condition: Expr, branch: str = "main", isolation: str = "snapshot",
        batch=None, skip_sort: bool = False, extra_summary: dict | None = None,
    ) -> Snapshot:
        """Copy-on-write DELETE: drop fully-matching files from metadata
        alone; rewrite partially-matching files keeping the survivors.

        3VL note — DELIBERATE deviation from the reference: rows where
        ``cond`` evaluates to NULL are KEPT (standard SQL DELETE).  The
        reference rewrites only files that contain a TRUE row with
        ``WHERE NOT (cond)`` (dao/delete.xml:5-15), which deletes the
        NULL-evaluating rows of those files while identical rows in
        files with no TRUE match survive — whether a row dies depends on
        what else shares its file, i.e. on physical layout.  This engine
        prunes inclusively on maybe-TRUE and keeps ``cond IS NOT TRUE``
        survivors, so the answer is layout-independent; the stats-only
        full-file drop stays sound because a True verdict already
        requires a null-free file (expressions.Predicate.eval_stats).
        Differentially certified against DuckDB in tests/test_dml_fuzz.py,
        which is what exposed the layout dependence."""
        return self._cow_rewrite(
            condition,
            branch,
            op="delete",
            # keep cond IS NOT TRUE (FALSE *and* NULL rows survive)
            rewrite=lambda df: df.filter(
                ~F.coalesce(condition.column(), F.lit(False))
            ),
            drop_fully_matching=True,
            isolation=isolation,
            batch=batch,
            skip_sort=skip_sort,
            extra_summary=extra_summary,
        )

    def _cow_rewrite(
        self,
        condition: Expr,
        branch: str,
        op: str,
        rewrite: Callable[[DataFrame], DataFrame],
        drop_fully_matching: bool,
        isolation: str = "snapshot",
        batch=None,
        skip_sort: bool = False,
        extra_summary: dict | None = None,
    ) -> Snapshot:
        current = self.meta.read_manifest(self.meta.current_snapshot(branch))
        base_paths = {e.path for e in current}
        candidates = self.prune(current, condition)
        dropped: set[str] = set()
        maybe: list[ManifestEntry] = []
        for e in candidates:
            # rename-aware, like prune(): stats keyed by file-time names
            # must not be read under a recycled current name
            v = condition.eval_stats(e.stats_view(self._rename_map(e)))
            if v is True and drop_fully_matching:
                dropped.add(e.path)
            else:
                maybe.append(e)

        touched: set[str] = set()
        new_entries: list[ManifestEntry] = []
        if maybe:
            # distinct-touched-file probe (reference update.xml:5-9): find
            # which candidate files actually contain matching rows
            probe = self._read_entries(maybe, with_file_name=True)
            hits = (
                probe.filter(condition.column())
                .select("_file")
                .distinct()
                .collect()
            )
            touched = {self._rel_path(r["_file"]) for r in hits}
            if touched:
                to_rewrite = [e for e in maybe if e.path in touched]
                src = self._read_entries(to_rewrite)
                new_entries = self._write_files(rewrite(src), skip_sort=skip_sort)

        removed = dropped | touched
        if not removed and not new_entries:
            # no-op: nothing matched
            if batch is not None:
                # keep the batched contract (execute() returns None and
                # nothing commits until batch.commit())
                batch.note_noop()
                return None
            snap = self.meta.current_snapshot(branch)
            if snap is None:
                raise ValidationError("table has no snapshot")
            return snap

        if batch is not None:
            # defer into the batch transaction (reference
            # update/deleteFrom(TableBatchTransaction)); validation and
            # the single combined commit happen there
            batch.add_overwrite(
                new_entries, removed, condition, isolation,
                extra_summary=extra_summary, base_paths=base_paths,
            )
            return None

        def mutate(cur: list[ManifestEntry]) -> list[ManifestEntry]:
            return [e for e in cur if e.path not in removed] + new_entries

        def validate(cur: list[ManifestEntry]) -> None:
            present = {e.path for e in cur}
            missing = removed - present
            if missing:
                raise CommitConflict(f"files deleted concurrently: {sorted(missing)[:3]}")

        return self._commit(
            op=op,
            branch=branch,
            mutate=mutate,
            validate=validate,
            summary={
                "deleted-files": len(removed),
                "added-files": len(new_entries),
                **(extra_summary or {}),
            },
            isolation=isolation,
            conflict_filter=condition,
            base_paths=base_paths,
        )

    # ---------------------------------------------------------- commit
    def snapshot_changes(self, snapshot_id: int) -> DataFrame:
        """Rows ADDED by exactly this snapshot (manifest set-difference
        against its parent; file metadata only on the driver)."""
        s = self.meta.snapshot_by_id(snapshot_id)
        by_id = {x.snapshot_id: x for x in self.meta.snapshots}
        if s.parent_id is not None and s.parent_id not in by_id:
            raise ValidationError(
                f"parent snapshot {s.parent_id} has been expired — the "
                f"delta of {snapshot_id} is no longer derivable (an empty "
                "parent would misreport the full file set as added)"
            )
        parent_paths = {
            e.path for e in self.meta.read_manifest(by_id.get(s.parent_id))
        }
        added = [
            e for e in self.meta.read_manifest(s) if e.path not in parent_paths
        ]
        return self._read_entries(added)

    def _commit(
        self,
        op: str,
        branch: str,
        mutate: Callable[[list[ManifestEntry]], list[ManifestEntry]],
        validate: Callable[[list[ManifestEntry]], None] | None,
        summary: dict,
        isolation: str = "snapshot",
        conflict_filter: Expr | None = None,
        base_paths: set[str] | None = None,
    ) -> Snapshot:
        """Optimistic commit with retry (A21).  ``isolation``:

        - ``snapshot`` (default): retries validate only that files this
          operation deletes still exist (reference's Deletes validation);
        - ``serializable``: additionally fails if any file added since
          the operation's base snapshot may contain rows matching
          ``conflict_filter`` (reference validateNoConflictingData,
          writer/Transaction.java:266-298).
        """
        import time as _time

        ref_key = branch if branch == "main" else f"branch:{branch}"
        t0 = _time.perf_counter()
        for _ in range(_MAX_COMMIT_RETRIES):
            parent = self.meta.current_snapshot(branch)
            current = self.meta.read_manifest(parent)
            if (
                isolation == "serializable"
                and conflict_filter is not None
                and base_paths is not None
            ):
                added = [e for e in current if e.path not in base_paths]
                conflicting = [
                    e.path
                    for e in added
                    if conflict_filter.eval_stats(
                        e.stats_view(self._rename_map(e))
                    )
                    is not False
                ]
                if conflicting:
                    raise ValidationError(
                        "serializable isolation violated: concurrently added "
                        f"files may match the operation filter: {conflicting[:3]}"
                    )
            if validate is not None:
                validate(current)
            entries = mutate(current)
            sid = new_snapshot_id(self.meta)
            manifest_rel = write_manifest(self.location, sid, entries)
            snap = Snapshot(
                snapshot_id=sid,
                parent_id=parent.snapshot_id if parent else None,
                timestamp_ms=_now_ms(),
                operation=op,
                manifest=manifest_rel,
                summary={**summary, "total-files": len(entries)},
            )
            self.meta.snapshots.append(snap)
            self.meta.refs[ref_key] = sid
            try:
                write_new_version(self.meta)
                # commit metrics: manifest delta vs the WINNING parent
                # (per-partition added/removed rollups, reference
                # CommitMetrics/PartitionCommitMetrics) — derived and
                # dispatched only after the version is durably written,
                # and never allowed to raise: the commit already
                # succeeded on storage, so a metrics failure must not
                # trip the rollback handler below
                try:
                    from swiftlake_spark.plans.metrics import commit_metrics, dispatch

                    self.last_commit_metrics = commit_metrics(
                        table=self.meta.location,
                        operation=op,
                        snapshot_id=sid,
                        duration_ms=(_time.perf_counter() - t0) * 1000,
                        before=current,
                        after=entries,
                    )
                    dispatch(self.metric_collectors, self.last_commit_metrics)
                except Exception as _mexc:  # noqa: BLE001
                    import warnings as _w

                    _w.warn(f"commit metrics derivation failed: {_mexc!r}")
                return snap
            except CommitConflict:
                # lost the race: reload and retry on top of the winner
                self.meta = load_metadata(self.location)
            except BaseException:
                # storage failure mid-commit (disk full, store outage):
                # the in-memory snapshot/ref mutation must not survive —
                # a later commit on this handle would silently persist
                # the FAILED operation as a phantom snapshot
                self.meta.snapshots.pop()
                if parent is not None:
                    self.meta.refs[ref_key] = parent.snapshot_id
                else:
                    self.meta.refs.pop(ref_key, None)
                raise
        raise CommitConflict(f"gave up after {_MAX_COMMIT_RETRIES} retries")

    # --------------------------------------------------- schema evolution
    # Reference: add/drop/rename/widen by field ID (README.md:46-49, A3,
    # SchemaEvolution.java:328-404; nested element-wise rebuild
    # :511-587).  Every struct field at every depth has a stable field ID
    # keyed by dotted path (metadata.field_ids; arrays descend via
    # ".element", maps via ".key"/".value"); files record their
    # path→ID mapping at write time (ManifestEntry.column_ids).
    # add/drop/widen/rename — top-level OR nested — are all
    # metadata-only commits; the read path resolves old files by ID
    # (rename = same ID, new name), NULL-fills fields added since, and
    # upcasts widened types in the parquet reader (tables/evolution.py).

    def _commit_schema(self, schema: T.StructType) -> None:
        from swiftlake_spark.tables import evolution as EV

        self.meta.schema_json = schema.jsonValue()
        # any paths introduced by the edit (including subfields of an
        # added struct-typed column) get fresh, never-reused IDs
        for path, _f in EV.iter_struct_paths(schema):
            if path not in self.meta.field_ids:
                self.meta.field_ids[path] = self.meta.next_field_id
                self.meta.next_field_id += 1
        write_new_version(self.meta)

    def add_column(self, name: str, dtype: str) -> None:
        """Add a column, or a nested field: ``add_column("payload.score",
        "double")``, ``add_column("tags.element.w", "int")``.

        Nested adds over files that predate nested-ID tracking carry a
        resurrection hazard: such files read structs by *name*, so a
        re-added leaf whose name matches retired data in an old file
        would resurrect it (the ID-based path NULL-fills instead).  The
        guard inspects those files' parquet footers and refuses only
        when the name actually exists in one of them."""
        from swiftlake_spark.tables import evolution as EV

        if "." in name:
            self._guard_nested_add(name)
        self._commit_schema(EV.add_field(self.schema, name, dtype))

    def add_columns(self, items: list[tuple[str, str]]) -> None:
        """Atomic multi-column add: every (path, dtype) is validated —
        types parse, nested-add guards pass, no duplicate paths — and
        the folded schema commits ONCE, so a failure on any item leaves
        the table untouched (a per-item add_column loop would strand the
        earlier commits)."""
        from swiftlake_spark.tables import evolution as EV

        names = [p for p, _ in items]
        if len(set(names)) != len(names):
            raise ValidationError(
                f"duplicate column paths in add: "
                f"{sorted({n for n in names if names.count(n) > 1})}"
            )
        for path, dtype in items:
            try:
                T._parse_datatype_string(dtype)
            except Exception:
                raise ValidationError(
                    f"bad type {dtype!r} for column {path!r}"
                ) from None
            if "." in path:
                self._guard_nested_add(path)
        schema = self.schema
        for path, dtype in items:
            schema = EV.add_field(schema, path, dtype)
        self._commit_schema(schema)

    def _guard_nested_add(self, path: str) -> None:
        import pyarrow.parquet as pq

        root = path.split(".", 1)[0]
        root_id = self.meta.field_ids.get(root)
        if root_id is None:
            return  # adding under a brand-new column: no old data possible
        checked: set[str] = set()
        for e in self._all_manifest_entries():
            if e.path in checked:
                continue
            checked.add(e.path)
            ids = e.column_ids
            froot = next((n for n, i in ids.items() if i == root_id), root if not ids else None)
            if froot is None:
                continue  # file predates the root column entirely
            if ids and any(p.split(".", 1)[0] == froot and "." in p for p in ids):
                continue  # nested IDs stamped: ID resolution NULL-fills retired data
            # pre-nested-tracking file containing the root struct: check
            # the footer for a physical leaf under the target path
            fpath = froot + path[len(root):]
            try:
                fschema = pq.ParquetFile(self._abs_paths([e.path])[0]).schema
                names = {fschema.column(i).path for i in range(len(fschema.names))}
            except OSError:
                continue
            # parquet leaf paths use "a.b.c" with "list.element"/"key_value.
            # key|value" spellings for containers; normalization is
            # TYPE-DRIVEN from the declared schema (like evolution.
            # _rebuild_at's descent), so a struct field legitimately named
            # "element"/"key"/"value" is not mistaken for a container token
            norm = froot + self._physical_tail(
                self.schema[root].dataType, path.split(".")[1:]
            )
            if any(n == fpath or n == norm or n.startswith(fpath + ".") or n.startswith(norm + ".")
                   for n in names):
                raise ValidationError(
                    f"cannot add nested field {path!r}: file {e.path} predates "
                    "nested field-ID tracking and already contains data under "
                    "that name (re-adding would resurrect it); run compact() "
                    "and expire_snapshots() first"
                )

    @staticmethod
    def _physical_tail(dtype: T.DataType, segs: list[str]) -> str:
        """Logical path segments under ``dtype`` → the Spark-parquet
        physical spelling suffix (starting with ".").  Containers insert
        their wrapper groups ("list.element", "key_value.key|value");
        struct segments pass through verbatim.  The FINAL segment may be
        a field that does not exist yet (the add target)."""
        out: list[str] = []
        for seg in segs:
            if isinstance(dtype, T.ArrayType) and seg == "element":
                out += ["list", "element"]
                dtype = dtype.elementType
            elif isinstance(dtype, T.MapType) and seg in ("key", "value"):
                out += ["key_value", seg]
                dtype = dtype.keyType if seg == "key" else dtype.valueType
            elif isinstance(dtype, T.StructType):
                out.append(seg)
                dtype = (
                    dtype[seg].dataType if seg in dtype.fieldNames() else T.NullType()
                )
            else:
                out.append(seg)  # new leaf under a non-struct: raw
        return "." + ".".join(out)

    def drop_column(self, name: str) -> None:
        from swiftlake_spark.tables import evolution as EV

        refs = {t.source for t in self.transforms} | {
            d["col"] for d in self.meta.sort_order
        }
        if name in refs:
            raise ValidationError(
                f"column {name!r} is referenced by the partition spec or sort order"
            )
        schema = EV.drop_field(self.schema, name)
        # IDs (incl. descendants) are retired, never reused
        # (next_field_id is monotonic), so a later add of the same name
        # is a NEW field: old files' data for the dropped ID stays
        # invisible
        self.meta.field_ids = EV.drop_keys(self.meta.field_ids, name)
        self.meta.schema_json = schema.jsonValue()
        write_new_version(self.meta)

    def widen_column(self, name: str, dtype: str) -> None:
        from swiftlake_spark.tables import evolution as EV

        self._commit_schema(EV.widen_field(self.schema, name, dtype))

    def reorder_columns(self, names: list[str]) -> None:
        """Reorder = metadata-only permutation of the declared schema
        (reference README.md:46-49 lists reorder alongside add/drop/
        rename/widen).  ``names`` must be a permutation of the current
        columns.  Reads project in declared order regardless of the
        physical order inside each file, so no data moves."""
        schema = self.schema
        if sorted(names) != sorted(schema.fieldNames()):
            raise ValidationError(
                f"reorder must permute exactly the current columns "
                f"{schema.fieldNames()}"
            )
        by_name = {f.name: f for f in schema.fields}
        self.meta.schema_json = T.StructType(
            [by_name[n] for n in names]
        ).jsonValue()
        write_new_version(self.meta)

    def update_partition_spec(self, partition_spec: list[str]) -> None:
        """Partition evolution without rewrite (reference README.md:52-58):
        new writes lay out files under the new spec; existing files keep
        their recorded partition values.  Pruning stays correct for both
        generations: predicates on a file's own partition keys prune
        exactly; transform projections for keys a file was not written
        with evaluate to *unknown* (the key is absent from its partition
        dict), so the file is conservatively kept and its column min/max
        stats still apply.  Compaction rewrites under the current spec,
        migrating old files forward (Iceberg's behavior)."""
        from swiftlake_spark.tables.transforms import parse_spec

        names = self.schema.fieldNames()
        spec = []
        for s in partition_spec:
            t = parse_spec(s)
            if t.source not in names:
                raise ValidationError(
                    f"partition source column {t.source!r} not in schema"
                )
            spec.append({"name": t.name, "source": t.source, "param": t.param})
        self.meta.partition_spec = spec
        write_new_version(self.meta)

    def _all_manifest_entries(self) -> Iterator[ManifestEntry]:
        """Every manifest entry of every snapshot still in the metadata —
        i.e. every file reachable through time travel (snapshot_id /
        as_of / tag / branch).  Manifests are deduped by path."""
        seen: set[str] = set()
        for snap in self.meta.snapshots:
            if snap.manifest in seen:
                continue
            seen.add(snap.manifest)
            yield from self.meta.read_manifest(snap)

    def rename_column(self, old: str, new: str) -> None:
        """Rename = same field ID, new name — top-level or nested
        (``rename_column("payload.amt", "amount")``); descendants of a
        renamed struct keep their IDs (SchemaEvolution.java:328-404,
        nested :511-587).  Metadata-only commit; existing files resolve
        through their recorded column_ids at read time.

        Guard: the resolution is ID-based, so every file reachable by
        time travel must carry the needed ID stamps.  Files that predate
        field-ID tracking (or, for nested renames, nested-ID tracking)
        would silently read the renamed field as NULL — refuse until
        compact() + expire_snapshots() retire them."""
        from swiftlake_spark.tables import evolution as EV

        schema = self.schema
        new_schema = EV.rename_field(schema, old, new)  # validates path + clash
        root = old.split(".", 1)[0]
        root_id = self.meta.field_ids.get(root)
        nested = "." in old
        for e in self._all_manifest_entries():
            if not e.column_ids:
                raise ValidationError(
                    f"cannot rename: file {e.path} predates field-ID "
                    "tracking and is reachable by time travel; run "
                    "compact() and expire_snapshots() first"
                )
            if nested and root_id in e.column_ids.values():
                froot = next(n for n, i in e.column_ids.items() if i == root_id)
                if not any(p.split(".", 1)[0] == froot and "." in p for p in e.column_ids):
                    raise ValidationError(
                        f"cannot rename nested field {old!r}: file {e.path} "
                        "predates nested field-ID tracking; run compact() "
                        "and expire_snapshots() first"
                    )
        new_path = f"{old.rsplit('.', 1)[0]}.{new}" if nested else new
        self.meta.schema_json = new_schema.jsonValue()
        # the renamed path AND every descendant keep their IDs — rename
        # preserves identity for the whole subtree
        self.meta.field_ids = EV.rekey_renamed(self.meta.field_ids, old, new_path)
        # keep derived references consistent: partition spec sources and
        # sort order keep pointing at the (renamed) column
        for d in self.meta.partition_spec:
            if d["source"] == old:
                d["source"] = new_path
        for d in self.meta.sort_order:
            if d["col"] == old:
                d["col"] = new_path
        write_new_version(self.meta)

    # ---------------------------------------------------- maintenance
    def compact(self, **kw):
        from swiftlake_spark.tables.maintenance import compact

        return compact(self, **kw)

    def cluster_by(self, columns: list[str], **kw):
        from swiftlake_spark.tables.maintenance import cluster_by

        return cluster_by(self, columns, **kw)

    def expire_snapshots(self, **kw):
        from swiftlake_spark.tables.maintenance import expire_snapshots

        return expire_snapshots(self, **kw)

    def vacuum(self, **kw):
        from swiftlake_spark.tables.maintenance import vacuum

        return vacuum(self, **kw)

    # ---------------------------------------------------------- refs
    def create_branch(self, name: str, from_snapshot: int | None = None) -> None:
        sid = from_snapshot if from_snapshot is not None else self.meta.refs.get("main")
        if sid is None:
            raise ValidationError("no snapshot to branch from")
        self.meta.refs[f"branch:{name}"] = sid
        write_new_version(self.meta)

    def create_tag(self, name: str, from_snapshot: int | None = None) -> None:
        sid = from_snapshot if from_snapshot is not None else self.meta.refs.get("main")
        if sid is None:
            raise ValidationError("no snapshot to tag")
        self.meta.refs[f"tag:{name}"] = sid
        write_new_version(self.meta)

    def _ancestry(self, head: Snapshot | None) -> list[Snapshot]:
        """Head-first parent chain of ``head``."""
        by_id = {s.snapshot_id: s for s in self.meta.snapshots}
        out: list[Snapshot] = []
        s = head
        while s is not None:
            out.append(s)
            s = by_id.get(s.parent_id) if s.parent_id is not None else None
        return out

    def rollback_to(self, snapshot_id: int, branch: str = "main") -> None:
        """Move the branch head back to an earlier snapshot.

        Metadata-only (≙ Iceberg ``rollback_to_snapshot``): the ref moves,
        no data is rewritten, and the abandoned snapshots stay readable by
        id until ``expire_snapshots``.  The target must be an ancestor of
        the current head — rolling back onto an unrelated branch's history
        would silently merge timelines.
        """
        ref_key = branch if branch == "main" else f"branch:{branch}"
        for _ in range(_MAX_COMMIT_RETRIES):
            head = self.meta.current_snapshot(branch)
            if all(s.snapshot_id != snapshot_id for s in self._ancestry(head)):
                raise ValidationError(
                    f"snapshot {snapshot_id} is not an ancestor of {branch!r} head"
                )
            self.meta.refs[ref_key] = snapshot_id
            try:
                write_new_version(self.meta)
                return
            except CommitConflict:
                self.meta = load_metadata(self.location)
        raise CommitConflict(f"gave up after {_MAX_COMMIT_RETRIES} retries")

    def incremental_scan(
        self,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
        branch: str = "main",
    ) -> DataFrame:
        """Rows appended AFTER ``from_snapshot_id`` up to ``to_snapshot_id``
        (default: branch head) — append-only incremental consumption, the
        CDC pattern for downstream pipelines that process each batch once.

        Matches Iceberg's ``appendsBetween`` contract: every snapshot in
        the range must be an ``append``; an overwrite/delete/replace in
        the range raises (those rewrite history, so "new rows since" is
        no longer well-defined).  Driver work is manifest-path set
        difference only — file METADATA, never rows; the returned
        DataFrame reads just the added files with full schema-evolution
        resolution.
        """
        end = (
            self.meta.snapshot_by_id(to_snapshot_id)
            if to_snapshot_id is not None
            else self.meta.current_snapshot(branch)
        )
        chain = self._ancestry(end)
        try:
            cut = [s.snapshot_id for s in chain].index(from_snapshot_id)
        except ValueError:
            raise ValidationError(
                f"snapshot {from_snapshot_id} is not an ancestor of the scan end"
            ) from None
        rng = chain[:cut][::-1]  # oldest → newest, excluding the start
        bad = [s for s in rng if s.operation != "append"]
        if bad:
            raise ValidationError(
                "incremental scan range contains non-append snapshot "
                f"{bad[0].snapshot_id} ({bad[0].operation})"
            )
        by_id = {s.snapshot_id: s for s in self.meta.snapshots}
        added: list[ManifestEntry] = []
        for s in rng:
            parent_paths = {
                e.path
                for e in self.meta.read_manifest(by_id.get(s.parent_id))
            }
            added.extend(
                e for e in self.meta.read_manifest(s) if e.path not in parent_paths
            )
        return self._read_entries(added)

    # ---------------------------------------------------------- writer
    def _write_files(self, df: DataFrame, skip_sort: bool = False) -> list[ManifestEntry]:
        """Write ``df`` as new parquet files under data/<uuid>/ and return
        manifest entries with footer stats.  Distribution: hash by the
        partition transforms (≙ Iceberg write.distribution-mode=hash),
        in-partition sort by the table sort order (A18).  ``skip_sort``
        mirrors the reference's ``skipDataSorting`` (Insert.java builder):
        trade read-locality for write speed."""
        commit_dir = f"data/{uuid.uuid4().hex[:12]}"
        if self._remote:
            # write to a local staging root, upload after harvest — the
            # reference's S3 write flow (stage locally, then upload)
            import tempfile

            stage_root = tempfile.mkdtemp(prefix="swiftlake_write_stage_")
            abs_dir = os.path.join(stage_root, commit_dir)
        else:
            stage_root = self.location
            abs_dir = os.path.join(self.location, commit_dir)
        transforms = self.transforms
        sort_cols = [] if skip_sort else self._sort_columns()

        out = df
        pcols: list[str] = []
        ptypes = self._partition_result_types()
        for t in transforms:
            pname = _PCOL + t.partition_name
            pc = t.column(self._dtype(t.source))
            if ptypes.get(t.partition_name) == "string":
                # '#n'/'#e'/'#'-escape/'#u'-indirection so NULL, "",
                # "null"-alikes and >150-char values survive the hive
                # path round-trip (≙ PartitionedDataFileWriter.java:683-702)
                pc = TR.encode_partition_path_col(pc)
            out = out.withColumn(pname, pc)
            pcols.append(pname)

        if pcols:
            out = out.repartition(*[F.col(c) for c in pcols])
            if sort_cols:
                out = out.sortWithinPartitions(*sort_cols)
            writer = out.write.partitionBy(*pcols)
        else:
            if sort_cols:
                out = out.repartitionByRange(*sort_cols).sortWithinPartitions(*sort_cols)
            writer = out.write
        writer = writer.option("compression", "zstd")
        # target file sizing (reference FILE_SIZE_BYTES / row-group split,
        # BaseDataFileWriter.java:205-213): bound records per file via
        # table property
        max_rec = self.meta.properties.get("write.max-records-per-file")
        if max_rec:
            writer = writer.option("maxRecordsPerFile", int(max_rec))
        # parquet bloom filters for point-lookup columns (row-group skip
        # on high-cardinality keys where min/max stats don't discriminate)
        bloom = self.meta.properties.get("write.bloom-filter-columns")
        if bloom:
            ndv = self.meta.properties.get("write.bloom-filter-ndv")
            for c in (s.strip() for s in bloom.split(",")):
                if not c:
                    continue
                writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
                if ndv:
                    writer = writer.option(
                        f"parquet.bloom.filter.expected.ndv#{c}", int(ndv)
                    )
        writer.parquet(abs_dir, mode="errorifexists")

        entries: list[ManifestEntry] = []
        remote_io = None
        if self._remote:
            from swiftlake_spark import fileio as _fio

            remote_io = _fio.fileio_for(self.location)
        by_name = {t.partition_name: t for t in transforms}
        for root, _dirs, files in os.walk(abs_dir):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                abs_path = os.path.join(root, fn)
                rel = os.path.relpath(abs_path, stage_root)
                partition = self._parse_partition_path(os.path.relpath(root, abs_dir))
                # Recover TRUE values behind '#u' indirection tokens so the
                # MANIFEST carries exact partition values (only the path is
                # lossy) — ≙ the reference's transformValueLookupMap
                # (PartitionedDataFileWriter.java:655-663), except the
                # lookup is rebuilt from the data files themselves.
                # Recovery is PER FILE, never cached per token: two long
                # values colliding on the token would land in the same
                # directory, and a token-keyed cache would then stamp the
                # first file's value onto every file in it — silently
                # wrong manifest values.  Per-file first-row reads make a
                # collision at worst split (each file reports its own
                # value); the 256-bit token makes even that infeasible.
                # The read is footer-cheap: one 1-row batch of one column,
                # and only for values >150 escaped chars (rare).
                for pname, pval in list(partition.items()):
                    if not TR.is_opaque_pvalue(pval):
                        continue
                    import pyarrow.parquet as _pq

                    t = by_name[pname]
                    batch0 = next(
                        _pq.ParquetFile(abs_path).iter_batches(
                            batch_size=1, columns=[t.source]
                        )
                    )
                    partition[pname] = t.apply(batch0.column(0)[0].as_py())
                if remote_io is not None:
                    from swiftlake_spark import fileio as _fio

                    remote_io.upload(abs_path, _fio.join(self.location, rel))
                entries.append(self._manifest_entry(abs_path, rel, partition))
        if remote_io is not None:
            # stats + uploads are harvested; drop the local staging copy
            # or every remote write leaks a full dataset under /tmp
            import shutil

            shutil.rmtree(stage_root, ignore_errors=True)
        return entries

    def _manifest_entry(
        self, abs_path: str, rel: str, partition: dict[str, Any]
    ) -> ManifestEntry:
        from swiftlake_spark.tables.stats import collect_file_stats

        from swiftlake_spark.tables import evolution as EV

        records, size, col_stats = collect_file_stats(abs_path)
        # stamp the write-time path→field-ID mapping — every nested struct
        # field included (dotted paths, arrays via ".element", maps via
        # ".key"/".value") so renamed/retired nested fields resolve by ID
        # at read time (evolution.build_read_plan)
        column_ids = {
            p: self.meta.field_ids[p]
            for p, _f in EV.iter_struct_paths(self.schema)
            if p in self.meta.field_ids
        }
        return ManifestEntry(rel, records, size, partition, col_stats, column_ids)

    def _sort_columns(self) -> list[Column]:
        cols = []
        for d in self.meta.sort_order:
            base = F.col(d["col"])
            asc = d.get("asc", True)
            nulls_first = d.get("nulls_first", asc)  # SQL default
            if asc:
                cols.append(base.asc_nulls_first() if nulls_first else base.asc_nulls_last())
            else:
                cols.append(base.desc_nulls_first() if nulls_first else base.desc_nulls_last())
        return cols

    # partition path: "__p__name=value/__p__name2=value2" (hive-style)
    def _parse_partition_path(self, rel_dir: str) -> dict[str, Any]:
        out: dict[str, Any] = {}
        if rel_dir in (".", ""):
            return out
        ptypes = self._partition_result_types()
        for seg in rel_dir.split(os.sep):
            if "=" not in seg:
                continue
            k, v = seg.split("=", 1)
            if k.startswith(_PCOL):
                k = k[len(_PCOL):]
            v = urllib.parse.unquote(v)
            if v == "__HIVE_DEFAULT_PARTITION__":
                out[k] = None
            elif ptypes.get(k, "string") == "string":
                # string partition values are path-encoded on write
                # (encode_partition_path_col); '#u…' stays verbatim —
                # opaque token, stats_view masks it from pruning
                out[k] = TR.decode_partition_path_value(v)
            else:
                out[k] = _parse_pvalue(v, ptypes.get(k, "string"))
        return out

    def _partition_result_types(self) -> dict[str, str]:
        res: dict[str, str] = {}
        for t in self.transforms:
            if t.name == "identity" or t.name == "truncate":
                res[t.partition_name] = self._dtype(t.source)
            elif t.name == "hour":
                res[t.partition_name] = "bigint"
            else:
                res[t.partition_name] = "int"
        return res

    def _rel_path(self, file_uri: str) -> str:
        p = urllib.parse.unquote(urllib.parse.urlparse(file_uri).path)
        if self._remote:
            # staged scans report the STAGING path in input_file_name();
            # map it back to the store URI, then strip the table root
            from swiftlake_spark import fileio as _fio

            io = _fio.fileio_for(self.location)
            origin = getattr(io, "staged_origin", lambda _p: None)(p)
            if origin is None:
                raise ValueError(f"not a staged file of this table: {file_uri}")
            return origin[len(self.location.rstrip("/")) + 1:]
        return os.path.relpath(p, self.location)


def _parse_pvalue(v: str, dtype: str) -> Any:
    if dtype in ("int", "bigint", "smallint", "tinyint"):
        return int(v)
    if dtype in ("double", "float"):
        return float(v)
    if dtype == "boolean":
        return v == "true"
    if dtype == "date":
        return dt.date.fromisoformat(v)
    if dtype.startswith("timestamp"):
        return dt.datetime.fromisoformat(v)
    if dtype.startswith("decimal"):
        import decimal

        return decimal.Decimal(v)
    return v
