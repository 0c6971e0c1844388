"""Batch transaction: many writes, one commit.

Reference A22 (writer/TableBatchTransaction.java:43-210): accumulate N
write operations against one table and commit a single snapshot — used
to amortize catalog round-trips when a job produces many small writes.

Two modes, never mixed (TableBatchTransaction.java:112-117):

- **append** — N appends, union of files.
- **overwrite** — N COW rewrites (updates/deletes/SCD merges), each
  validated on add the way the reference validates
  (validateOverwriteTransaction, :152-210): no duplicate file
  deletions, no equivalent conflict filters, and no transaction's new
  files may possibly contain records matching another transaction's
  conflict filter (inclusive stats evaluation — exactly the
  InclusiveMetricsEvaluator check).  At commit the removed/added sets
  merge into one snapshot; SERIALIZABLE isolation uses the OR of all
  conflict filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.metadata import ManifestEntry, Snapshot, ValidationError
from swiftlake_spark.tables.table import Table


class TableBatchTransaction:
    def __init__(self, table: Table, branch: str = "main") -> None:
        self.table = table
        self.branch = branch
        self._pending: list[ManifestEntry] = []
        self._records = 0
        self._committed = False
        self._mode: str | None = None  # "append" | "overwrite"
        self._removed: set[str] = set()
        self._filters: list[E.Expr] = []
        self._txn_entries: list[list[ManifestEntry]] = []  # per overwrite txn
        self._base_paths: set[str] | None = None
        self._isolation = "snapshot"
        self._extra_summary: dict = {}

    def _set_mode(self, mode: str) -> None:
        if self._committed:
            raise ValidationError("batch transaction already committed")
        if self._mode is None:
            self._mode = mode
        elif self._mode != mode:
            raise ValidationError(
                "cannot mix append and overwrite transactions in one batch "
                "(reference TableBatchTransaction.java:112-117)"
            )

    def append(
        self, df: DataFrame, skip_sort: bool = False,
        extra_summary: dict | None = None,
    ) -> "TableBatchTransaction":
        self._set_mode("append")
        entries = self.table._write_files(df, skip_sort=skip_sort)
        self._pending.extend(entries)
        self._records += sum(e.records for e in entries)
        if extra_summary:
            self._extra_summary.update(extra_summary)
        return self

    def note_noop(self) -> None:
        """Hook: a batched operation matched nothing.  Nothing to record
        — commit() treats an empty batch as a clean no-op regardless
        (reference commit() returns empty metrics for an empty batch)."""

    def add_overwrite(
        self,
        new_entries: list[ManifestEntry],
        removed_paths: set[str],
        conflict_filter: E.Expr | None,
        isolation: str = "snapshot",
        extra_summary: dict | None = None,
        base_paths: set[str] | None = None,
    ) -> "TableBatchTransaction":
        """Queue one COW rewrite (update/delete/SCD merge outcome).
        ``base_paths``: the caller's base-snapshot file set (every caller
        already computed it — passing it avoids a second manifest read
        and pins the batch's serializable base to the SAME metadata
        state the rewrite was planned against)."""
        self._set_mode("overwrite")
        if extra_summary:
            self._extra_summary.update(extra_summary)
        if isolation == "serializable":
            self._isolation = "serializable"
        if self._base_paths is None:
            if base_paths is not None:
                self._base_paths = set(base_paths)
            else:
                snap = self.table.meta.current_snapshot(self.branch)
                self._base_paths = {
                    e.path for e in self.table.meta.read_manifest(snap)
                }
        dup = removed_paths & self._removed
        if dup:
            raise ValidationError(
                f"file deleted by two batched transactions: {sorted(dup)[:3]}"
            )
        if conflict_filter is not None:
            for f in self._filters:
                if repr(f) == repr(conflict_filter):
                    raise ValidationError(
                        f"a batched transaction with the same conflict filter "
                        f"exists already: {conflict_filter!r}"
                    )
            # this txn's filter vs earlier txns' new files, and earlier
            # filters vs this txn's new files — a file that MAY contain
            # matching records conflicts (inclusive, like the reference)
            for earlier in self._txn_entries:
                for e in earlier:
                    if conflict_filter.eval_stats(e.stats_view()) is not False:
                        raise ValidationError(
                            f"batched transactions overlap: file {e.path} may "
                            f"match {conflict_filter!r}"
                        )
        for f in self._filters:
            for e in new_entries:
                if f.eval_stats(e.stats_view()) is not False:
                    raise ValidationError(
                        f"batched transactions overlap: new file {e.path} may "
                        f"match earlier filter {f!r}"
                    )
        if conflict_filter is not None:
            self._filters.append(conflict_filter)
        self._txn_entries.append(list(new_entries))
        self._pending.extend(new_entries)
        self._removed |= set(removed_paths)
        self._records += sum(e.records for e in new_entries)
        return self

    def commit(self) -> Snapshot:
        if self._committed:
            raise ValidationError("batch transaction already committed")
        if not self._pending and not self._removed:
            # empty batch (nothing queued, or every op was a no-op):
            # commit is a clean no-op — reference commit() returns empty
            # CommitMetrics for an empty batch (TableBatchTransaction.java:138)
            self._committed = True
            snap = self.table.meta.current_snapshot(self.branch)
            if snap is None:
                # same contract as the unbatched no-op path (table.py)
                raise ValidationError("table has no snapshot")
            return snap
        pending = list(self._pending)
        removed = set(self._removed)

        if self._mode == "append":
            snap = self.table._commit(
                op="append",
                branch=self.branch,
                mutate=lambda current: current + pending,
                validate=None,
                summary={
                    "added-files": len(pending),
                    "added-records": self._records,
                    "batched-writes": True,
                    **self._extra_summary,
                },
            )
            self._committed = True
            return snap

        def mutate(cur: list[ManifestEntry]) -> list[ManifestEntry]:
            return [e for e in cur if e.path not in removed] + pending

        def validate(cur: list[ManifestEntry]) -> None:
            from swiftlake_spark.tables.metadata import CommitConflict

            present = {e.path for e in cur}
            missing = removed - present
            if missing:
                raise CommitConflict(
                    f"files deleted concurrently: {sorted(missing)[:3]}"
                )

        conflict = None
        if self._filters:
            conflict = (
                E.or_(*self._filters) if len(self._filters) > 1 else self._filters[0]
            )
        snap = self.table._commit(
            op="overwrite",
            branch=self.branch,
            mutate=mutate,
            validate=validate,
            summary={
                "deleted-files": len(removed),
                "added-files": len(pending),
                "added-records": self._records,
                "batched-writes": True,
                **self._extra_summary,
            },
            isolation=self._isolation,
            conflict_filter=conflict,
            base_paths=self._base_paths,
        )
        self._committed = True
        return snap
