"""Delete builder (reference commands/Delete.java:106-180).

``engine.delete_from(t).condition_sql("cat = 'A'").execute()`` —
copy-on-write: fully-matching files are dropped from metadata alone,
partially-matching files rewritten with ``NOT(cond)``
(dao/delete.xml:5-17)."""

from __future__ import annotations

from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.metadata import ValidationError
from swiftlake_spark.dml.sqlfilter import parse_filter


class DeleteBuilder:
    def __init__(self, engine, table_name: str | None, batch=None) -> None:
        self._engine = engine
        self._table_name = table_name
        self._batch = batch  # TableBatchTransaction target (deferred commit)
        self._condition: E.Expr | None = None
        self._branch = batch.branch if batch is not None else "main"

    def condition(self, expr: E.Expr) -> "DeleteBuilder":
        self._condition = expr
        return self

    def condition_sql(self, cond: str) -> "DeleteBuilder":
        self._condition = parse_filter(cond, self._resolve_table().schema)
        return self

    def _resolve_table(self):
        if self._batch is not None:
            return self._batch.table
        return self._engine.catalog.table(self._table_name)

    def branch(self, b: str) -> "DeleteBuilder":
        if self._batch is not None and b != self._batch.branch:
            raise ValidationError(
                "branch is fixed by the batch transaction; set it there"
            )
        self._branch = b
        return self

    def skip_data_sorting(self, flag: bool = True) -> "DeleteBuilder":
        """Rewrite files without the table sort order (reference
        Delete.skipDataSorting, Delete.java:350)."""
        self._skip_sort = flag
        return self

    def snapshot_metadata(self, props: dict) -> "DeleteBuilder":
        """Custom key/values on the commit's snapshot summary (reference
        Delete.java:365)."""
        self._snapshot_meta = dict(props)
        return self

    def isolation_level(self, level: str) -> "DeleteBuilder":
        assert level in ("snapshot", "serializable")
        self._isolation = level
        return self

    def execute(self):
        if self._condition is None:
            raise ValidationError("delete needs a condition")
        tbl = self._resolve_table()
        return tbl.delete_where(
            self._condition, branch=self._branch, batch=self._batch,
            isolation=getattr(self, "_isolation", "snapshot"),
            skip_sort=getattr(self, "_skip_sort", False),
            extra_summary=getattr(self, "_snapshot_meta", None),
        )
