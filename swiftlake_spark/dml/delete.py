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
        self._branch = "main"

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
        self._branch = b
        return self

    def execute(self):
        if self._condition is None:
            raise ValidationError("delete needs a condition")
        tbl = self._resolve_table()
        return tbl.delete_where(
            self._condition, branch=self._branch, batch=self._batch
        )
