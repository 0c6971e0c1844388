"""Update builder (reference commands/Update.java:125-210).

``engine.update(t).condition_sql("id = 5").update_sets({"v": 9}).execute()``
— copy-on-write: only files containing matching rows are rewritten
(distinct-filename probe, dao/update.xml:5-24)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, functions as F

from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.metadata import ValidationError
from swiftlake_spark.dml.sqlfilter import parse_filter


class UpdateBuilder:
    def __init__(self, engine, table_name: str | None, batch=None) -> None:
        self._engine = engine
        self._table_name = table_name
        self._batch = batch  # TableBatchTransaction target (deferred commit)
        self._condition: E.Expr | None = None
        self._sets: dict[str, Column] = {}
        self._branch = batch.branch if batch is not None else "main"

    def condition(self, expr: E.Expr) -> "UpdateBuilder":
        self._condition = expr
        return self

    def condition_sql(self, cond: str) -> "UpdateBuilder":
        self._condition = parse_filter(cond, self._resolve_table().schema)
        return self

    def _resolve_table(self):
        if self._batch is not None:
            return self._batch.table
        return self._engine.catalog.table(self._table_name)

    def update_sets(self, sets: dict[str, Any]) -> "UpdateBuilder":
        self._sets = {
            k: (v if isinstance(v, Column) else F.lit(v)) for k, v in sets.items()
        }
        return self

    def branch(self, b: str) -> "UpdateBuilder":
        if self._batch is not None and b != self._batch.branch:
            raise ValidationError(
                "branch is fixed by the batch transaction; set it there"
            )
        self._branch = b
        return self

    def skip_data_sorting(self, flag: bool = True) -> "UpdateBuilder":
        """Rewrite files without the table sort order (reference
        Update.skipDataSorting, Update.java:404)."""
        self._skip_sort = flag
        return self

    def snapshot_metadata(self, props: dict) -> "UpdateBuilder":
        """Custom key/values on the commit's snapshot summary (reference
        Update.java:419)."""
        self._snapshot_meta = dict(props)
        return self

    def isolation_level(self, level: str) -> "UpdateBuilder":
        assert level in ("snapshot", "serializable")
        self._isolation = level
        return self

    def execute(self):
        if self._condition is None:
            raise ValidationError("update needs a condition")
        if not self._sets:
            raise ValidationError("update needs update_sets")
        tbl = self._resolve_table()
        unknown = set(self._sets) - set(tbl.schema.fieldNames())
        if unknown:
            raise ValidationError(f"unknown update columns {sorted(unknown)}")
        return tbl.update(
            self._condition, self._sets, branch=self._branch, batch=self._batch,
            isolation=getattr(self, "_isolation", "snapshot"),
            skip_sort=getattr(self, "_skip_sort", False),
            extra_summary=getattr(self, "_snapshot_meta", None),
        )
