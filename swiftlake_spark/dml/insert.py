"""Insert / insert-overwrite builders (reference commands/Insert.java:129-286).

- ``engine.insert_into(t).sql(src).execute()`` — append.
- ``engine.insert_overwrite(t).overwrite_by_filter_sql(cond).sql(src)
  .execute()`` — strict filter overwrite (files must match the filter
  entirely; added rows validated against it — Transaction.java:266-278).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.metadata import ValidationError
from swiftlake_spark.dml.sqlfilter import parse_filter


class InsertBuilder:
    def __init__(self, engine, table_name: str | None, overwrite: bool, batch=None) -> None:
        self._engine = engine
        self._table_name = table_name
        self._overwrite = overwrite
        # TableBatchTransaction target: the write lands in the txn's
        # pending set instead of committing (reference
        # insertInto(TableBatchTransaction), commands/Insert.java)
        self._batch = batch
        self._df: DataFrame | None = None
        self._columns: list[str] | None = None
        # a batch-targeted builder reads and commits on the BATCH's branch
        self._branch = batch.branch if batch is not None else "main"
        self._filter: E.Expr | None = None
        self._skip_sort = False
        self._filter_columns: list[str] | None = None
        self._snapshot_meta: dict | None = None

    def sql(self, src_sql: str) -> "InsertBuilder":
        self._df = self._engine.sql(src_sql)
        return self

    def dataframe(self, df: DataFrame) -> "InsertBuilder":
        self._df = df
        return self

    def columns(self, cols: list[str]) -> "InsertBuilder":
        self._columns = cols
        return self

    def branch(self, b: str) -> "InsertBuilder":
        if self._batch is not None and b != self._batch.branch:
            raise ValidationError(
                "branch is fixed by the batch transaction; set it there"
            )
        self._branch = b
        return self

    def skip_data_sorting(self, flag: bool = True) -> "InsertBuilder":
        """Write without applying the table sort order (reference
        Insert.skipDataSorting)."""
        self._skip_sort = flag
        return self

    def overwrite_by_filter(self, expr: E.Expr) -> "InsertBuilder":
        self._filter = expr
        return self

    def overwrite_by_filter_sql(self, cond: str) -> "InsertBuilder":
        tbl = self._engine.catalog.table(self._table_name)
        self._filter = parse_filter(cond, tbl.schema)
        return self

    def overwrite_by_filter_columns(self, cols: list[str]) -> "InsertBuilder":
        """Derive the overwrite filter from the source's distinct values
        of these columns (reference Insert overwriteByFilterColumns,
        InsertIntegrationTest testOverwriteWithFilterColumns)."""
        self._filter_columns = list(cols)
        return self

    def snapshot_metadata(self, props: dict) -> "InsertBuilder":
        """Attach custom key/values to the commit's snapshot summary
        (reference snapshotMetadata on write commands)."""
        self._snapshot_meta = dict(props)
        return self

    def isolation_level(self, level: str) -> "InsertBuilder":
        """'snapshot' (default) or 'serializable' — on an overwrite,
        serializable rejects files added concurrently that match the
        overwrite filter (reference Insert.isolationLevel,
        Insert.java:608)."""
        assert level in ("snapshot", "serializable")
        self._isolation = level
        return self

    def execute_source_sql_once(self, flag: bool = True, how: str = "checkpoint") -> "InsertBuilder":
        """Materialize the source once so non-deterministic expressions
        (rand(), now()) are evaluated a single time even though the
        insert pipeline consumes the source more than once (overwrite
        filter-columns probe + write) — ≙ reference
        ``executeSourceSqlOnceOnly`` (commands/Insert.java:208-218)."""
        self._source_once = how if flag else None
        return self

    # reference Insert names the same knob executeSqlOnceOnly
    # (Insert.java:558); the merges name it executeSourceSqlOnceOnly
    execute_sql_once = execute_source_sql_once

    def execute(self):
        if self._df is None:
            raise ValidationError("insert needs a source (sql or dataframe)")
        if not getattr(self, "_source_once", None):
            return self._execute_impl()
        from swiftlake_spark.dml.scd_common import (
            cleanup_materialized_source,
            materialize_source,
        )

        self._df = materialize_source(self._df, self._source_once)
        try:
            return self._execute_impl()
        finally:
            cleanup_materialized_source(self._df)

    def _execute_impl(self):
        tbl = (
            self._batch.table
            if self._batch is not None
            else self._engine.catalog.table(self._table_name)
        )
        df = self._df
        schema = tbl.schema
        if self._columns is not None:
            missing = set(self._columns) - set(df.columns)
            if missing:
                raise ValidationError(f"source missing columns {sorted(missing)}")
            df = df.select(*self._columns)
        from pyspark.sql import functions as F

        # align to table schema: order + types (reference validates columns,
        # WriteUtil.validateColumns); with columns(...), unlisted table
        # columns are filled with typed NULLs (reference Insert.columns)
        if self._columns is not None:
            for f in schema.fields:
                if f.name not in self._columns:
                    df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        if set(df.columns) != set(schema.fieldNames()):
            raise ValidationError(
                f"source columns {sorted(df.columns)} != table columns "
                f"{sorted(schema.fieldNames())}"
            )
        df = df.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])
        if self._overwrite:
            if self._filter is None and self._filter_columns:
                from swiftlake_spark.dml.scd_common import filter_from_source_values

                self._filter = filter_from_source_values(
                    df, self._filter_columns, schema
                )
            if self._filter is None:
                raise ValidationError("insert_overwrite needs overwrite_by_filter")
            return tbl.overwrite_by_filter(
                df, self._filter, branch=self._branch, skip_sort=self._skip_sort,
                extra_summary=self._snapshot_meta,
                isolation=getattr(self, "_isolation", "snapshot"),
            )
        if self._batch is not None:
            return self._batch.append(
                df, skip_sort=self._skip_sort, extra_summary=self._snapshot_meta
            )
        return tbl.append(
            df, branch=self._branch, skip_sort=self._skip_sort,
            extra_summary=self._snapshot_meta,
        )
