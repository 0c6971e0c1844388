"""SCD2 merge — temporal dimension maintenance, changes & snapshot modes.

Reference: commands/SCD2Merge.java:135-420 + dao/scd2_merge.xml
(SURVEY.md §2.A row A16, §2.C.4-6).  Semantics preserved:

- candidate rows: ``boundary AND effective_start < ts AND effective_end
  IS NULL`` (current versions inside the filter).
- out-of-order guard: any boundary row with ``start >= ts OR end >= ts``
  fails the merge (scd2_merge.xml:4-11).
- snapshot mode: FULL OUTER JOIN classify I/U/D/N on change-tracking
  columns; changes mode: LEFT JOIN classify D/U/``N-S``/N where ``N-S``
  (no-change, same-source) suppresses the duplicate source row
  (scd2_merge.xml:136-223).
- closing versions: U/D rows get ``end := ts`` (+ current flag False);
  new versions get ``start := ts, end := NULL`` (+ flag True).
- only files containing U/D rows are rewritten (N / N-S carried).

Caller invariant (same contract as the reference's key-unique Iceberg
dimensions): the key columns uniquely identify a CURRENT version
table-wide.  Boundary-scoped merges cannot see versions outside their
filter, so inserting key X inside one boundary while X is current in
another creates two current versions of one key; a later merge whose
boundary spans both then hits the merge-cardinality guard (matched
case) or closes both (snapshot D).  Detecting the aliasing at insert
time would need a global key scan per merge — deliberately not done,
matching the reference.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, functions as F

from swiftlake_spark.dml.scd_common import (
    FILE,
    OP,
    RID,
    ValueColumnMeta,
    build_joined,
    check_cardinality,
    commit_merge,
    expand_source_columns,
    filter_from_source_values,
    require,
    TOUCHED,
    touched_files,
    with_touched_flag,
    value_diff_condition,
)
from swiftlake_spark.dml.sqlfilter import parse_filter
from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.metadata import ValidationError


class SCD2Builder:
    def __init__(self, engine, table_name: str | None, mode: str, batch=None) -> None:
        assert mode in ("changes", "snapshot")
        self._engine = engine
        self._table_name = table_name
        # TableBatchTransaction target (deferred commit)
        self._batch = batch
        self._mode = mode
        self._filter: E.Expr | None = None
        self._source: DataFrame | None = None
        self._keys: list[str] = []
        self._start_col = "effective_start"
        self._end_col = "effective_end"
        self._flag_col: str | None = None
        self._ts: dt.datetime | None = None
        self._generate_ts = False
        self._op_column: str | None = None
        self._delete_value = None
        self._tracking_cols: list[str] | None = None
        self._tracking_meta: dict[str, ValueColumnMeta] = {}
        self._branch = batch.branch if batch is not None else "main"
        self._columns: list[str] | None = None
        self._filter_columns: list[str] | None = None
        self._skip_sort = False
        self._isolation = "snapshot"

    # -- fluent config ----------------------------------------------------
    def table_filter(self, expr: E.Expr) -> "SCD2Builder":
        self._filter = expr
        return self

    def table_filter_sql(self, cond: str) -> "SCD2Builder":
        self._filter = parse_filter(cond, self._resolve_table().schema)
        return self

    def _resolve_table(self):
        if self._batch is not None:
            return self._batch.table
        return self._engine.catalog.table(self._table_name)

    def source_sql(self, sql: str) -> "SCD2Builder":
        self._source = self._engine.sql(sql)
        return self

    def source_dataframe(self, df: DataFrame) -> "SCD2Builder":
        self._source = df
        return self

    def key_columns(self, keys: list[str]) -> "SCD2Builder":
        self._keys = list(keys)
        return self

    def effective_period_columns(self, start: str, end: str) -> "SCD2Builder":
        self._start_col, self._end_col = start, end
        return self

    def current_flag_column(self, col: str) -> "SCD2Builder":
        self._flag_col = col
        return self

    def effective_timestamp(self, ts: dt.datetime) -> "SCD2Builder":
        self._ts = ts
        return self

    def generate_effective_timestamp(self, gen: bool = True) -> "SCD2Builder":
        self._generate_ts = gen
        return self

    def operation_type_column(self, col: str, delete_value) -> "SCD2Builder":
        # the delete marker is mandatory (reference operationTypeColumn
        # signature): a None would make `op != None` NULL for every row
        # and silently empty the upsert set while still rewriting files
        require(delete_value is not None, "operation_type_column needs a delete value")
        self._op_column = col
        self._delete_value = delete_value
        return self

    def change_tracking_columns(self, cols: list[str]) -> "SCD2Builder":
        self._tracking_cols = list(cols)
        return self

    def change_tracking_metadata(self, meta: dict[str, ValueColumnMeta]) -> "SCD2Builder":
        self._tracking_meta = dict(meta)
        return self

    def branch(self, b: str) -> "SCD2Builder":
        if self._batch is not None and b != self._batch.branch:
            raise ValidationError(
                "branch is fixed by the batch transaction; set it there"
            )
        self._branch = b
        return self

    def columns(self, cols: list[str]) -> "SCD2Builder":
        """Merge only these data columns; unlisted data columns are
        written as NULL on new versions (reference Builder.columns)."""
        self._columns = list(cols)
        return self

    def table_filter_columns(self, cols: list[str]) -> "SCD2Builder":
        """Derive the boundary filter from the source's distinct values
        of these columns (reference tableFilterColumns)."""
        self._filter_columns = list(cols)
        return self

    def skip_data_sorting(self, flag: bool = True) -> "SCD2Builder":
        self._skip_sort = flag
        return self

    def isolation_level(self, level: str) -> "SCD2Builder":
        """'snapshot' (default) or 'serializable' (reference
        isolationLevel: fail on concurrently added rows matching the
        boundary filter)."""
        assert level in ("snapshot", "serializable")
        self._isolation = level
        return self

    # -- execute ----------------------------------------------------------
    def execute_source_sql_once(self, flag: bool = True, how: str = "checkpoint") -> "SCD2Builder":
        """Materialize the source once before the merge (reference
        ``executeSourceSqlOnceOnly``, commands/SCD1Merge.java:185-203 —
        SCD2 shares the property via MergeProperties)."""
        self._source_once = how if flag else None
        return self

    def execute(self):
        if not getattr(self, "_source_once", None):
            return self._execute_impl()
        require(self._source is not None, "source is required")
        from swiftlake_spark.dml.scd_common import (
            cleanup_materialized_source,
            materialize_source,
        )

        self._source = materialize_source(self._source, self._source_once)
        try:
            return self._execute_impl()
        finally:
            cleanup_materialized_source(self._source)

    def _execute_impl(self):
        require(self._source is not None, "source is required")
        if self._filter is None and self._filter_columns:
            self._filter = filter_from_source_values(
                self._source,
                self._filter_columns,
                self._resolve_table().schema,
            )
        require(self._filter is not None, "table filter is mandatory for SCD2 merge")
        self._base_paths = None  # set below once the table is loaded
        require(bool(self._keys), "key columns are required")
        if self._ts is None:
            require(self._generate_ts, "effective timestamp required (or generate)")
            self._ts = dt.datetime.utcnow().replace(tzinfo=None)
        tbl = self._resolve_table()
        all_cols = tbl.schema.fieldNames()
        missing_keys = set(self._keys) - set(all_cols)
        require(not missing_keys, f"key columns not in table: {sorted(missing_keys)}")
        if self._tracking_cols:
            bad = set(self._tracking_cols) - set(all_cols)
            require(not bad, f"change tracking columns not in table: {sorted(bad)}")
            overlap = set(self._tracking_cols) & set(self._keys)
            require(not overlap, f"change tracking columns overlap keys: {sorted(overlap)}")
        for c in (self._start_col, self._end_col):
            require(c in all_cols, f"effective period column {c!r} not in table")
        if self._flag_col is not None:
            require(self._flag_col in all_cols, f"flag column {self._flag_col!r} not in table")
        require(
            not ({self._start_col, self._end_col, self._flag_col} & set(self._keys)),
            "effective period / flag columns cannot be key columns",
        )
        # base snapshot view for serializable conflict detection (A21)
        self._base_paths = {
            e.path
            for e in tbl.meta.read_manifest(tbl.meta.current_snapshot(self._branch))
        }
        special = {self._start_col, self._end_col, self._flag_col}
        data_cols = [c for c in all_cols if c not in special]
        if self._columns:
            import pyspark.sql.types as T

            data_schema = T.StructType(
                [f for f in tbl.schema.fields if f.name in data_cols]
            )
            extra = [self._op_column] if (
                self._mode == "changes" and self._op_column
            ) else []
            self._source = expand_source_columns(
                self._source, self._columns, data_schema, self._keys, extra_cols=extra
            )

        self._out_of_order_guard(tbl)

        if self._mode == "snapshot":
            return self._execute_snapshot(tbl, all_cols, data_cols)
        return self._execute_changes(tbl, all_cols, data_cols)

    # out-of-order rejection (scd2_merge.xml:4-11, SCD2Merge.java:283-293)
    def _out_of_order_guard(self, tbl) -> None:
        start, end = F.col(self._start_col), F.col(self._end_col)
        ts = F.lit(self._ts)
        bad = (
            tbl.scan(self._filter, branch=self._branch)
            .filter((start >= ts) | (end >= ts))
            .limit(1)
            .count()
        )
        if bad:
            raise ValidationError(
                f"out-of-order records: effective period >= {self._ts} exists "
                "within the table filter"
            )

    def _candidate(self) -> F.Column:
        return (
            self._filter.column()
            & (F.col(self._start_col) < F.lit(self._ts))
            & F.col(self._end_col).isNull()
        )

    def _new_version_cols(self, prefix: str, data_cols: list[str]) -> list:
        out = [F.col(f"{prefix}{c}").alias(c) for c in data_cols]
        out.append(F.lit(self._ts).alias(self._start_col))
        out.append(F.lit(None).cast("timestamp").alias(self._end_col))
        if self._flag_col:
            out.append(F.lit(True).alias(self._flag_col))
        return out

    def _close_version_cols(self, all_cols: list[str]) -> list:
        closing = F.col(OP).isin("U", "D")
        out = []
        for c in all_cols:
            if c == self._end_col:
                out.append(
                    F.when(closing, F.lit(self._ts)).otherwise(F.col(c)).alias(c)
                )
            elif c == self._flag_col:
                out.append(F.when(closing, F.lit(False)).otherwise(F.col(c)).alias(c))
            else:
                out.append(F.col(c))
        return out

    def _execute_snapshot(self, tbl, all_cols, data_cols):
        tracking = self._tracking_cols or [c for c in data_cols if c not in self._keys]
        src = self._source.select(*data_cols).filter(self._filter.column())
        j = build_joined(tbl, src, self._keys, self._candidate(), self._filter, "full_outer", branch=self._branch)
        diff = (
            value_diff_condition(tracking, self._tracking_meta)
            if tracking
            else F.lit(False)
        )
        mc, oc = F.col("me.__candidate__"), F.col("other.__candidate__")
        op = (
            F.when(mc.isNull(), "I")
            .when(mc & oc & diff, "U")
            .when(mc & oc.isNull(), "D")
            .otherwise("N")
        )
        diffs = j.select(
            op.alias(OP),
            F.col("me._file").alias(FILE),
            F.col(f"me.{RID}").alias(RID),
            oc.isNotNull().alias("__matched__"),
            *[F.col(f"me.{c}").alias(c) for c in all_cols],
            *[F.col(f"other.{c}").alias(f"__other_{c}") for c in data_cols],
        ).persist()
        try:
            check_cardinality(diffs)
            touched = touched_files(diffs, noop_ops=("N",))
            inserts = diffs.filter(F.col(OP).isin("I", "U")).select(
                *self._new_version_cols("__other_", data_cols)
            )
            carried = with_touched_flag(diffs, touched).filter(
                F.col(OP).isin("U", "D", "N")
                & (F.col(FILE).isNull() | F.col(TOUCHED))
            ).select(*self._close_version_cols(all_cols))
            new_data = self._align(inserts, tbl).unionByName(
                self._align(carried, tbl)
            )
            return commit_merge(tbl, new_data, touched, self._branch, op="overwrite", skip_sort=self._skip_sort, isolation=self._isolation, conflict_filter=self._filter, base_paths=self._base_paths, batch=self._batch)
        finally:
            diffs.unpersist()

    def _execute_changes(self, tbl, all_cols, data_cols):
        require(self._op_column is not None, "changes mode needs operation_type_column")
        opc, delv = self._op_column, self._delete_value
        tracking = self._tracking_cols or [c for c in data_cols if c not in self._keys]
        src = self._source.select(*data_cols, opc).filter(self._filter.column())
        j = build_joined(tbl, src, self._keys, self._candidate(), self._filter, "left_outer", branch=self._branch)
        diff = (
            value_diff_condition(tracking, self._tracking_meta)
            if tracking
            else F.lit(False)
        )
        mc, oc = F.col("me.__candidate__"), F.col("other.__candidate__")
        op = (
            F.when(mc & oc & (F.col(f"other.{opc}") == F.lit(delv)), "D")
            .when(mc & oc, F.when(diff, "U").otherwise("N-S"))
            .otherwise("N")
        )
        diffs = j.select(
            op.alias(OP),
            F.col("me._file").alias(FILE),
            F.col(f"me.{RID}").alias(RID),
            oc.isNotNull().alias("__matched__"),
            *[F.col(f"me.{c}").alias(c) for c in all_cols],
            *[F.col(f"other.{k}").alias(f"__src_{k}") for k in self._keys],
        ).persist()
        try:
            check_cardinality(diffs)
            touched = touched_files(diffs, noop_ops=("N", "N-S"))
            # source upserts minus keys whose target row is N-S (no change)
            ns_keys = (
                diffs.filter(F.col(OP) == "N-S")
                .select(*[F.col(f"__src_{k}").alias(k) for k in self._keys])
                .distinct()
            )
            upsert_src = (
                src.filter(F.col(opc) != F.lit(delv))
                .alias("me")
                .join(
                    ns_keys.alias("other"),
                    on=self._ns_join(),
                    how="left_anti",
                )
            )
            new_versions = upsert_src.select(
                *self._new_version_cols("", data_cols)
            )
            carried = with_touched_flag(diffs, touched).filter(
                F.col(OP).isin("U", "D", "N", "N-S")
                & (F.col(FILE).isNull() | F.col(TOUCHED))
            ).select(*self._close_version_cols(all_cols))
            new_data = self._align(new_versions, tbl).unionByName(
                self._align(carried, tbl)
            )
            return commit_merge(tbl, new_data, touched, self._branch, op="overwrite", skip_sort=self._skip_sort, isolation=self._isolation, conflict_filter=self._filter, base_paths=self._base_paths, batch=self._batch)
        finally:
            diffs.unpersist()

    def _ns_join(self):
        from functools import reduce

        return reduce(
            lambda a, b: a & b,
            [F.col(f"me.{k}").eqNullSafe(F.col(f"other.{k}")) for k in self._keys],
        )

    def _align(self, df: DataFrame, tbl) -> DataFrame:
        schema = tbl.schema
        return df.select(
            *[F.col(f.name).cast(f.dataType) for f in schema.fields]
        )
