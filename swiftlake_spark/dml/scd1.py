"""SCD1 merge — changes mode and snapshot mode.

Reference: commands/SCD1Merge.java:135-370 + dao/scd1_merge.xml.

Changes mode (``apply_changes_as_scd1``): the source carries an
operation-type column; matched target rows classify D (delete marker) /
U (replace) / N; every non-delete source row is written (insert or
update); N rows survive only via untouched files or the touched-file
carry-over.

Snapshot mode (``apply_snapshot_as_scd1``): the source IS the desired
state within the table filter; FULL OUTER JOIN classifies I/U/D/N —
order matters (scd1_merge.xml:77-96) — with per-column value compare
options (max_delta / null_replacement, §2.C.6).  Duplicate-target-key
corner (reference parity, pinned by fuzz seed 40228): a source key
matching k in-filter target rows replaces EACH of them — k copies out —
because the cardinality check (WriteUtil.checkMergeCardinality ≙
scd_common.check_cardinality) rejects only one target row matching
multiple SOURCE rows, never the converse; duplicate target keys arise
legitimately from appends and partition-column updates.

The table filter is mandatory: unbounded dimension merges are refused
(SCD1Merge.java:385-401).
"""

from __future__ import annotations

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


class SCD1Builder:
    def __init__(self, engine, table_name: str | None, mode: str, batch=None) -> None:
        assert mode in ("changes", "snapshot")
        self._engine = engine
        self._table_name = table_name
        # TableBatchTransaction target: the merge outcome lands in the
        # txn's pending set instead of committing (reference
        # applyChangesAsSCD1(TableBatchTransaction))
        self._batch = batch
        self._mode = mode
        self._filter: E.Expr | None = None
        self._source: DataFrame | None = None
        self._keys: list[str] = []
        self._op_column: str | None = None
        self._delete_value = None
        self._value_columns: list[str] | None = None
        self._value_meta: dict[str, ValueColumnMeta] = {}
        self._branch = batch.branch if batch is not None else "main"
        self._columns: list[str] | None = None
        self._filter_columns: list[str] | None = None
        self._skip_sort = False
        self._isolation = "snapshot"

    # -- fluent config ----------------------------------------------------
    def table_filter(self, expr: E.Expr) -> "SCD1Builder":
        self._filter = expr
        return self

    def table_filter_sql(self, cond: str) -> "SCD1Builder":
        self._filter = parse_filter(cond, self._resolve_table().schema)
        return self

    def _resolve_table(self):
        if self._batch is not None:
            return self._batch.table
        return self._engine.catalog.table(self._table_name)

    def source_sql(self, sql: str) -> "SCD1Builder":
        self._source = self._engine.sql(sql)
        return self

    def source_dataframe(self, df: DataFrame) -> "SCD1Builder":
        self._source = df
        return self

    def key_columns(self, keys: list[str]) -> "SCD1Builder":
        self._keys = list(keys)
        return self

    def operation_type_column(self, col: str, delete_value) -> "SCD1Builder":
        # the delete marker is mandatory (reference operationTypeColumn
        # signature): a None would make `op != None` NULL for every row
        # and silently empty the upsert set while still rewriting files
        require(delete_value is not None, "operation_type_column needs a delete value")
        self._op_column = col
        self._delete_value = delete_value
        return self

    def value_columns(self, cols: list[str]) -> "SCD1Builder":
        self._value_columns = list(cols)
        return self

    def value_column_metadata(self, meta: dict[str, ValueColumnMeta]) -> "SCD1Builder":
        self._value_meta = dict(meta)
        return self

    def branch(self, b: str) -> "SCD1Builder":
        if self._batch is not None and b != self._batch.branch:
            raise ValidationError(
                "branch is fixed by the batch transaction; set it there"
            )
        self._branch = b
        return self

    def columns(self, cols: list[str]) -> "SCD1Builder":
        """Merge only these columns; unlisted table columns are written
        as NULL on insert/update (reference Builder.columns)."""
        self._columns = list(cols)
        return self

    def table_filter_columns(self, cols: list[str]) -> "SCD1Builder":
        """Derive the boundary filter from the source's distinct values
        of these columns (reference tableFilterColumns)."""
        self._filter_columns = list(cols)
        return self

    def skip_data_sorting(self, flag: bool = True) -> "SCD1Builder":
        self._skip_sort = flag
        return self

    def isolation_level(self, level: str) -> "SCD1Builder":
        """'snapshot' (default) or 'serializable' (reference
        isolationLevel: fail on concurrently added rows matching the
        boundary filter)."""
        assert level in ("snapshot", "serializable")
        self._isolation = level
        return self

    # -- execute ----------------------------------------------------------
    def execute_source_sql_once(self, flag: bool = True, how: str = "checkpoint") -> "SCD1Builder":
        """Materialize the source once before the merge so rand()/now()
        evaluate a single time across the boundary probe, diff join,
        cardinality check and write — ≙ reference
        ``executeSourceSqlOnceOnly`` (commands/SCD1Merge.java:185-203)."""
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
        require(bool(self._keys), "key columns are required")
        tbl = self._resolve_table()
        if self._filter is None and self._filter_columns:
            self._filter = filter_from_source_values(
                self._source, self._filter_columns, tbl.schema
            )
        require(self._filter is not None, "table filter is mandatory for SCD1 merge")
        # base snapshot view for serializable conflict detection (A21)
        self._base_paths = {
            e.path
            for e in tbl.meta.read_manifest(tbl.meta.current_snapshot(self._branch))
        }
        if self._columns:
            extra = [self._op_column] if (
                self._mode == "changes" and self._op_column
            ) else []
            self._source = expand_source_columns(
                self._source, self._columns, tbl.schema, self._keys, extra_cols=extra
            )
        cols = tbl.schema.fieldNames()
        missing_keys = set(self._keys) - set(cols)
        require(not missing_keys, f"key columns not in table: {sorted(missing_keys)}")
        if self._value_columns:
            bad = set(self._value_columns) - set(cols)
            require(not bad, f"value columns not in table: {sorted(bad)}")
            overlap = set(self._value_columns) & set(self._keys)
            require(not overlap, f"value columns overlap keys: {sorted(overlap)}")
        bad_meta = set(self._value_meta) - set(cols)
        require(not bad_meta, f"value metadata for unknown columns: {sorted(bad_meta)}")
        if self._mode == "changes":
            require(self._op_column is None or self._op_column not in cols,
                    "operation-type column must not be a table column")
            return self._execute_changes(tbl, cols)
        return self._execute_snapshot(tbl, cols)

    def _execute_snapshot(self, tbl, cols):
        value_cols = self._value_columns or [c for c in cols if c not in self._keys]
        # boundary applies to the source too (SCD1Merge.java:406-413)
        src = self._source.select(*cols).filter(self._filter.column())
        j = build_joined(
            tbl, src, self._keys, self._filter.column(), self._filter, "full_outer",
            branch=self._branch,
        )
        diff = value_diff_condition(value_cols, self._value_meta) if value_cols else F.lit(False)
        mc = F.col("me.__candidate__")
        oc = F.col("other.__candidate__")
        # classification order matters: I, U, D, N (scd1_merge.xml:77-96)
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
            *[F.col(f"me.{c}").alias(c) for c in cols],
            *[F.col(f"other.{c}").alias(f"__other_{c}") for c in cols],
        ).persist()
        try:
            check_cardinality(diffs)
            touched = touched_files(diffs, noop_ops=("N",))
            inserts_updates = diffs.filter(F.col(OP).isin("I", "U")).select(
                *[F.col(f"__other_{c}").alias(c) for c in cols]
            )
            carried = with_touched_flag(diffs, touched).filter(
                (F.col(OP) == "N") & F.col(TOUCHED)
            ).select(*cols) if touched else None
            new_data = (
                inserts_updates.unionByName(carried) if carried is not None else inserts_updates
            )
            return commit_merge(tbl, new_data, touched, self._branch, op="overwrite", skip_sort=self._skip_sort, isolation=self._isolation, conflict_filter=self._filter, base_paths=self._base_paths, batch=self._batch)
        finally:
            diffs.unpersist()

    def _execute_changes(self, tbl, cols):
        require(self._op_column is not None, "changes mode needs operation_type_column")
        opc, delv = self._op_column, self._delete_value
        src_all = self._source
        require(
            opc in src_all.columns, f"source missing operation column {opc!r}"
        )
        src = src_all.select(*cols, opc).filter(self._filter.column())
        j = build_joined(
            tbl, src, self._keys, self._filter.column(), self._filter, "left_outer",
            branch=self._branch,
        )
        mc = F.col("me.__candidate__")
        oc = F.col("other.__candidate__")
        op = (
            F.when(mc & oc & (F.col(f"other.{opc}") == F.lit(delv)), "D")
            .when(mc & oc, "U")
            .otherwise("N")
        )
        diffs = j.select(
            op.alias(OP),
            F.col("me._file").alias(FILE),
            F.col(f"me.{RID}").alias(RID),
            oc.isNotNull().alias("__matched__"),
            *[F.col(f"me.{c}").alias(c) for c in cols],
        ).persist()
        try:
            check_cardinality(diffs)
            touched = touched_files(diffs, noop_ops=("N",))
            # strict `op != delete` (NULL op rows drop, matching the
            # reference's SQL 3VL: scd1_merge.xml:50-52)
            upserts = src.filter(F.col(opc) != F.lit(delv)).select(*cols)
            carried = with_touched_flag(diffs, touched).filter(
                (F.col(OP) == "N") & F.col(TOUCHED)
            ).select(*cols) if touched else None
            new_data = upserts.unionByName(carried) if carried is not None else upserts
            return commit_merge(tbl, new_data, touched, self._branch, op="overwrite", skip_sort=self._skip_sort, isolation=self._isolation, conflict_filter=self._filter, base_paths=self._base_paths, batch=self._batch)
        finally:
            diffs.unpersist()
