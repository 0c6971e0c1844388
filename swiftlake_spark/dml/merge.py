"""Generic ``MERGE INTO`` — SQL:2003 three-clause merge over the native
table format.

Beyond the reference surface: SwiftLake ships SCD1/SCD2 apply
(commands/SCD1Merge.java, commands/SCD2Merge.java) but no free-form
``WHEN MATCHED [AND cond] THEN UPDATE/DELETE`` / ``WHEN NOT MATCHED
THEN INSERT`` statement; this builder closes that gap with the same
copy-on-write machinery the SCD merges use (dml/scd_common.py — diff
join, cardinality check, distinct-touched-file probe, file-level
rewrite, snapshot commit with conflict detection).

Semantics (standard MERGE):

- target and source join on null-safe key equality
  (``IS NOT DISTINCT FROM``) by default; ``null_safe_keys(False)``
  switches to standard null-rejecting ``=`` (NULL keys never match —
  the SQL surface uses this).  A target row matching more than one
  source row is a cardinality violation and the merge fails.
- matched rows walk the ``when_matched_*`` clauses in declaration
  order; the FIRST clause whose condition is true fires (update or
  delete); if none fires the row is untouched.
- source-only rows insert when a ``when_not_matched_insert`` clause is
  declared and its condition holds; otherwise they are dropped.
- target-only rows walk the ``when_not_matched_by_source_*`` clauses
  (SQL:2016 ``WHEN NOT MATCHED BY SOURCE``, Spark SQL ≥3.4) in
  declaration order, first-match-wins; with none declared they are
  never touched.  Clause expressions may reference ``target.*`` only —
  there is no source row.
- **the table filter is a SCOPING BOUNDARY for BY SOURCE** (known
  delta, README "Known deltas"): target rows excluded by the mandatory
  ``table_filter`` (or target-only ``ON`` conjuncts in the SQL form)
  are invisible to the merge — they are manifest-pruned away and in
  particular do NOT fire ``WHEN NOT MATCHED BY SOURCE`` clauses.
  Standard semantics would classify them unmatched-by-source; we keep
  the boundary contract because it is what keeps the rewrite pruned at
  scale (a standard scoped sync must read and classify EVERY target
  row), and standard behavior is one clause condition away (put the
  predicate on the BY SOURCE clause with an unscoped filter).  Pinned
  by ``tests/test_sqldml.py::
  test_sql_merge_boundary_scopes_by_source_known_delta``.

Clause conditions and update/insert expressions are Spark SQL strings
over two namespaces: ``target.<col>`` (current table row) and
``source.<col>`` — e.g. ``when_matched_update({"qty": "target.qty +
source.qty"}, condition="source.qty > 0")``.

Scale: the target read is manifest-pruned by the mandatory table
filter (or an explicit ``unbounded()`` opt-out); only file NAMES reach
the driver; rewrites touch only files holding a fired UPDATE/DELETE
row; inserts append regardless of touched files; everything flows
through the partitioned/sorted writer and the ordinary snapshot commit
path (conflict detection, isolation levels, batch transactions).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from swiftlake_spark.dml.scd_common import (
    FILE,
    OP,
    RID,
    check_cardinality,
    cleanup_materialized_source,
    commit_merge,
    filter_from_source_values,
    materialize_source,
    require,
    TOUCHED,
    touched_files,
    with_touched_flag,
)
from swiftlake_spark.dml.sqlfilter import parse_filter
from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.metadata import ValidationError


@dataclass
class _MatchedClause:
    action: str  # "update" | "delete"
    condition: str | None
    sets: dict[str, str] | None  # update only; None → take all source columns


@dataclass
class _NotMatchedClause:
    condition: str | None
    values: dict[str, str] | None  # None → insert the source row as-is


_QUOTED = re.compile(r"'(?:[^']|'')*'")
_SOURCE_REF = re.compile(r"(?i)\bsource\s*\.")


def _reject_source_refs(text: str, clause: str) -> None:
    """Standard SQL forbids source references in NOT MATCHED BY SOURCE
    clauses (the row has no source side).  Checked on the expression
    text with single-quoted literals stripped first, so a literal
    containing the word ``source.`` never trips it."""
    if isinstance(text, str) and _SOURCE_REF.search(_QUOTED.sub("''", text)):
        raise ValidationError(
            f"{clause} expressions cannot reference source.* — "
            "the row has no matching source"
        )


def _expr(e: str | Column | Any) -> Column:
    if isinstance(e, Column):
        return e
    if isinstance(e, str):
        return F.expr(e)
    return F.lit(e)


class MergeIntoBuilder:
    """Fluent builder for a single MERGE INTO statement.

    Typical shape::

        (engine.merge_into("db.t")
            .using(df).key_columns(["id"])
            .table_filter_sql("region = 'EU'")  # scoping boundary (see
                                                # module docstring) — or
            # .unbounded()                      # explicit full-table opt-out
            .when_matched_update({"qty": "target.qty + source.qty"})
            .when_matched_delete(condition="source.qty = 0")
            .when_not_matched_insert()
            .when_not_matched_by_source_delete()
            .execute())

    Contracts callers rely on (each driver- or pytest-pinned):
    clause order is first-match-wins within each of the three branches;
    >1 source row per target key fails the cardinality check;
    ``table_filter`` scopes the WHOLE merge including BY SOURCE (known
    delta — module docstring); key matching is null-safe unless
    ``null_safe_keys(False)``."""

    def __init__(self, engine, table_name: str | None, batch=None) -> None:
        self._engine = engine
        self._table_name = table_name
        self._batch = batch
        self._source: DataFrame | None = None
        self._keys: list[str] = []
        self._filter: E.Expr | None = None
        self._filter_columns: list[str] | None = None
        self._filter_source = True
        self._unbounded = False
        self._matched: list[_MatchedClause] = []
        self._not_matched: list[_NotMatchedClause] = []
        self._by_source: list[_MatchedClause] = []
        self._match_conditions: list[str | Column] = []
        self._null_safe_keys = True
        self._branch = batch.branch if batch is not None else "main"
        self._skip_sort = False
        self._isolation = "snapshot"
        self._source_once: str | None = None
        self._snapshot_meta: dict | None = None

    # -- fluent config ----------------------------------------------------
    def using(self, df: DataFrame) -> "MergeIntoBuilder":
        self._source = df
        return self

    def source_sql(self, sql: str) -> "MergeIntoBuilder":
        self._source = self._engine.sql(sql)
        return self

    def key_columns(self, keys: list[str]) -> "MergeIntoBuilder":
        self._keys = list(keys)
        return self

    # merge is restricted to the boundary (rows outside it — in target OR
    # source — are ignored), which is what makes the scan manifest-pruned;
    # ``unbounded()`` is the explicit full-table opt-out.
    def table_filter(self, expr: E.Expr) -> "MergeIntoBuilder":
        self._filter = expr
        return self

    def table_filter_sql(self, cond: str) -> "MergeIntoBuilder":
        self._filter = parse_filter(cond, self._resolve_table().schema)
        return self

    def table_filter_columns(self, cols: list[str]) -> "MergeIntoBuilder":
        self._filter_columns = list(cols)
        return self

    def unbounded(self, flag: bool = True) -> "MergeIntoBuilder":
        self._unbounded = flag
        return self

    def match_condition(self, cond: str | Column) -> "MergeIntoBuilder":
        """Extra ON-clause residual ANDed into the match join — a Spark
        SQL expression over ``target.*`` / ``source.*`` (e.g.
        ``"source.active = 1"`` or ``"target.amount > source.floor"``).
        Standard MERGE semantics: a pair failing it does not match, so
        the source row stays insert-eligible (NOT MATCHED) and the
        target row walks NOT MATCHED BY SOURCE.  Unlike ``table_filter``
        this does NOT prune the scan — keep a prunable boundary filter
        alongside it at scale.  Repeat calls AND together."""
        self._match_conditions.append(cond)
        return self

    def filter_source(self, flag: bool) -> "MergeIntoBuilder":
        """When True (default) the boundary filter also restricts the
        SOURCE — rows outside it neither match nor insert (the SCD
        boundary contract).  ``filter_source(False)`` keeps the boundary
        as a target-side restriction only (manifest prune + match
        gating) while unmatched source rows stay insert-eligible —
        standard-SQL MERGE semantics for a target-only conjunct in the
        ON clause."""
        self._filter_source = flag
        return self

    def when_matched_update(
        self, sets: dict[str, str] | None = None, condition: str | None = None
    ) -> "MergeIntoBuilder":
        """``sets``: target column → Spark SQL expression over
        ``target.*`` / ``source.*`` (or a literal); ``None`` replaces the
        whole row with the source row."""
        self._matched.append(_MatchedClause("update", condition, sets))
        return self

    def when_matched_delete(self, condition: str | None = None) -> "MergeIntoBuilder":
        self._matched.append(_MatchedClause("delete", condition, None))
        return self

    def when_not_matched_insert(
        self, values: dict[str, str] | None = None, condition: str | None = None
    ) -> "MergeIntoBuilder":
        require(
            not self._not_matched,
            "only one when_not_matched_insert clause is supported",
        )
        self._not_matched.append(_NotMatchedClause(condition, values))
        return self

    def when_not_matched_by_source_update(
        self, sets: dict[str, str], condition: str | None = None
    ) -> "MergeIntoBuilder":
        """SQL:2016 ``WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE``
        — fires on target rows (inside the boundary) with no source
        match.  ``sets`` is mandatory (there is no source row to copy)
        and, like ``condition``, may reference ``target.*`` only."""
        require(bool(sets), "when_not_matched_by_source_update needs explicit sets")
        for text in [condition or "", *sets.values()]:
            _reject_source_refs(text, "WHEN NOT MATCHED BY SOURCE")
        self._by_source.append(_MatchedClause("update", condition, dict(sets)))
        return self

    def when_not_matched_by_source_delete(
        self, condition: str | None = None
    ) -> "MergeIntoBuilder":
        """SQL:2016 ``WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE``
        — the snapshot-sync clause (delete target rows absent from the
        source), same semantics the SCD1 snapshot mode implements
        (dml/scd1.py apply_as_scd1_snapshot ≙ reference
        scd1_merge.xml:73-141)."""
        _reject_source_refs(condition or "", "WHEN NOT MATCHED BY SOURCE")
        self._by_source.append(_MatchedClause("delete", condition, None))
        return self

    def null_safe_keys(self, flag: bool = True) -> "MergeIntoBuilder":
        """True (default): keys join with ``IS NOT DISTINCT FROM`` so a
        NULL target key matches a NULL source key.  False: standard SQL
        null-rejecting ``=`` — NULL-keyed rows never match (they classify
        NOT MATCHED / NOT MATCHED BY SOURCE).  The textual MERGE surface
        passes False so ``ON t.k = s.k`` keeps standard semantics."""
        self._null_safe_keys = flag
        return self

    def branch(self, b: str) -> "MergeIntoBuilder":
        if self._batch is not None and b != self._batch.branch:
            raise ValidationError(
                "branch is fixed by the batch transaction; set it there"
            )
        self._branch = b
        return self

    def skip_data_sorting(self, flag: bool = True) -> "MergeIntoBuilder":
        self._skip_sort = flag
        return self

    def isolation_level(self, level: str) -> "MergeIntoBuilder":
        assert level in ("snapshot", "serializable")
        self._isolation = level
        return self

    def snapshot_metadata(self, props: dict) -> "MergeIntoBuilder":
        self._snapshot_meta = dict(props)
        return self

    def execute_source_sql_once(
        self, flag: bool = True, how: str = "checkpoint"
    ) -> "MergeIntoBuilder":
        self._source_once = how if flag else None
        return self

    def _resolve_table(self):
        if self._batch is not None:
            return self._batch.table
        return self._engine.catalog.table(self._table_name)

    # -- execute ----------------------------------------------------------
    def execute(self):
        if not self._source_once:
            return self._execute_impl()
        require(self._source is not None, "merge needs a source (using/source_sql)")
        self._source = materialize_source(self._source, self._source_once)
        try:
            return self._execute_impl()
        finally:
            cleanup_materialized_source(self._source)

    def _execute_impl(self):
        require(self._source is not None, "merge needs a source (using/source_sql)")
        require(bool(self._keys), "merge needs key_columns")
        require(
            bool(self._matched) or bool(self._not_matched) or bool(self._by_source),
            "merge needs at least one WHEN clause",
        )
        tbl = self._resolve_table()
        cols = tbl.schema.fieldNames()
        missing = set(self._keys) - set(cols)
        require(not missing, f"key columns not in table: {sorted(missing)}")
        for cl in (*self._matched, *self._by_source):
            if cl.sets:
                bad = set(cl.sets) - set(cols)
                require(not bad, f"update sets unknown columns: {sorted(bad)}")
                overlap = set(cl.sets) & set(self._keys)
                require(
                    not overlap, f"update sets must not touch keys: {sorted(overlap)}"
                )
        for cl in self._not_matched:
            if cl.values:
                bad = set(cl.values) - set(cols)
                require(not bad, f"insert values unknown columns: {sorted(bad)}")

        if self._filter is None and self._filter_columns:
            self._filter = filter_from_source_values(
                self._source, self._filter_columns, tbl.schema
            )
        if self._filter is None:
            require(
                self._unbounded,
                "merge needs a table filter (table_filter / table_filter_sql / "
                "table_filter_columns) or an explicit unbounded() opt-out — "
                "an unbounded merge rewrites against a full scan",
            )
            self._filter = E.always_true()

        base_paths = {
            e.path
            for e in tbl.meta.read_manifest(tbl.meta.current_snapshot(self._branch))
        }

        src_missing = set(cols) - set(self._source.columns)
        # the source needs every table column only for whole-row update /
        # as-is insert; clause-scoped merges may use narrower sources
        needs_full = any(cl.sets is None for cl in self._matched) or any(
            cl.values is None for cl in self._not_matched
        )
        require(
            not (needs_full and src_missing),
            f"source missing table columns {sorted(src_missing)} — provide "
            "them, or give every clause explicit sets/values",
        )

        # ``__present__`` sentinel: after the FULL OUTER join, target-only
        # rows carry NULL here — a structural "source side exists" probe
        # that stays correct even for an all-NULL source row
        src = self._source
        if self._filter_source:
            src = src.filter(self._filter.column())
        src = src.withColumn("__present__", F.lit(True)).alias("source")
        entries = tbl.prune(
            tbl.meta.read_manifest(tbl.meta.current_snapshot(self._branch)),
            self._filter,
        )
        # the target is NOT row-filtered: pruned files are read whole so
        # out-of-boundary rows in a touched file classify N and survive the
        # rewrite via the carry-over (same shape as scd_common.build_joined);
        # only CANDIDATE rows (boundary-true) may match the source
        tgt = (
            tbl._read_entries(entries, with_file_name=True)
            .withColumn(RID, F.monotonically_increasing_id())
            .withColumn(
                "__candidate__",
                F.when(self._filter.column(), True).otherwise(False),
            )
            .alias("target")
        )
        on = F.col("target.__candidate__")
        for k in self._keys:
            tk, sk = F.col(f"target.{k}"), F.col(f"source.{k}")
            on = on & (tk.eqNullSafe(sk) if self._null_safe_keys else (tk == sk))
        for mc in self._match_conditions:
            # residual gates the MATCH only: under a full-outer join a
            # failing pair degenerates into a target-only row (walks
            # NOT MATCHED BY SOURCE) and a source-only row (insert path)
            on = on & _expr(mc)
        j = tgt.join(src, on, "full_outer")

        matched = (
            F.col(f"target.{RID}").isNotNull()
            & F.col("source.__present__").isNotNull()
        )

        # first-match-wins clause walk → op + clause index
        op = None
        clause_idx = F.lit(None).cast("int")
        for i, cl in enumerate(self._matched):
            cond = matched & (_expr(cl.condition) if cl.condition else F.lit(True))
            tag = "D" if cl.action == "delete" else "U"
            if op is None:
                op = F.when(cond, tag)
                clause_idx = F.when(cond, F.lit(i))
            else:
                op = op.when(cond, tag)
                clause_idx = clause_idx.when(cond, F.lit(i))
        # NOT MATCHED BY SOURCE: candidate target rows with no source side.
        # Out-of-boundary rows are NOT candidates — the boundary contract
        # (rows outside the filter are invisible to the merge) holds for
        # this clause too, which is what keeps the rewrite manifest-pruned.
        by_source = (
            F.col(f"target.{RID}").isNotNull()
            & F.col("source.__present__").isNull()
            & F.col("target.__candidate__")
        )
        for i, cl in enumerate(self._by_source):
            cond = by_source & (_expr(cl.condition) if cl.condition else F.lit(True))
            tag = "D" if cl.action == "delete" else "U"
            idx = len(self._matched) + i
            if op is None:
                op = F.when(cond, tag)
                clause_idx = F.when(cond, F.lit(idx))
            else:
                op = op.when(cond, tag)
                clause_idx = clause_idx.when(cond, F.lit(idx))
        ins_cond = F.lit(False)
        if self._not_matched:
            cl = self._not_matched[0]
            ins_cond = (
                F.col(f"target.{RID}").isNull()
                & (_expr(cl.condition) if cl.condition else F.lit(True))
            )
        if op is None:
            op = F.when(ins_cond, "I")
        else:
            op = op.when(ins_cond, "I")
        op = op.otherwise("N")

        # updated values, resolved per fired clause (first match wins)
        upd_cols: list[Column] = []
        for c in cols:
            v = F.col(f"target.{c}")
            expr = None
            # by-source clauses share the index space (offset by
            # len(matched), matching the op walk above); their sets are
            # always explicit so the target-column fallback applies
            for i, cl in enumerate((*self._matched, *self._by_source)):
                if cl.action != "update":
                    continue
                cv = _expr(cl.sets[c]) if (cl.sets and c in cl.sets) else (
                    F.col(f"target.{c}") if cl.sets else F.col(f"source.{c}")
                )
                branch = (F.col("__clause__") == i, cv)
                expr = F.when(*branch) if expr is None else expr.when(*branch)
            upd_cols.append(
                (expr.otherwise(v) if expr is not None else v).alias(f"__upd_{c}")
            )
        ins_cols: list[Column] = []
        if self._not_matched:
            cl = self._not_matched[0]
            for c in cols:
                if cl.values and c in cl.values:
                    v = _expr(cl.values[c])
                elif cl.values:
                    v = F.lit(None)
                else:
                    v = F.col(f"source.{c}")
                ins_cols.append(v.alias(f"__ins_{c}"))

        types = {f.name: f.dataType for f in tbl.schema.fields}
        diffs = (
            j.withColumn("__clause__", clause_idx)
            .select(
                op.alias(OP),
                F.col("target._file").alias(FILE),
                F.col(f"target.{RID}").alias(RID),
                matched.alias("__matched__"),
                *[F.col(f"target.{c}").alias(c) for c in cols],
                *upd_cols,
                *ins_cols,
            )
            .persist()
        )
        try:
            check_cardinality(diffs)
            touched = touched_files(diffs, noop_ops=("N", "I"))
            updated = diffs.filter(F.col(OP) == "U").select(
                *[F.col(f"__upd_{c}").cast(types[c]).alias(c) for c in cols]
            )
            parts = [updated]
            if self._not_matched:
                parts.append(
                    diffs.filter(F.col(OP) == "I").select(
                        *[F.col(f"__ins_{c}").cast(types[c]).alias(c) for c in cols]
                    )
                )
            if touched:
                parts.append(
                    with_touched_flag(diffs, touched)
                    .filter((F.col(OP) == "N") & F.col(TOUCHED) & F.col(RID).isNotNull())
                    .select(*cols)
                )
            new_data = parts[0]
            for p in parts[1:]:
                new_data = new_data.unionByName(p)
            return commit_merge(
                tbl,
                new_data,
                touched,
                self._branch,
                op="overwrite",
                skip_sort=self._skip_sort,
                isolation=self._isolation,
                conflict_filter=self._filter,
                base_paths=base_paths,
                batch=self._batch,
                extra_summary=self._snapshot_meta,
            )
        finally:
            diffs.unpersist()
