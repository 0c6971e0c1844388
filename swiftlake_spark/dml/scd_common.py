"""Shared machinery for SCD1/SCD2 merges.

The reference materializes a diff dataset (FULL/LEFT OUTER JOIN of
target and source with an ``__operation_type__`` classification) to
parquet, derives the touched-file list, and rewrites only those files
(dao/scd1_merge.xml, dao/scd2_merge.xml; SURVEY.md §3.3).  Here the diff
is a cached DataFrame; everything else is the same shape:

- candidate tagging: target rows get ``__candidate__`` = boundary
  condition; source rows are always candidates; the join requires
  candidate equality, so out-of-boundary target rows never match and
  classify as ``N``.
- key join is null-safe (``IS NOT DISTINCT FROM`` ≙ ``<=>``,
  dao/common.xml:8-18).
- merge cardinality: a target row matching >1 source rows fails
  (dao/common.xml:21-31) — detected via a per-target-row id.
- value/change-tracking compare supports ``max_delta`` (numeric
  tolerance) and ``null_replacement`` variants (§2.C.6).

Scale: the target read is manifest-pruned by the boundary filter; the
diff is persisted (memory+disk) instead of re-derived; only file NAMES
are collected to the driver (same as the reference's distinct-filename
probe); rewritten data flows through the partitioned writer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.metadata import CommitConflict, ValidationError
from swiftlake_spark.tables.table import Table

OP = "__op__"
FILE = "__file__"
RID = "__rid__"


@dataclass
class ValueColumnMeta:
    max_delta: float | None = None
    null_replacement: Any = None


def value_diff_condition(
    cols: list[str], meta: dict[str, ValueColumnMeta] | None
) -> Column:
    """OR over per-column difference tests (scd1_merge.xml valueColumnsDiff)."""
    meta = meta or {}
    conds: list[Column] = []
    for c in cols:
        me, other = F.col(f"me.{c}"), F.col(f"other.{c}")
        m = meta.get(c)
        if m is not None and m.max_delta is not None:
            # NULL coalesces to 0 on BOTH sides — deliberate reference
            # parity (scd1_merge.xml:154-155: abs(coalesce(me.c,0) -
            # coalesce(other.c,0)) > delta), so NULL vs a value within
            # delta of 0 classifies as no-change there too; max_delta
            # wins over null_replacement, also like the reference
            conds.append(
                F.abs(F.coalesce(me, F.lit(0)) - F.coalesce(other, F.lit(0)))
                > m.max_delta
            )
        elif m is not None and m.null_replacement is not None:
            nr = F.lit(m.null_replacement)
            conds.append(~F.coalesce(me, nr).eqNullSafe(F.coalesce(other, nr)))
        else:
            conds.append(~me.eqNullSafe(other))
    return reduce(lambda a, b: a | b, conds)


def key_join_condition(keys: list[str]) -> Column:
    return reduce(
        lambda a, b: a & b,
        [F.col(f"me.{k}").eqNullSafe(F.col(f"other.{k}")) for k in keys],
    )


def build_joined(
    tbl: Table,
    source: DataFrame,
    keys: list[str],
    candidate: Column,
    boundary: E.Expr,
    how: str,
    branch: str = "main",
) -> DataFrame:
    """Target (pruned by boundary, with file name + row id + candidate
    flag) joined to source on candidate-equality AND null-safe keys.
    The target is read from ``branch`` — a merge into a branch must diff
    against that branch's state, not main's."""
    entries = tbl.prune(
        tbl.meta.read_manifest(tbl.meta.current_snapshot(branch)), boundary
    )
    tgt = tbl._read_entries(entries, with_file_name=True)
    me = (
        tgt.withColumn(RID, F.monotonically_increasing_id())
        .withColumn("__candidate__", F.when(candidate, True).otherwise(False))
        .alias("me")
    )
    other = source.withColumn("__candidate__", F.lit(True)).alias("other")
    cond = (F.col("me.__candidate__") == F.col("other.__candidate__")) & key_join_condition(
        keys
    )
    return me.join(other, cond, how)


def check_cardinality(diffs: DataFrame) -> None:
    """Fail if any target row matched more than one source row
    (reference WriteUtil.checkMergeCardinality)."""
    dup = (
        diffs.filter(F.col(RID).isNotNull() & F.col("__matched__"))
        .groupBy(RID)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValidationError(
            "merge cardinality violation: a target row matched multiple source rows"
        )


def touched_files(diffs: DataFrame, noop_ops: tuple[str, ...]) -> list[str]:
    rows = (
        diffs.filter(~F.col(OP).isin(*noop_ops) & F.col(FILE).isNotNull())
        .select(FILE)
        .distinct()
        .collect()
    )
    return [r[FILE] for r in rows]


TOUCHED = "__touched__"


def with_touched_flag(diffs: DataFrame, touched: list[str]) -> DataFrame:
    """Tag diff rows whose ``FILE`` is in ``touched`` with a boolean
    ``TOUCHED`` column via a broadcast left join — NOT an ``isin``
    literal.  A merge brushing 10^5 files at 100 TB would otherwise
    embed a megabyte-scale ``IN`` list into the plan (blowing up plan
    serialization and codegen); a broadcast hash join against a
    one-column DataFrame of names is O(files) driver memory once and
    costs no shuffle."""
    if not touched:
        return diffs.withColumn(TOUCHED, F.lit(False))
    spark = diffs.sparkSession
    tdf = spark.createDataFrame(
        [(f,) for f in touched], f"{FILE} string"
    ).withColumn(TOUCHED, F.lit(True))
    out = diffs.join(F.broadcast(tdf), on=FILE, how="left")
    return out.withColumn(TOUCHED, F.coalesce(F.col(TOUCHED), F.lit(False)))


def commit_merge(
    tbl: Table, new_data: DataFrame | None, touched: list[str], branch: str, op: str,
    skip_sort: bool = False, isolation: str = "snapshot",
    conflict_filter=None, base_paths: set[str] | None = None, batch=None,
    extra_summary: dict | None = None,
) -> Any:
    """Replace the touched files with freshly written ones.  ``touched``
    holds file URIs from ``input_file_name()``; the manifest keys are
    table-relative paths."""
    new_entries = (
        tbl._write_files(new_data, skip_sort=skip_sort) if new_data is not None else []
    )
    removed = {tbl._rel_path(f) for f in touched}

    if batch is not None:
        # defer into the batch transaction (reference
        # applyChangesAsSCD1/2(TableBatchTransaction)); cross-transaction
        # validation and the combined commit happen there
        if not new_entries and not removed:
            batch.note_noop()
        else:
            batch.add_overwrite(
                new_entries, removed, conflict_filter, isolation,
                extra_summary=extra_summary, base_paths=base_paths,
            )
        return None

    def mutate(cur):
        return [e for e in cur if e.path not in removed] + new_entries

    def validate(cur):
        present = {e.path for e in cur}
        missing = removed - present
        if missing:
            raise CommitConflict(f"files deleted concurrently: {sorted(missing)[:3]}")

    return tbl._commit(
        op=op,
        branch=branch,
        mutate=mutate,
        validate=validate,
        summary={
            "deleted-files": len(removed),
            "added-files": len(new_entries),
            "added-records": sum(e.records for e in new_entries),
            **(extra_summary or {}),
        },
        isolation=isolation,
        conflict_filter=conflict_filter,
        base_paths=base_paths,
    )


def expand_source_columns(
    src: DataFrame, cols: list[str], schema, keys: list[str],
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Subset-column merge (reference ``Builder.columns(...)``,
    SCD1Merge.java:839-841 + SCD1MergeAdvancedIntegrationTest
    testColumns): the source is projected onto ``cols`` and every
    unlisted table column becomes a typed NULL.  The merge then runs on
    the full schema — so an update overwrites unlisted columns with NULL
    (and the NULL-vs-value difference itself makes the row classify U),
    while untouched/carried rows keep their stored values."""
    require(bool(cols), "columns() needs at least one column")
    names = schema.fieldNames()
    bad = set(cols) - set(names)
    require(not bad, f"merge columns not in table: {sorted(bad)}")
    require(set(keys) <= set(cols), "key columns must be included in columns()")
    types = {f.name: f.dataType for f in schema.fields}
    extra = list(extra_cols or [])
    out = src.select(*cols, *extra)
    for c in names:
        if c not in cols:
            out = out.withColumn(c, F.lit(None).cast(types[c]))
    return out.select(*names, *extra)


def filter_from_source_values(src: DataFrame, cols: list[str], schema) -> E.Expr:
    """Boundary filter derived from the source's distinct values of
    ``cols`` (reference ``tableFilterColumns``, WriteUtil.java:228-264 +
    dao/common.xml:62-69): OR over per-row null-safe equality conjuncts.
    The distinct set is collected to the driver — these are partition-ish
    boundary columns, so the set is small by contract (the reference
    materializes the same list driver-side)."""
    names = schema.fieldNames()
    bad = set(cols) - set(names)
    require(not bad, f"table filter columns not in table: {sorted(bad)}")
    rows = src.select(*cols).distinct().collect()
    require(bool(rows), "source has no rows to derive a table filter from")
    disjuncts = []
    for r in rows:
        conjuncts = [
            E.is_null(c) if r[c] is None else E.col_eq(c, r[c]) for c in cols
        ]
        disjuncts.append(E.and_(*conjuncts) if len(conjuncts) > 1 else conjuncts[0])
    return E.or_(*disjuncts) if len(disjuncts) > 1 else disjuncts[0]


def materialize_source(df: DataFrame, how: str = "checkpoint", tmp_dir: str | None = None) -> DataFrame:
    """Evaluate a possibly non-deterministic source exactly once and hand
    every downstream consumer (boundary probe, diff join, cardinality
    check, write) the same materialized rows — ≙ reference
    ``executeSourceSqlOnceOnly`` (commands/Insert.java:208-218,
    commands/SCD1Merge.java:185-203: the source SQL is written to temp
    parquet once and all merge stages read those files).

    ``how``:
    - ``"checkpoint"`` (default) — ``localCheckpoint(eager=True)``:
      evaluates now, stores blocks on executor storage, truncates
      lineage.  Fast; blocks are re-replicated, not recomputed, on
      normal reads.
    - ``"parquet"`` — durable temp-parquet round-trip (the reference's
      exact strategy).  Preferred at very large scale where executor
      block storage for the whole source is not guaranteed; requires
      ``tmp_dir``.
    """
    if how == "checkpoint":
        return df.localCheckpoint(eager=True)
    if how == "parquet":
        import os
        import tempfile
        import uuid as _uuid

        # always a private local temp dir — never inside the table
        # location (vacuum doesn't know about it, and the reference
        # cleans its temp files after the merge; the builder deletes
        # this dir once execute() commits, via the attribute below)
        if tmp_dir is None or "://" in tmp_dir:
            tmp_dir = tempfile.mkdtemp(prefix="swiftlake_source_once_")
        path = os.path.join(tmp_dir, f"source_once_{_uuid.uuid4().hex[:12]}")
        df.write.parquet(path, mode="errorifexists")
        out = df.sparkSession.read.parquet(path)
        out._swiftlake_source_once_path = path  # builder cleanup hook
        return out
    raise ValidationError(f"unknown materialize_source mode {how!r}")


def cleanup_materialized_source(df: DataFrame | None) -> None:
    """Delete the temp-parquet copy behind a materialized source, called
    by the builders AFTER their commit (every consumer has run by then)."""
    path = getattr(df, "_swiftlake_source_once_path", None)
    if path:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


def require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValidationError(msg)
