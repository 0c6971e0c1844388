"""Engine expression tree: pushdown filters with exact SQL semantics.

Counterpart of the reference's ``expressions/Expressions.java`` (SURVEY.md
§2.A row A5, §2.C.1-2), re-designed for Spark:

- :meth:`Expr.column`      — compile to a Catalyst ``Column`` (row-level
  residual filter; Catalyst then pushes it into the parquet scan too).
- :meth:`Expr.eval_stats`  — 3-valued evaluation against a file's
  partition values + column min/max/null-count stats:  ``True`` = every
  row matches, ``False`` = no row can match (file pruned),
  ``None`` = maybe.  This is the manifest-level pruning the reference
  gets from Iceberg's manifest evaluator.

Semantics preserved exactly (reference citations):

- NULL literal in a comparison → ``ALWAYS_FALSE``; NULL literals inside
  ``IN`` lists are dropped (Expressions.java:580-595).
- NOT pushes down by negating leaves, not the tree (Expressions.java:556-579).
- NaN sorts greatest: ``lt(col, NaN) → col != NaN``; ``le(col, NaN) →
  TRUE``; ``gt(col, NaN) → FALSE``; ``gt(col, v: float) → isnan(col) OR
  col > v`` (Expressions.java:144-231) — matching both Spark's and
  DuckDB's total order.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


class Expr:
    """Base class.  Build with the module-level factory functions."""

    def column(self) -> Column:
        raise NotImplementedError

    def eval_stats(self, stats: "FileStatsView") -> bool | None:
        """3-valued: True=all rows match, False=no rows match, None=maybe."""
        raise NotImplementedError

    def negate(self) -> "Expr":
        raise NotImplementedError

    def references(self) -> set[str]:
        return set()

    def __and__(self, other: "Expr") -> "Expr":
        return and_(self, other)

    def __or__(self, other: "Expr") -> "Expr":
        return or_(self, other)

    def __invert__(self) -> "Expr":
        return not_(self)


class FileStatsView:
    """What pruning sees for one data file: partition values (already
    transformed) and per-column (min, max, null_count, value_count)."""

    def __init__(
        self,
        partition: dict[str, Any] | None,
        col_stats: dict[str, dict[str, Any]] | None,
        records: int | None = None,
    ) -> None:
        self.partition = partition or {}
        self.col_stats = col_stats or {}
        self.records = records

    def bounds(self, col: str):
        s = self.col_stats.get(col)
        if s is None:
            return None, None, None
        return s.get("min"), s.get("max"), s.get("nulls")


@dataclass(frozen=True)
class AlwaysTrue(Expr):
    def column(self) -> Column:
        return F.lit(True)

    def eval_stats(self, stats: FileStatsView):
        return True

    def negate(self) -> Expr:
        return AlwaysFalse()

    def __repr__(self) -> str:
        return "TRUE"


@dataclass(frozen=True)
class AlwaysFalse(Expr):
    def column(self) -> Column:
        return F.lit(False)

    def eval_stats(self, stats: FileStatsView):
        return False

    def negate(self) -> Expr:
        return AlwaysTrue()

    def __repr__(self) -> str:
        return "FALSE"


def _is_nan(v: Any) -> bool:
    return isinstance(v, float) and math.isnan(v)


def _prefix_successor(p: str) -> str | None:
    """Smallest string greater than EVERY string with prefix ``p``: bump
    the last non-maximal char (dropping the tail), skipping surrogates.
    None when all chars are U+10FFFF (no successor exists)."""
    for i in range(len(p) - 1, -1, -1):
        cp = ord(p[i])
        if cp < 0x10FFFF:
            ncp = cp + 1
            if 0xD800 <= ncp <= 0xDFFF:
                ncp = 0xE000
            return p[:i] + chr(ncp)
    return None


def _iso(v: Any) -> Any:
    """File stats store date/timestamp bounds as ISO strings
    (stats._portable); predicate literals arrive as date/datetime
    objects.  Normalize BOTH to the ISO string domain so pruning on the
    most common filter-column types actually fires (lexicographic ISO
    order ≡ chronological order for the uniform format used)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


_ISO_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_ISO_DATETIME_RE = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d+)?$")


def _iso_class(s: str) -> str | None:
    """'date' / 'datetime' when ``s`` is exactly one ISO encoding (the
    formats _iso/stats._portable emit), else None."""
    if _ISO_DATE_RE.match(s):
        return "date"
    if _ISO_DATETIME_RE.match(s):
        return "datetime"
    return None


def _cmp(a: Any, b: Any) -> int | None:
    """Total-order compare with NaN greatest (Spark/DuckDB order).
    None when values are incomparable (mixed types we don't coerce —
    except date/datetime vs their own ISO string stats encoding)."""
    if _is_nan(a) and _is_nan(b):
        return 0
    if _is_nan(a):
        return 1
    if _is_nan(b):
        return -1
    try:
        if a == b:
            return 0
        return -1 if a < b else 1
    except TypeError:
        a2, b2 = _iso(a), _iso(b)
        if a2 is a and b2 is b:
            return None
        if not (isinstance(a2, str) and isinstance(b2, str)):
            return None
        # Lexicographic ISO order is chronological only WITHIN one
        # format class.  Across classes it is not: a date literal
        # '2020-01-01' sorts strictly below the equal-instant timestamp
        # stat '2020-01-01 00:00:00', so Eq(ts_col, date(2020,1,1))
        # would conclude lit < min and prune a file whose midnight row
        # Spark (date upcast to timestamp) matches.  Pad the date side
        # to the timestamp domain — exactly Spark's upcast — and refuse
        # non-ISO strings (a temporal literal against a plain string
        # stat is a type mismatch we must not order lexicographically).
        ka, kb = _iso_class(a2), _iso_class(b2)
        if ka is None or kb is None:
            return None
        if ka != kb:
            if ka == "date":
                a2 = a2 + " 00:00:00"
            else:
                b2 = b2 + " 00:00:00"
        return 0 if a2 == b2 else (-1 if a2 < b2 else 1)


@dataclass(frozen=True)
class Predicate(Expr):
    op: str  # eq ne lt le gt ge is_null not_null is_nan not_nan
    col: str
    value: Any = None

    def references(self) -> set[str]:
        return {self.col}

    # -- Catalyst ---------------------------------------------------------
    def column(self) -> Column:
        c = F.col(self.col)
        v = self.value
        if self.op == "is_null":
            return c.isNull()
        if self.op == "not_null":
            return c.isNotNull()
        if self.op == "is_nan":
            return F.isnan(c)
        if self.op == "not_nan":
            return ~F.isnan(c)
        # NaN-aware rewrites (reference Expressions.java:144-231)
        if _is_nan(v):
            return {
                "eq": F.isnan(c),
                "ne": ~F.isnan(c),
                "lt": ~F.isnan(c) & c.isNotNull(),
                "le": c.isNotNull(),
                "gt": F.lit(False),
                "ge": F.isnan(c),
            }[self.op]
        if self.op == "eq":
            return c == v
        if self.op == "ne":
            return c != v
        if self.op == "lt":
            return c < v
        if self.op == "le":
            return c <= v
        # gt/ge on float columns: NaN is greater than every value
        if self.op == "gt":
            if isinstance(v, float):
                return F.isnan(c) | (c > v)
            return c > v
        if self.op == "ge":
            if isinstance(v, float):
                return F.isnan(c) | (c >= v)
            return c >= v
        raise ValueError(self.op)

    # -- stats ------------------------------------------------------------
    def eval_stats(self, stats: FileStatsView):  # noqa: C901
        # Partition value, if this column is identity-partitioned, gives an
        # exact answer for the whole file.
        if self.col in stats.partition:
            pv = stats.partition[self.col]
            return self._eval_exact(pv)
        mn, mx, nulls = stats.bounds(self.col)
        records = stats.records
        all_null = nulls is not None and records is not None and nulls == records
        no_null = nulls == 0

        if self.op == "is_null":
            if all_null:
                return True
            if no_null:
                return False
            return None
        if self.op == "not_null":
            if all_null:
                return False
            if no_null:
                return True
            return None
        if self.op in ("is_nan", "not_nan"):
            return None  # parquet stats don't track NaN

        if all_null:
            return False  # comparisons never match NULL rows
        if mn is None or mx is None:
            return None
        v = self.value
        if _is_nan(v):
            return None  # NaN bounds aren't in parquet stats
        lo, hi = _cmp(v, mn), _cmp(v, mx)
        if lo is None or hi is None:
            return None
        maybe_null = not no_null

        def definite(val: bool):
            # "all rows match" needs no NULLs in the file (NULL rows fail
            # every comparison).
            if val and maybe_null:
                return None
            return val

        if self.op == "eq":
            if lo < 0 or hi > 0:
                return False
            if lo == 0 and hi == 0:
                return definite(True)
            return None
        if self.op == "ne":
            if lo < 0 or hi > 0:
                return definite(True)
            if lo == 0 and hi == 0:
                return False
            return None
        if self.op == "lt":  # col < v
            if lo <= 0:  # v <= min → nothing below v
                return False
            if hi > 0:  # v > max → all below
                return definite(True)
            return None
        if self.op == "le":
            if lo < 0:
                return False
            if hi >= 0:
                return definite(True)
            return None
        if self.op == "gt":  # col > v
            if hi >= 0:  # v >= max
                return False
            if lo < 0:  # v < min
                return definite(True)
            return None
        if self.op == "ge":
            if hi > 0:
                return False
            if lo <= 0:
                return definite(True)
            return None
        raise ValueError(self.op)

    def _eval_exact(self, pv: Any):
        v = self.value
        if self.op == "is_null":
            return pv is None
        if self.op == "not_null":
            return pv is not None
        if self.op == "is_nan":
            return _is_nan(pv)
        if self.op == "not_nan":
            return pv is not None and not _is_nan(pv)
        if pv is None:
            return False
        c = _cmp(pv, v)
        if c is None:
            return None
        return {
            "eq": c == 0,
            "ne": c != 0,
            "lt": c < 0,
            "le": c <= 0,
            "gt": c > 0,
            "ge": c >= 0,
        }[self.op]

    def negate(self) -> Expr:
        neg = {
            "eq": "ne",
            "ne": "eq",
            "lt": "ge",
            "le": "gt",
            "gt": "le",
            "ge": "lt",
            "is_null": "not_null",
            "not_null": "is_null",
            "is_nan": "not_nan",
            "not_nan": "is_nan",
        }[self.op]
        return Predicate(neg, self.col, self.value)

    def __repr__(self) -> str:
        return f"{self.col} {self.op} {self.value!r}"


@dataclass(frozen=True)
class InPredicate(Expr):
    col: str
    values: tuple
    negated: bool = False

    def references(self) -> set[str]:
        return {self.col}

    def column(self) -> Column:
        c = F.col(self.col).isin(*self.values)
        return ~c if self.negated else c

    def eval_stats(self, stats: FileStatsView):
        parts = [Predicate("eq", self.col, v).eval_stats(stats) for v in self.values]
        if self.negated:
            # NOT IN: all rows match iff every value misses every row; no
            # rows match iff some value matches all rows.
            if any(p is True for p in parts):
                return False
            if all(p is False for p in parts):
                # every value provably absent; still NULL rows fail NOT IN
                _, _, nulls = stats.bounds(self.col)
                if self.col in stats.partition:
                    return stats.partition[self.col] is not None
                return True if nulls == 0 else None
            return None
        if any(p is True for p in parts):
            return True
        if all(p is False for p in parts):
            return False
        return None

    def negate(self) -> Expr:
        return InPredicate(self.col, self.values, not self.negated)

    def __repr__(self) -> str:
        return f"{self.col} {'not in' if self.negated else 'in'} {self.values!r}"


@dataclass(frozen=True)
class StartsWith(Expr):
    """LIKE 'prefix%' — the one LIKE shape the reference pushes down
    (SchemaEvolution.java:663-696)."""

    col: str
    prefix: str
    negated: bool = False

    def references(self) -> set[str]:
        return {self.col}

    def column(self) -> Column:
        c = F.col(self.col).startswith(self.prefix)
        return ~c if self.negated else c

    def eval_stats(self, stats: FileStatsView):
        if self.col in stats.partition:
            pv = stats.partition[self.col]
            if pv is None:
                return False
            hit = isinstance(pv, str) and pv.startswith(self.prefix)
            return (not hit) if self.negated else hit
        mn, mx, nulls = stats.bounds(self.col)
        if mn is None or mx is None or not isinstance(mn, str) or not isinstance(mx, str):
            return None
        p = self.prefix
        if self.negated:
            if mn.startswith(p) and mx.startswith(p):
                # every value between two p-prefixed bounds is p-prefixed
                # (lexicographic interval property) → NOT prefix matches
                # zero rows: prune
                return False
            # no value has prefix p iff the range is entirely below p or
            # entirely at/above the SUCCESSOR prefix.  p+U+FFFF is NOT
            # that successor — code points above U+FFFF sort after it, so
            # p-prefixed astral-plane strings would wrongly prove
            # all-match (and a delete would drop rows it must keep).
            succ = _prefix_successor(p)
            if mx < p or (succ is not None and mn >= succ):
                return True if nulls == 0 else None
            return None
        if mx < p or (not mn.startswith(p) and mn > p):
            # whole range below prefix, or above every string with prefix
            if mn[: len(p)] > p:
                return False
            if mx < p:
                return False
        return None

    def negate(self) -> Expr:
        return StartsWith(self.col, self.prefix, not self.negated)


@dataclass(frozen=True)
class And(Expr):
    left: Expr
    right: Expr

    def references(self) -> set[str]:
        return self.left.references() | self.right.references()

    def column(self) -> Column:
        return self.left.column() & self.right.column()

    def eval_stats(self, stats: FileStatsView):
        l, r = self.left.eval_stats(stats), self.right.eval_stats(stats)
        if l is False or r is False:
            return False
        if l is True and r is True:
            return True
        return None

    def negate(self) -> Expr:
        return Or(self.left.negate(), self.right.negate())

    def __repr__(self) -> str:
        return f"({self.left!r} AND {self.right!r})"


@dataclass(frozen=True)
class Or(Expr):
    left: Expr
    right: Expr

    def references(self) -> set[str]:
        return self.left.references() | self.right.references()

    def column(self) -> Column:
        return self.left.column() | self.right.column()

    def eval_stats(self, stats: FileStatsView):
        l, r = self.left.eval_stats(stats), self.right.eval_stats(stats)
        if l is True or r is True:
            return True
        if l is False and r is False:
            return False
        return None

    def negate(self) -> Expr:
        return And(self.left.negate(), self.right.negate())

    def __repr__(self) -> str:
        return f"({self.left!r} OR {self.right!r})"


# -- factory API (mirrors reference Expressions.java:39-607) ---------------

def col_eq(col: str, v: Any) -> Expr:
    return AlwaysFalse() if v is None else Predicate("eq", col, v)


def col_ne(col: str, v: Any) -> Expr:
    return AlwaysFalse() if v is None else Predicate("ne", col, v)


def lt(col: str, v: Any) -> Expr:
    return AlwaysFalse() if v is None else Predicate("lt", col, v)


def le(col: str, v: Any) -> Expr:
    return AlwaysFalse() if v is None else Predicate("le", col, v)


def gt(col: str, v: Any) -> Expr:
    return AlwaysFalse() if v is None else Predicate("gt", col, v)


def ge(col: str, v: Any) -> Expr:
    return AlwaysFalse() if v is None else Predicate("ge", col, v)


def between(col: str, lo: Any, hi: Any) -> Expr:
    return and_(ge(col, lo), le(col, hi))


def is_null(col: str) -> Expr:
    return Predicate("is_null", col)


def not_null(col: str) -> Expr:
    return Predicate("not_null", col)


def is_nan(col: str) -> Expr:
    return Predicate("is_nan", col)


def in_(col: str, values: Sequence[Any]) -> Expr:
    vals = tuple(v for v in values if v is not None)  # NULLs dropped (§2.C.1)
    if not vals:
        return AlwaysFalse()
    if len(vals) == 1:
        return col_eq(col, vals[0])
    return InPredicate(col, vals)


def not_in(col: str, values: Sequence[Any]) -> Expr:
    vals = tuple(v for v in values if v is not None)
    if not vals:
        return AlwaysTrue()
    return InPredicate(col, vals, negated=True)


def starts_with(col: str, prefix: str) -> Expr:
    return StartsWith(col, prefix)


def and_(*exprs: Expr) -> Expr:
    out: Expr | None = None
    for e in exprs:
        if isinstance(e, AlwaysTrue):
            continue
        if isinstance(e, AlwaysFalse):
            return AlwaysFalse()
        out = e if out is None else And(out, e)
    return out if out is not None else AlwaysTrue()


def or_(*exprs: Expr) -> Expr:
    out: Expr | None = None
    for e in exprs:
        if isinstance(e, AlwaysFalse):
            continue
        if isinstance(e, AlwaysTrue):
            return AlwaysTrue()
        out = e if out is None else Or(out, e)
    return out if out is not None else AlwaysFalse()


def not_(e: Expr) -> Expr:
    """Pushed down by negating leaves, not wrapping the tree (§2.C.1)."""
    return e.negate()


def always_true() -> Expr:
    return AlwaysTrue()


def always_false() -> Expr:
    return AlwaysFalse()
