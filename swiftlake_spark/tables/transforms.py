"""Hidden partition transforms.

Reference surface: identity, bucket[n], truncate[w], year, month, day,
hour (README.md:52-58, expressions/Expressions.java:439-465; writer-side
evaluation writer/PartitionedDataFileWriter.java:597-606).

Each transform has two faces that MUST agree value-for-value:

- :meth:`Transform.column` — Spark Column over the source column (write
  path: becomes the physical partition key; and scan-time residuals).
- :meth:`Transform.apply`  — Python scalar (pruning path: transforms
  filter literals so predicates can be evaluated against manifest
  partition values).

``bucket`` uses CRC32 of the value's canonical string — ``F.crc32`` and
``zlib.crc32`` are the same public algorithm, so both faces agree by
construction (we deliberately do NOT chase Iceberg's murmur3 bucket
function; this format defines its own).
"""

from __future__ import annotations

import datetime as dt
import re
import zlib
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from swiftlake_spark.tables import expressions as E


@dataclass(frozen=True)
class Transform:
    name: str  # identity | bucket | truncate | year | month | day | hour
    source: str  # source column name
    param: int | None = None  # n for bucket, w for truncate

    @property
    def partition_name(self) -> str:
        if self.name == "identity":
            return self.source
        suffix = f"_{self.param}" if self.param is not None else ""
        return f"{self.source}_{self.name}{suffix}"

    # -- Spark face -------------------------------------------------------
    def column(self, dtype: str | None = None) -> Column:
        c = F.col(self.source)
        if self.name == "identity":
            return c
        if self.name == "bucket":
            return F.pmod(F.crc32(c.cast("string").cast("binary")), F.lit(self.param)).cast(
                "int"
            )
        if self.name == "truncate":
            # strings: first w chars; integers: floor to multiple of w
            if dtype == "string":
                return F.substring(c, 1, self.param)
            if dtype is None:
                raise ValueError("truncate transform needs the source dtype")
            return (c - F.pmod(c, F.lit(self.param))).cast(dtype)
        if self.name == "year":
            return F.year(c).cast("int")
        if self.name == "month":
            return (F.year(c) * 100 + F.month(c)).cast("int")
        if self.name == "day":
            return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("int")
        if self.name == "hour":
            return (
                (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)) * 100
                + F.hour(c)
            ).cast("bigint")
        raise ValueError(self.name)

    # -- Python face ------------------------------------------------------
    def apply(self, v: Any) -> Any:
        if v is None:
            return None
        if self.name == "identity":
            return v
        if self.name == "bucket":
            return zlib.crc32(_canonical_str(v).encode("utf-8")) % self.param
        if self.name == "truncate":
            if isinstance(v, str):
                return v[: self.param]
            return v - (v % self.param)
        if self.name == "year":
            return _as_dt(v).year
        if self.name == "month":
            d = _as_dt(v)
            return d.year * 100 + d.month
        if self.name == "day":
            d = _as_dt(v)
            return d.year * 10000 + d.month * 100 + d.day
        if self.name == "hour":
            d = _as_dt(v)
            return (d.year * 10000 + d.month * 100 + d.day) * 100 + d.hour
        raise ValueError(self.name)

    # -- pruning: project a source-column predicate onto partition space --
    def project(self, pred: E.Expr) -> E.Expr:
        """Inclusive projection: an expression over the partition value
        that is implied by ``pred`` (may be weaker; never prunes a file
        that could match).  Mirrors Iceberg's inclusive projections."""
        pn = self.partition_name
        if isinstance(pred, E.And):
            return E.and_(self.project(pred.left), self.project(pred.right))
        if isinstance(pred, E.Or):
            return E.or_(self.project(pred.left), self.project(pred.right))
        if isinstance(pred, E.Predicate) and pred.col == self.source:
            return self._project_predicate(pred)
        if isinstance(pred, E.InPredicate) and pred.col == self.source and not pred.negated:
            return E.in_(pn, [self.apply(v) for v in pred.values])
        return E.always_true()

    def _project_predicate(self, pred: E.Predicate) -> E.Expr:
        pn = self.partition_name
        op, v = pred.op, pred.value
        if op == "is_null":
            return E.is_null(pn)
        if op == "not_null":
            return E.not_null(pn)
        if op in ("is_nan", "not_nan"):
            return E.always_true()
        if self.name == "identity":
            return E.Predicate(op, pn, v)
        if self.name == "bucket":
            return E.col_eq(pn, self.apply(v)) if op == "eq" else E.always_true()
        # order-preserving transforms (truncate/year/month/day/hour):
        tv = self.apply(v)
        if op == "eq":
            return E.col_eq(pn, tv)
        if op in ("lt", "le"):
            return E.le(pn, tv)
        if op in ("gt", "ge"):
            return E.ge(pn, tv)
        return E.always_true()  # ne gives no partition-level pruning


def _canonical_str(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def _as_dt(v: Any) -> dt.datetime | dt.date:
    if isinstance(v, (dt.datetime, dt.date)):
        return v
    if isinstance(v, str):
        try:
            return dt.datetime.fromisoformat(v)
        except ValueError:
            return dt.date.fromisoformat(v)
    raise TypeError(f"not a date/timestamp: {v!r}")


_SPEC_RE = re.compile(
    r"^\s*(?:(identity|year|month|day|hour)\s*\(\s*(\w+)\s*\)"
    r"|(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)"
    r"|(\w+))\s*$"
)


def parse_spec(spec: str) -> Transform:
    """Parse one partition-spec term: ``col``, ``identity(col)``,
    ``bucket(16, col)``, ``truncate(3, col)``, ``year(col)``, …
    (Spark-DDL style, SURVEY.md §1.2)."""
    m = _SPEC_RE.match(spec)
    if not m:
        raise ValueError(f"bad partition spec term: {spec!r}")
    if m.group(1):
        return Transform(m.group(1), m.group(2))
    if m.group(3):
        return Transform(m.group(3), m.group(5), int(m.group(4)))
    return Transform("identity", m.group(6))


def spark_partition_column(t: Transform, dtype: str) -> Column:
    """Dtype-aware Spark face (use this on the write path)."""
    return t.column(dtype)
