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
construction.  ``mbucket`` is the Iceberg-parity alternative: murmur3
x86_32 (public domain, Austin Appleby) over the Iceberg single-value
serialization (ints/dates/timestamps as 8-byte little-endian longs,
strings as UTF-8 bytes; Iceberg spec "Appendix B: 32-bit Hash
Requirements"), bucket = (hash & Int.MAX) % N — so a partition layout
produced here matches what an Iceberg writer would produce for the same
spec.  The Spark face is pure Column arithmetic (16-bit split multiplies,
no 64-bit overflow, ANSI-safe) inside whole-stage codegen; the Python
face is the same algorithm on ints.  CRC32 stays the default.
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


# ---------------------------------------------------------------- murmur3
# murmur3 x86_32 — public-domain algorithm; both faces below implement it
# identically (pytest cross-checks them and pins the Iceberg spec vectors).

_M32 = 0xFFFFFFFF
_C1, _C2 = 0xCC9E2D51, 0x1B873593


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Python face: murmur3 x86_32 of ``data``, unsigned 32-bit result."""
    h = seed
    n = len(data)
    for i in range(0, n - n % 4, 4):
        k = int.from_bytes(data[i: i + 4], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[n - n % 4:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def _mm3_serialize(v: Any) -> bytes:
    """Iceberg single-value hash serialization (spec Appendix B)."""
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, dt.datetime):
        epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        micros = (v - epoch) // dt.timedelta(microseconds=1)
        return (micros & (2**64 - 1)).to_bytes(8, "little")
    if isinstance(v, dt.date):
        days = (v - dt.date(1970, 1, 1)).days
        return (days & (2**64 - 1)).to_bytes(8, "little")
    if isinstance(v, int):  # int and long both hash as 8-byte LE long
        return (v & (2**64 - 1)).to_bytes(8, "little")
    raise TypeError(f"mbucket does not support values of type {type(v).__name__}")


# Spark face: masked bigint arithmetic.  Multiplies split 16/16 so no
# intermediate exceeds 2^49 — safe under spark.sql.ansi.enabled=true.
#
# Every step that reads its input more than once goes through ``_let``,
# which binds the input as a higher-order-function lambda variable.
# Without it the expression TREE doubles at each `h ⊕ f(h)` step (the
# serialized plan grows exponentially — observed 11 MiB task binaries
# and executor OOM); with it the plan is linear in the number of steps
# and codegen sees one shared slot per intermediate.

def _let(val: Column, f) -> Column:
    """Poor-man's LET: bind ``val`` once, reference it many times."""
    return F.aggregate(F.array(val), F.lit(0).cast("bigint"), lambda _acc, v: f(v))


def _sk32(c: Column) -> Column:
    return c.bitwiseAND(F.lit(_M32))


def _smul32(c: Column, const: int) -> Column:
    return _let(
        c,
        lambda v: _sk32(
            F.shiftleft(
                (F.shiftrightunsigned(v, 16) * F.lit(const)).bitwiseAND(F.lit(0xFFFF)), 16
            )
            + v.bitwiseAND(F.lit(0xFFFF)) * F.lit(const)
        ),
    )


def _srotl(c: Column, r: int) -> Column:
    return _let(
        c, lambda v: _sk32(F.shiftleft(v, r).bitwiseOR(F.shiftrightunsigned(v, 32 - r)))
    )


def _smixk(k: Column) -> Column:
    return _smul32(_srotl(_smul32(k, _C1), 15), _C2)


def _smixh(h: Column, k: Column) -> Column:
    x = _srotl(h.bitwiseXOR(_smixk(k)), 13)
    return _sk32(x * F.lit(5) + F.lit(0xE6546B64))


def _sfmix(h: Column, n: Column) -> Column:
    h = h.bitwiseXOR(_sk32(n))
    h = _let(h, lambda v: v.bitwiseXOR(F.shiftrightunsigned(v, 16)))
    h = _smul32(h, 0x85EBCA6B)
    h = _let(h, lambda v: v.bitwiseXOR(F.shiftrightunsigned(v, 13)))
    h = _smul32(h, 0xC2B2AE35)
    return _let(h, lambda v: v.bitwiseXOR(F.shiftrightunsigned(v, 16)))


def _mm3_long_col(v: Column) -> Column:
    """murmur3 of an 8-byte little-endian long (unsigned 32-bit result)."""
    return _let(
        v.cast("bigint"),
        lambda x: _sfmix(
            _smixh(
                _smixh(F.lit(0).cast("bigint"), x.bitwiseAND(F.lit(_M32))),  # low 4 LE bytes
                F.shiftrightunsigned(x, 32),  # high 4 LE bytes
            ),
            F.lit(8).cast("bigint"),
        ),
    )


def _mm3_string_col(c: Column) -> Column:
    """murmur3 of a string's UTF-8 bytes.  Bytes are addressed through
    the hex encoding (2 chars/byte, substring + conv are codegen'd);
    the block loop is ``F.aggregate`` over a 0..nblocks-1 sequence —
    all JVM-side, no Python."""
    b = F.encode(c, "UTF-8")
    hx = F.hex(b)
    n = F.octet_length(b).cast("bigint")
    nblocks = F.floor(n / F.lit(4)).cast("bigint")
    rem = n % F.lit(4)

    def block_k(i: Column) -> Column:
        p = i * F.lit(8)
        pair = lambda j: F.substring(hx, (p + F.lit(2 * j + 1)).cast("int"), 2)  # noqa: E731
        return F.conv(F.concat(pair(3), pair(2), pair(1), pair(0)), 16, 10).cast("bigint")

    blocks = F.when(nblocks > 0, F.sequence(F.lit(0).cast("bigint"), nblocks - 1)).otherwise(
        F.array().cast("array<bigint>")
    )
    h = F.aggregate(blocks, F.lit(0).cast("bigint"), lambda acc, i: _smixh(acc, block_k(i)))
    tpair = lambda j: F.substring(hx, (nblocks * 8 + F.lit(2 * j + 1)).cast("int"), 2)  # noqa: E731
    tail_hex = (
        F.when(rem == 1, tpair(0))
        .when(rem == 2, F.concat(tpair(1), tpair(0)))
        .otherwise(F.concat(tpair(2), tpair(1), tpair(0)))
    )
    tail_k = F.conv(tail_hex, 16, 10).cast("bigint")
    h = _let(h, lambda v: F.when(rem > 0, v.bitwiseXOR(_smixk(tail_k))).otherwise(v))
    return _sfmix(h, n)


@dataclass(frozen=True)
class Transform:
    name: str  # identity | bucket | mbucket | truncate | year | month | day | hour
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
        if self.name == "mbucket":
            if dtype == "string":
                h = _mm3_string_col(c)
            elif dtype == "date":
                h = _mm3_long_col(F.datediff(c, F.to_date(F.lit("1970-01-01"))))
            elif dtype and dtype.startswith("timestamp"):
                h = _mm3_long_col(F.unix_micros(c))
            elif dtype in ("tinyint", "smallint", "int", "bigint", None):
                h = _mm3_long_col(c)
            else:
                raise ValueError(f"mbucket does not support dtype {dtype!r}")
            return (h.bitwiseAND(F.lit(0x7FFFFFFF)) % F.lit(self.param)).cast("int")
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
        if self.name == "mbucket":
            return (murmur3_32(_mm3_serialize(v)) & 0x7FFFFFFF) % self.param
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
        if self.name in ("bucket", "mbucket"):
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
    r"|(bucket|mbucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)"
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


# ------------------------- partition path value encoding (string results)
# ≙ reference writer/PartitionedDataFileWriter.java:67-70,683-702:
# '#' escape prefix, '#n' = NULL, values whose URL-encoded length exceeds
# 150 are replaced by an indirection token.  Deviations (documented):
# - the reference mints '#u' + random UUID with a driver-side lookup map;
#   here the token is '#u' + the FULL 64-hex sha256 of the escaped value —
#   deterministic, so executors compute it with no coordination and
#   retries/identical values map to the same directory.  The full digest
#   (not a truncated prefix) matters: partitionBy splits directories by
#   the TOKEN, so two long values colliding on it would be physically
#   merged into one directory — unrecoverable downstream.  256 bits makes
#   that cryptographically infeasible; 66 path chars stays well under the
#   150-char guard this token exists to enforce.
# - '#e' encodes the empty string, which Spark's hive-style partitionBy
#   would otherwise collapse into __HIVE_DEFAULT_PARTITION__ (i.e. NULL).
PARTITION_VALUE_MAX_LENGTH = 150
# 64-hex current form; 16-hex accepted for directories written by older
# versions of this writer.
_OPAQUE_RE = re.compile(r"^#u([0-9a-f]{64}|[0-9a-f]{16})$")
# The chars Spark's hive path escaping rewrites to %XX (ExternalCatalogUtils
# escape list: controls, DEL, and the reserved set).  The length guard must
# measure THIS escaping, not URLEncoder's — they disagree on '*' (hive
# escapes it, URLEncoder does not), and the guard exists to bound the
# physical directory-segment bytes, which hive escaping determines.
_HIVE_ESCAPED_RE = "[\\x00-\\x1f\\x7f\"#%'*/:=?\\\\{\\[\\]^]"


def _hive_escaped_len(c: Column) -> Column:
    """Byte length of the hive-escaped form: each escaped ASCII char
    becomes %XX (3 bytes); everything else keeps its UTF-8 bytes."""
    return F.octet_length(F.regexp_replace(c, _HIVE_ESCAPED_RE, "xxx"))


def hive_escaped_len_py(v: str) -> int:
    """Python face of :func:`_hive_escaped_len` (tests cross-check; the
    char-class pattern parses identically in Java and Python regex)."""
    return len(re.sub(_HIVE_ESCAPED_RE, "xxx", v).encode("utf-8"))


def encode_partition_path_col(c: Column) -> Column:
    """Column expression form of the encoder, applied to string-typed
    physical partition columns just before ``partitionBy``."""
    esc = F.when(
        c.startswith("#")
        | (F.lower(c) == F.lit("null"))
        # Spark's own NULL sentinel must not collide with a real value
        | (c == F.lit("__HIVE_DEFAULT_PARTITION__")),
        F.concat(F.lit("#"), c),
    ).otherwise(c)
    return (
        F.when(c.isNull(), F.lit("#n"))
        .when(c == F.lit(""), F.lit("#e"))
        .when(
            _hive_escaped_len(esc) > PARTITION_VALUE_MAX_LENGTH,
            F.concat(F.lit("#u"), F.sha2(esc, 256)),
        )
        .otherwise(esc)
    )


def decode_partition_path_value(v: str):
    """Inverse of :func:`encode_partition_path_col` for manifest
    harvesting.  Opaque ``#u`` tokens are kept verbatim (the value is not
    recoverable from the path; pruning treats them as no-information —
    see ``ManifestEntry.stats_view``).  Unescaped values never start with
    ``#``, so a leading ``#u`` at decode time is always a token."""
    if v == "#n":
        return None
    if v == "#e":
        return ""
    if v.startswith("##"):
        return v[1:]
    if v.startswith("#u"):
        return v  # opaque indirection token
    if v.startswith("#"):
        return v[1:]  # '#null' and friends
    return v


def is_opaque_pvalue(v) -> bool:
    return isinstance(v, str) and bool(_OPAQUE_RE.match(v))
