"""Join operators Spark lacks as primitives: as-of, range, salted-skew.

- :func:`asof_join` — for each left row, the latest right row at or
  before its timestamp (per key).  Implemented as union + window
  (last_value over the interleaved stream) — one shuffle on (key), no
  per-group Python, no O(n·m) explosion.  DuckDB's native ASOF JOIN is
  the oracle.
- :func:`range_join` — numeric band join |a-b| <= width via bucketed
  equi-join on floor(value/width) with neighbor buckets: shuffles keys,
  never builds the cross product.
- :func:`salted_join` — skew-buster: replicate the small side per salt,
  scatter the big side's hot keys across salts.  Same result as a plain
  join, bounded task sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Backward as-of join: attach the most recent ``right_cols`` whose
    ``right_ts`` <= ``left_ts`` per ``on`` key.

    Union both sides tagged, sort within key by (ts, side) with right
    rows first at equal ts, and carry the last seen right values forward
    with ``last(..., ignorenulls)``.  Equivalent to DuckDB
    ``ASOF JOIN … ON l.k = r.k AND l.ts >= r.ts``.
    """
    lcols = left.columns
    rtypes = dict(right.dtypes)
    # Carry the whole matched right row as ONE struct: carrying columns
    # independently with last(..., ignorenulls) would substitute an OLDER
    # row's value wherever the latest right row holds a legitimate NULL —
    # a frankenrow mixing two right rows.  A struct is non-null as a
    # whole for right rows and NULL for left filler rows, so ignorenulls
    # skips fillers while NULL fields inside the matched row survive.
    rrow_null = F.lit(None).cast(
        "struct<__mts:" + dict(right.dtypes)[right_ts] + ","
        + ",".join(f"`{c}`:{rtypes[c]}" for c in right_cols) + ">"
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        rrow_null.alias("__rrow"),
    )
    r = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) if c not in on else F.col(c) for c in lcols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__mts"),
            *[F.col(c) for c in right_cols],
        ).alias("__rrow"),
    )
    u = l.unionByName(r)
    # right rows sort before left rows at the same ts → "at or before"
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.select(
        *lcols,
        "__ts",
        "__side",
        F.last("__rrow", ignorenulls=True).over(w).alias("__crow"),
    ).filter(F.col("__side") == 1)
    match = F.col("__crow")
    if tolerance_ms is not None:
        in_tol = (
            match.isNotNull()
            & (
                (F.unix_micros(F.col("__ts")) - F.unix_micros(match["__mts"]))
                <= tolerance_ms * 1000
            )
        )
        match = F.when(in_tol, match)
    out = carried.select(
        *lcols, *[match[c].alias(f"right_{c}") for c in right_cols]
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_val: str,
    right_val: str,
    width: float,
) -> DataFrame:
    """All (left, right) pairs with |left_val - right_val| <= width.

    Scale path: bucket both sides by floor(val/width); a qualifying pair
    can only live in the same or adjacent buckets, so the big join is an
    equi-join on bucket id (3 copies of the left side), then the exact
    band filter.  Never a cross join.
    """
    lb = F.floor(F.col(left_val) / width).cast("bigint")
    rb = F.floor(F.col(right_val) / width).cast("bigint")
    l = left.withColumn(
        "__b", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r = right.withColumn("__b", rb)
    cond = (F.col("__b") == F.col("__rb")) & (
        F.abs(F.col(left_val) - F.col(right_val)) <= width
    )
    rr = r.withColumnRenamed("__b", "__rb")
    return l.join(rr, cond).drop("__b", "__rb")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with salting for skewed keys: the (big) left side gets a
    random-free deterministic salt from its row content, the (small)
    right side is replicated across all salts.  Result identical to a
    plain join for ``inner``/``left``; ``right``/``full`` are refused —
    the replicated right side would surface every unmatched right row
    once per salt (use AQE skew-join for those shapes)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', not {how!r}: the "
            "salt-replicated right side duplicates unmatched right rows"
        )
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    )
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, [on, "__salt"], how)
    return out.drop("__salt")
