"""Deterministic sampling and dataset splitting.

Training pipelines need samples and train/eval splits that are
REPRODUCIBLE across runs, engines, and data relayouts — so nothing here
uses ``rand()``: membership is a pure function of the row's key.

- :func:`hash_sample`      — keep ~fraction of rows by key-hash bucket.
- :func:`hash_split`       — disjoint named splits (train/val/test) with
  given weights; every key lands in exactly one split, stable forever.
- :func:`stratified_limit` — at most n rows per group (window row_number
  by hashed order — deterministic "random" within the group).

The md5 variants are portable to the SQL oracle; the xxhash64 fast path
is the default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _bucket(key: Column, salt: str, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(salt), key), F.lit(_BUCKETS))
    # portable: first 8 hex chars of md5 → int.  NULL keys hash a
    # sentinel instead of propagating — a NULL bucket would silently
    # DROP every NULL-key row from hash_sample and pin them to the last
    # split in hash_split, diverging from the xxhash64 path (which
    # hashes NULL deterministically); the sentinel keeps both paths
    # deterministic-per-key on NULLs and portable to a SQL oracle
    # (coalesce(k, '\x00NULL') spells the same there)
    k = F.coalesce(key.cast("string"), F.lit("\x00NULL"))
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), k)), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(_BUCKETS),
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    *,
    salt: str = "sample",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic ~fraction sample keyed on ``key_col``: the same keys
    are selected on every run and on every engine with the same hash."""
    return df.filter(
        _bucket(F.col(key_col), salt, hash_fn) < int(fraction * _BUCKETS)
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    *,
    salt: str = "split",
    hash_fn: str = "xxhash64",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split with ~weight
    proportions.  Keys are stable: re-running never moves a key between
    train and test (the property that keeps eval sets uncontaminated)."""
    total = sum(weights.values())
    b = _bucket(F.col(key_col), salt, hash_fn)
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = b < int(acc * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_limit(
    df: DataFrame,
    group_col: str,
    n: int,
    *,
    key_col: str,
    salt: str = "strat",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """At most ``n`` rows per group, chosen by deterministic hashed order
    (a reproducible per-group subsample)."""
    order = _bucket(F.col(key_col), salt, hash_fn)
    w = W.partitionBy(group_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
