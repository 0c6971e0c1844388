"""Shared helpers for the declared query surface."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# DataFrame handles are immutable plans over immutable files, so the
# read (which does a parquet footer/schema inference round-trip) can be
# memoized per (session, dir, table).  Saves ~0.1-0.3 s per query of
# fixed latency in the bench harness; on a cluster it also avoids
# re-listing object-store metadata per query.
_LOAD_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided parquet table.

    A plain parquet scan: Catalyst pushes filters and prunes columns into
    the file scan (verify with ``.explain`` → PushedFilters/ReadSchema).
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    # applicationId, not id(): CPython reuses object addresses after GC,
    # so a fresh session could hit a dead session's cached DataFrames
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _LOAD_CACHE:
        return _LOAD_CACHE[key]
    if name == "events":
        # NOTE: the nanosAsLong flag stays set on the session afterwards —
        # it must hold at SCAN time for the lazy plan, so a set/restore
        # scope would break execution.  Side effect: later reads of OTHER
        # nanos-timestamp parquet return bigint instead of erroring
        # (micros files are unaffected).
        # events.parquet has varied across fixture generations: INT64
        # TIMESTAMP(NANOS) (which the Spark vectorized reader rejects —
        # read nanos as long, truncate to micros like DuckDB's ns→µs) or
        # plain TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ — normalize to
        # TIMESTAMP; session zone is pinned UTC so values are unchanged).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(raw.dtypes)["ts"] == "bigint":
            df = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            df = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _LOAD_CACHE[key] = df
    return df


# r15: spread() moved to the operator layer (operators/parallelism.py)
# so operators themselves can use it; re-exported here for the query
# call sites (q45's langid chain, the banded-signature build).
from swiftlake_spark.operators.parallelism import spread  # noqa: E402,F401


def dec(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    """Cast to DECIMAL for exact, order-independent aggregation.

    Summing doubles directly is order-dependent (shuffle order varies run
    to run and engine to engine); routing through DECIMAL makes the
    aggregate exact so the oracle hash-matches.  Cast back to double at
    the end with :func:`as_double`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def as_double(c: Column) -> Column:
    return c.cast("double")
