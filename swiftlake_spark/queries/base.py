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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided parquet table.

    A plain parquet scan: Catalyst pushes filters and prunes columns into
    the file scan (verify with ``.explain`` → PushedFilters/ReadSchema).
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    if name == "events":
        # events.parquet stores INT64 TIMESTAMP(NANOS) which the Spark
        # vectorized reader rejects; read nanos as long and truncate to
        # micros (integer division — matches DuckDB's ns→µs truncation).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
