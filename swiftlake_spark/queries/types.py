"""UUID and TIME type-mapping queries (SURVEY.md §1.2, §7 hard parts).

Spark has neither a UUID nor a TIME type; the reference maps UUID to its
canonical string form (sql/SchemaEvolution.java:484) and TIME to
micros-since-midnight (sql/SchemaEvolution.java:478).  These queries
derive deterministic UUID/TIME values from the fixture tables and prove
the mappings against DuckDB's NATIVE types: the oracle casts through
``UUID`` and ``TIME`` and back, so a hash match certifies our canonical
forms equal DuckDB's own rendering of the real types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftlake_spark.functions import (
    micros_to_time_string,
    time_of_day_micros,
    uuid_from_hex,
)
from swiftlake_spark.queries import query
from swiftlake_spark.queries.base import load


# --------------------------------------------------------------------------
# q84 — UUID mapping.  Deterministic v-less UUIDs built from md5(custkey);
# the oracle round-trips them through DuckDB's native UUID type
# (CAST(s AS UUID) then back to VARCHAR = canonical rendering), so the
# match proves our string form IS the canonical one.  Map-only + one
# top-k: no shuffle beyond the global sort.
# --------------------------------------------------------------------------
@query(
    "q84_uuid_type",
    oracle="""
SELECT c_custkey,
       CAST(CAST(uuid_str AS UUID) AS VARCHAR) AS cust_uuid,
       substring(uuid_str, 1, 2) AS uuid_prefix
FROM (
  SELECT c_custkey,
         substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8) || '-' ||
         substring(md5(CAST(c_custkey AS VARCHAR)), 9, 4) || '-' ||
         substring(md5(CAST(c_custkey AS VARCHAR)), 13, 4) || '-' ||
         substring(md5(CAST(c_custkey AS VARCHAR)), 17, 4) || '-' ||
         substring(md5(CAST(c_custkey AS VARCHAR)), 21, 12) AS uuid_str
  FROM customer
)
WHERE uuid_str < '20000000-0000-0000-0000-000000000000'
ORDER BY cust_uuid, c_custkey
""",
)
def q84_uuid_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    u = uuid_from_hex(F.md5(F.col("c_custkey").cast("string")))
    return (
        c.select("c_custkey", u.alias("cust_uuid"))
        .filter(F.col("cust_uuid") < "20000000-0000-0000-0000-000000000000")
        .select(
            "c_custkey",
            "cust_uuid",
            F.substring("cust_uuid", 1, 2).alias("uuid_prefix"),
        )
        .orderBy("cust_uuid", "c_custkey")
    )


# --------------------------------------------------------------------------
# q85 — TIME mapping.  Fixture timestamps are all midnight, so a varied
# time-of-day is derived deterministically (orderkey-seconds +
# orderkey²-micros added to the date).  The oracle computes the SAME
# values from DuckDB's native TIME type (CAST(ts AS TIME), datediff from
# midnight) and both sides render the canonical HH:MM:SS.ffffff literal,
# so the hash match certifies micros-since-midnight == native TIME.
# Aggregation groups by hour — one shuffle on a 24-value key.
# --------------------------------------------------------------------------
_T = "(o_orderdate + to_seconds(o_orderkey % 86400) + to_microseconds((o_orderkey * o_orderkey) % 1000000))"

@query(
    "q85_time_type",
    oracle=f"""
SELECT CAST(EXTRACT(hour FROM CAST({_T} AS TIME)) AS INTEGER) AS hh,
       COUNT(*) AS n_orders,
       MIN(datediff('microsecond', TIME '00:00:00', CAST({_T} AS TIME))) AS min_micros,
       MAX(datediff('microsecond', TIME '00:00:00', CAST({_T} AS TIME))) AS max_micros,
       printf('%02d:%02d:%02d.%06d',
              MIN(datediff('microsecond', TIME '00:00:00', CAST({_T} AS TIME))) // 3600000000,
              (MIN(datediff('microsecond', TIME '00:00:00', CAST({_T} AS TIME))) // 60000000) % 60,
              (MIN(datediff('microsecond', TIME '00:00:00', CAST({_T} AS TIME))) // 1000000) % 60,
              MIN(datediff('microsecond', TIME '00:00:00', CAST({_T} AS TIME))) % 1000000) AS min_time_str
FROM orders
GROUP BY hh
ORDER BY hh
""",
)
def q85_time_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    ts = F.timestamp_add(
        "MICROSECOND",
        (F.col("o_orderkey") * F.col("o_orderkey")) % 1_000_000,
        F.timestamp_add("SECOND", F.col("o_orderkey") % 86_400, F.col("o_orderdate")),
    )
    micros = time_of_day_micros(ts)
    return (
        o.select(
            (micros / 3_600_000_000).cast("bigint").cast("int").alias("hh"),
            micros.alias("__m"),
        )
        .groupBy("hh")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("__m").alias("min_micros"),
            F.max("__m").alias("max_micros"),
            micros_to_time_string(F.min("__m")).alias("min_time_str"),
        )
        .orderBy("hh")
    )
