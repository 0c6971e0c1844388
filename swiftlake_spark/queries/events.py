"""Event-table query surface: batch windowing, sessionization, JSON props.

The reference has no streaming (SURVEY.md §2.B last row); events are
exercised with batch window/sessionization queries only, exactly as a
100 TB event table would be rolled up in a scheduled batch job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from swiftlake_spark.queries import query
from swiftlake_spark.queries.base import as_double, dec, load


# --------------------------------------------------------------------------
# q30 — tumbling-window rollup: 5-minute buckets per event type.  At scale
# this is a single shuffle on (bucket, type) with map-side partial aggs.
# --------------------------------------------------------------------------
@query(
    "q30_tumbling_window",
    oracle="""
SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 300) * 300) AS TIMESTAMP) AS bucket_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY bucket_start, event_type
""",
)
def q30_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(F.floor(F.unix_timestamp("ts") / 300) * 300)
    return (
        e.groupBy(bucket.alias("bucket_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            as_double(F.sum(dec("value", 28, 6))).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("bucket_start", "event_type")
    )


# --------------------------------------------------------------------------
# q31 — sessionization: gap > 30 min starts a new session; per-session
# stats.  Window lag + conditional cumsum — the classic batch pattern;
# partitions by user so it scales with user cardinality.
# --------------------------------------------------------------------------
@query(
    "q31_sessionization",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS INTEGER) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts)  AS session_start,
       MAX(ts)  AS session_end,
       (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_sec
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def q31_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # gap compare at microsecond precision (matches the oracle's
    # INTERVAL comparison exactly; whole-second diffs would misplace
    # boundaries when a gap is 1800.x s)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) > 1_800_000_000)
    ).cast("int")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = e.withColumn("new_session", new_session).withColumn(
        "session_id", F.sum("new_session").over(run).cast("int")
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000
            )
            .cast("bigint")
            .alias("duration_sec"),
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# q32 — JSON property extraction from the props column.
# --------------------------------------------------------------------------
@query(
    "q32_json_props",
    oracle="""
SELECT event_type,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
FROM events
GROUP BY 1, 2
ORDER BY event_type, k_mod NULLS FIRST
""",
)
def q32_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14 (guide §1.2 per-task work): parse the JSON ONCE in a projection
    # below the aggregate — referencing get_json_object both in the group
    # key and in SUM made every row pay two full JSON parses (no CSE
    # across grouping/aggregate expression lists).
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("__k"))
        .groupBy("event_type", (F.col("__k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__k").cast("bigint").alias("k_sum"),
        )
        .orderBy("event_type", F.col("k_mod").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# q132 — funnel analysis: view → click → purchase in strict timestamp
# order per user.  Each step is a MIN-after-previous-step aggregate —
# one shuffle per step on user_id, no per-user event sorting and no
# window over the full event stream; step tables shrink monotonically,
# so at 100 TB the later joins are cheap.
# --------------------------------------------------------------------------
@query(
    "q132_funnel",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
), counts AS (
  SELECT 1 AS step, 'view' AS step_name, COUNT(*) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click', COUNT(*) FROM s2
  UNION ALL
  SELECT 3, 'purchase', COUNT(*) FROM s3
)
SELECT step, step_name, n_users,
       CAST(n_users AS DOUBLE)
         / (SELECT COUNT(*) FROM s1) AS frac_of_entry
FROM counts ORDER BY step
""",
)
def q132_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")

    def step(
        prev: DataFrame | None, prev_col: str | None, etype: str, tcol: str
    ) -> DataFrame:
        ev = e.filter(F.col("event_type") == etype)
        if prev is not None:
            ev = ev.join(prev, "user_id").filter(F.col("ts") > F.col(prev_col))
        return ev.groupBy("user_id").agg(F.min("ts").alias(tcol))

    s1 = step(None, None, "view", "t1")
    s2 = step(s1, "t1", "click", "t2")
    s3 = step(s2, "t2", "purchase", "t3")
    rows = [
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(1).alias("step"), F.lit("view").alias("step_name"), "n_users"
        ),
        s2.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(2).alias("step"), F.lit("click").alias("step_name"), "n_users"
        ),
        s3.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(3).alias("step"), F.lit("purchase").alias("step_name"), "n_users"
        ),
    ]
    counts = rows[0].unionAll(rows[1]).unionAll(rows[2])
    # the entry denominator is counts' own step-1 row — a window over the
    # tiny 3-row result, not a second aggregation of the events table
    wall = W.orderBy("step").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    entry_n = F.first("n_users").over(wall)
    return (
        counts.select(
            "step",
            "step_name",
            "n_users",
            (F.col("n_users").cast("double") / entry_n).alias("frac_of_entry"),
        )
        .orderBy("step")
    )


# --------------------------------------------------------------------------
# q133 — retention cohorts: users grouped by first-seen day, activity
# counted at day offsets.  Two shuffles (first-seen per user, then the
# cohort×offset rollup) — the classic batch retention matrix.
# --------------------------------------------------------------------------
@query(
    "q133_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events
  GROUP BY user_id
)
SELECT f.cohort_day,
       CAST(DATEDIFF('day', f.cohort_day, CAST(e.ts AS DATE)) AS INT) AS day_offset,
       COUNT(DISTINCT e.user_id) AS active_users
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY 1, 2
ORDER BY cohort_day, day_offset
""",
)
def q133_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    return (
        e.join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


# --------------------------------------------------------------------------
# q134 — hopping (sliding) window rollup: 10-minute windows every 5
# minutes — each event lands in exactly 2 windows (explode over hop
# indexes, NOT a self-join).  Complements q30's tumbling windows; the
# explode is map-side and the rollup is one shuffle on (window, type).
# --------------------------------------------------------------------------
@query(
    "q134_hopping_window",
    oracle="""
WITH hops AS (
  SELECT e.event_type, e.value,
         CAST(TO_TIMESTAMP((FLOOR(EPOCH(e.ts) / 300) - h.i) * 300) AS TIMESTAMP)
           AS win_start
  FROM events e, UNNEST(generate_series(0, 1)) AS h(i)
)
SELECT win_start, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM hops GROUP BY 1, 2
ORDER BY win_start, event_type
LIMIT 200
""",
)
def q134_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    base = F.floor(F.unix_timestamp("ts") / 300)
    hopped = e.select(
        "event_type",
        "value",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("i"),
        base.alias("__b"),
    ).select(
        "event_type",
        "value",
        F.timestamp_seconds((F.col("__b") - F.col("i")) * 300).alias("win_start"),
    )
    return (
        hopped.groupBy("win_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            as_double(F.sum(dec("value", 28, 6))).alias("total_value"),
        )
        .orderBy("win_start", "event_type")
        .limit(200)
    )


# --------------------------------------------------------------------------
# q135 — per-type z-score anomalies: mean/std from exact decimal sums,
# sqrt is IEEE-correctly-rounded (portable, unlike libm
# transcendentals), top-25 |z|.  One stats shuffle + broadcast-back.
# DECIMAL(15,2): the fixture values carry 2 decimals, and the exact
# sums must stay within ~15 significant digits — decimal→double
# conversion of wider exact sums rounds DIFFERENTLY across engines
# (measured: 20-digit sum-of-squares diverged by 1 ulp), which is the
# FIXTURES.md §4 envelope rule.
# --------------------------------------------------------------------------
@query(
    "q135_anomaly_zscore",
    oracle="""
WITH stats AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value AS DECIMAL(15,2)) * CAST(value AS DECIMAL(15,2)))
              AS DOUBLE) AS sq
  FROM events GROUP BY event_type
), m AS (
  -- GREATEST(.., 0): the naive-variance cancellation can land a few
  -- ulps below zero on a constant-valued type, where DuckDB's SQRT
  -- hard-errors (Spark returns NaN) — clamp identically on both sides
  SELECT event_type, s / n AS mean,
         SQRT(GREATEST(sq / n - (s / n) * (s / n), CAST(0.0 AS DOUBLE))) AS std
  FROM stats
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - m.mean) / m.std AS z
FROM events e JOIN m ON e.event_type = m.event_type
ORDER BY ABS((e.value - m.mean) / m.std) DESC, e.event_id
LIMIT 25
""",
)
def q135_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = dec("value", 15, 2)
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        as_double(F.sum(v)).alias("s"),
        as_double(F.sum(v * v)).alias("sq"),
    )
    m = stats.select(
        "event_type",
        (F.col("s") / F.col("n")).alias("mean"),
        F.sqrt(
            F.greatest(
                F.col("sq") / F.col("n")
                - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")),
                F.lit(0.0),
            )
        ).alias("std"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        e.join(F.broadcast(m), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .orderBy(F.abs(F.col("z")).desc(), "event_id")
        .limit(25)
    )


# --------------------------------------------------------------------------
# q136 — event-type transition matrix (Markov counts): per user, each
# consecutive event pair by timestamp contributes one (from, to) count.
# One window sort per user + one rollup shuffle; at scale parallelism =
# user cardinality (never a global event ordering).
# --------------------------------------------------------------------------
@query(
    "q136_event_transitions",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       COUNT(*) AS n,
       CAST(COUNT(*) AS DOUBLE)
         / SUM(COUNT(*)) OVER (PARTITION BY event_type) AS frac
FROM ordered
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY from_type, to_type
""",
)
def q136_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = pairs.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    total = W.partitionBy("from_type")
    return (
        counts.select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.sum("n").over(total)).alias("frac"),
        )
        .orderBy("from_type", "to_type")
    )
