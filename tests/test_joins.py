"""Join-operator tests: as-of semantics (+tolerance), range-join
equivalence vs the naive plan, salted-join equivalence vs a plain join."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_asof_join_backward_and_tolerance(spark):
    from swiftlake_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [
            (1, 10, dt.datetime(2024, 1, 1, 0, 10)),
            (2, 10, dt.datetime(2024, 1, 1, 0, 30)),
            (3, 10, dt.datetime(2024, 1, 1, 0, 5)),   # before any right row
            (4, 11, dt.datetime(2024, 1, 1, 1, 0)),
        ],
        "id BIGINT, k BIGINT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (10, dt.datetime(2024, 1, 1, 0, 8), 100.0),
            (10, dt.datetime(2024, 1, 1, 0, 25), 200.0),
            (11, dt.datetime(2024, 1, 1, 0, 59), 300.0),
        ],
        "k BIGINT, ts TIMESTAMP, px DOUBLE",
    )
    out = {
        r["id"]: r["right_px"]
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["px"]
        ).collect()
    }
    assert out == {1: 100.0, 2: 200.0, 3: None, 4: 300.0}

    # with a 2-minute tolerance, id=1 (gap 2min) keeps, id=2 (gap 5min) drops
    out_tol = {
        r["id"]: r["right_px"]
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_cols=["px"], tolerance_ms=2 * 60 * 1000,
        ).collect()
    }
    assert out_tol == {1: 100.0, 2: None, 3: None, 4: 300.0}


def test_asof_join_equal_ts_matches(spark):
    from swiftlake_spark.operators.joins import asof_join

    t = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, 5, t)], "id BIGINT, k BIGINT, ts TIMESTAMP")
    right = spark.createDataFrame([(5, t, 7.0)], "k BIGINT, ts TIMESTAMP, px DOUBLE")
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["px"]
    ).collect()
    assert out[0]["right_px"] == 7.0  # "at or before" includes equal ts


def test_range_join_equivalent_to_naive(spark):
    from swiftlake_spark.operators.joins import range_join

    import random

    random.seed(7)
    l = spark.createDataFrame(
        [(i, random.uniform(0, 100)) for i in range(200)], "lid BIGINT, lv DOUBLE"
    )
    r = spark.createDataFrame(
        [(i, random.uniform(0, 100)) for i in range(200)], "rid BIGINT, rv DOUBLE"
    )
    fast = {
        (x["lid"], x["rid"])
        for x in range_join(l, r, left_val="lv", right_val="rv", width=1.5).collect()
    }
    naive = {
        (x["lid"], x["rid"])
        for x in l.crossJoin(r)
        .filter(F.abs(F.col("lv") - F.col("rv")) <= 1.5)
        .collect()
    }
    assert fast == naive and len(fast) > 0


def test_salted_join_equivalent_to_plain(spark):
    from swiftlake_spark.operators.joins import salted_join

    # skewed left: one hot key
    l = spark.createDataFrame(
        [(i, i % 7 if i % 3 else 0) for i in range(500)], "id BIGINT, k BIGINT"
    )
    r = spark.createDataFrame([(k, f"v{k}") for k in range(7)], "k BIGINT, v STRING")
    fast = sorted(
        (x["id"], x["v"]) for x in salted_join(l, r, on="k", salt=4).collect()
    )
    plain = sorted((x["id"], x["v"]) for x in l.join(r, "k").collect())
    assert fast == plain
