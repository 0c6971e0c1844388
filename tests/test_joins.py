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


def test_asof_join_null_in_latest_right_row(spark):
    """The matched right row must be carried WHOLE: a legitimate NULL in
    the latest right row must not be back-filled from an older row."""
    from swiftlake_spark.operators.joins import asof_join
    import datetime as dt

    right = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1, 0, 0, 1), 5.0, 10.0),
         ("k", dt.datetime(2024, 1, 1, 0, 0, 2), None, 20.0)],
        "k STRING, ts TIMESTAMP, a DOUBLE, b DOUBLE",
    )
    left = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1, 0, 0, 3))], "k STRING, ts TIMESTAMP"
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["a", "b"],
    ).collect()[0]
    assert out["right_a"] is None and out["right_b"] == 20.0


def test_salted_join_refuses_right_full(spark):
    from swiftlake_spark.operators.joins import salted_join
    import pytest

    l = spark.createDataFrame([(1, "x")], "id BIGINT, v STRING")
    r = spark.createDataFrame([(2, "y")], "id BIGINT, w STRING")
    for how in ("right", "full"):
        with pytest.raises(ValueError):
            salted_join(l, r, on="id", how=how)


def test_shingles_short_documents(spark):
    """Documents shorter than k words yield no shingles (sequence(0,-1)
    is [0,-1] in Spark — the guarded path must not index past the
    array or emit partial shingles)."""
    from swiftlake_spark.operators.dedup import shingles

    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "a b c d")], "doc_id BIGINT, text STRING"
    )
    got = sorted(
        (r["id"], r["sh"]) for r in shingles(df, "doc_id", "text", k=3).collect()
    )
    assert got == [(3, "a b c"), (3, "b c d")]


def test_fingerprint_with_id_named_id(spark):
    from swiftlake_spark.operators.text import fingerprint

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "id BIGINT, text STRING"
    )
    out = fingerprint(df, "id").collect()[0]
    assert out["min_shingle_hash"] is not None


def test_cosine_topk_string_query_ids(spark):
    from swiftlake_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    q = spark.createDataFrame(
        [("q-001", [1.0, 0.0])], "query_id STRING, q_emb ARRAY<DOUBLE>"
    )
    out = cosine_topk(emb, q, k=1).collect()
    assert out[0]["query_id"] == "q-001" and out[0]["cand_id"] == 1
