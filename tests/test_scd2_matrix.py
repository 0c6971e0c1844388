"""SCD2 scenario matrix ported from the reference's parameterized sweep
(SCD2MergeBasicIntegrationTest.java:197-240: long-history-chain,
empty-source, all-inserts, unicode/special chars, extreme values —
the shapes not already covered by test_dml/test_nested_and_scd_matrix)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from swiftlake_spark.engine import SwiftLakeEngine
from swiftlake_spark.tables import E

DDL = (
    "id BIGINT, name STRING, amount DOUBLE, "
    "effective_start TIMESTAMP, effective_end TIMESTAMP, is_current BOOLEAN"
)
T = [dt.datetime(2024, m, 1) for m in range(1, 7)]


@pytest.fixture()
def engine(spark, tmp_path):
    return SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "wh"))


def snap_merge(engine, name, rows, ts, spark):
    src = spark.createDataFrame(rows, "id BIGINT, name STRING, amount DOUBLE")
    (
        engine.apply_snapshot_as_scd2(name)
        .table_filter(E.always_true())
        .source_dataframe(src)
        .key_columns(["id"])
        .current_flag_column("is_current")
        .effective_timestamp(ts)
        .execute()
    )


def dim_as_of(engine, name, ts):
    """Reconstruct the dimension state at ts from effective periods."""
    df = engine.catalog.load(name)
    return {
        r["id"]: (r["name"], r["amount"])
        for r in df.filter(
            (F.col("effective_start") <= F.lit(ts))
            & (F.col("effective_end").isNull() | (F.col("effective_end") > F.lit(ts)))
        ).collect()
    }


def test_long_history_chain_and_asof_reconstruction(engine, spark):
    """Five sequential snapshot merges; every intermediate state must be
    reconstructible from the effective periods (the actual SCD2 value
    proposition)."""
    name = "db.chain"
    engine.catalog.create_table(name, DDL)
    states = [
        [(1, "a1", 1.0), (2, "b1", 2.0)],
        [(1, "a2", 1.0), (2, "b1", 2.0)],                  # update 1
        [(1, "a2", 1.0)],                                   # delete 2
        [(1, "a3", 9.0), (3, "c1", 3.0)],                   # update 1, insert 3
        [(1, "a3", 9.0), (2, "b2", 5.0), (3, "c1", 3.0)],   # re-insert 2
    ]
    for i, rows in enumerate(states):
        snap_merge(engine, name, rows, T[i], spark)

    probe = dt.timedelta(days=1)
    for i, rows in enumerate(states):
        expected = {r[0]: (r[1], r[2]) for r in rows}
        assert dim_as_of(engine, name, T[i] + probe) == expected, f"state {i}"

    # exactly one current row per live key; history row counts match the
    # number of versions each key went through
    cur = engine.catalog.load(name).filter("is_current").collect()
    assert sorted(r["id"] for r in cur) == [1, 2, 3]
    per_key = (
        engine.catalog.load(name).groupBy("id").count().collect()
    )
    counts = {r["id"]: r["count"] for r in per_key}
    assert counts[1] == 3          # a1, a2, a3
    assert counts[2] == 2          # b1 (closed), b2 (current)
    assert counts[3] == 1


def test_empty_source_soft_deletes_everything_in_boundary(engine, spark):
    name = "db.empty_src"
    engine.catalog.create_table(name, DDL)
    snap_merge(engine, name, [(1, "a", 1.0), (2, "b", 2.0)], T[0], spark)
    snap_merge(engine, name, [], T[1], spark)  # empty desired state
    rows = engine.catalog.load(name).collect()
    assert all(r["effective_end"] == T[1] and not r["is_current"] for r in rows)
    assert dim_as_of(engine, name, T[1] + dt.timedelta(days=1)) == {}


def test_all_inserts_into_empty_table(engine, spark):
    name = "db.allins"
    engine.catalog.create_table(name, DDL)
    snap_merge(engine, name, [(i, f"n{i}", float(i)) for i in range(50)], T[0], spark)
    df = engine.catalog.load(name)
    assert df.count() == 50
    assert df.filter("is_current").count() == 50
    assert df.filter(F.col("effective_start") == T[0]).count() == 50


def test_unicode_and_special_characters(engine, spark):
    name = "db.uni"
    engine.catalog.create_table(name, DDL)
    weird = [
        (1, "naïve — ünïcödé 日本語 🚀", 1.0),
        (2, "quotes ' \" and , commas", 2.0),
        (3, "tabs\tand\nnewlines", 3.0),
        (4, "null\x00byte-ish and =equals%percent", 4.0),
    ]
    snap_merge(engine, name, weird, T[0], spark)
    got = dim_as_of(engine, name, T[0] + dt.timedelta(days=1))
    assert got == {r[0]: (r[1], r[2]) for r in weird}
    # update one unicode row; others untouched
    weird2 = [(1, "naïve — ünïcödé 日本語 🚀 v2", 1.0)] + weird[1:]
    snap_merge(engine, name, weird2, T[1], spark)
    got = dim_as_of(engine, name, T[1] + dt.timedelta(days=1))
    assert got[1][0].endswith("v2")
    assert got[4] == (weird[3][1], weird[3][2]), got  # id=4 untouched


def test_extreme_values(engine, spark):
    import math

    name = "db.extreme"
    engine.catalog.create_table(name, DDL)
    rows = [
        (1, "max", 1.7976931348623157e308),
        (2, "min", -1.7976931348623157e308),
        (3, "tiny", 5e-324),
        (4, "inf", float("inf")),
        (5, "nan", float("nan")),
        (6, "empty", 0.0),
        (7, "x" * 10_000, 7.0),  # long string
    ]
    snap_merge(engine, name, rows, T[0], spark)
    got = {r["id"]: r for r in engine.catalog.load(name).collect()}
    assert got[1]["amount"] == 1.7976931348623157e308
    assert got[3]["amount"] == 5e-324
    assert math.isinf(got[4]["amount"])
    assert math.isnan(got[5]["amount"])
    assert len(got[7]["name"]) == 10_000
    # re-merging the identical extreme state is a no-change (NaN-safe
    # compare via IS DISTINCT FROM semantics: NaN <=> NaN is true)
    snap_merge(engine, name, rows, T[1], spark)
    assert engine.catalog.load(name).filter("is_current").count() == 7
    assert engine.catalog.load(name).count() == 7  # no new versions


def test_builder_validation_errors(engine, spark):
    """Validation matrix (reference provideKeyAndChangeTrackingColumn /
    SCD2ColumnValidationTestCases): clean engine errors, not Spark
    analysis crashes."""
    from swiftlake_spark.tables.metadata import ValidationError

    name = "db.valid"
    engine.catalog.create_table(name, DDL)
    src = spark.createDataFrame([(1, "a", 1.0)], "id BIGINT, name STRING, amount DOUBLE")

    def b():
        return (
            engine.apply_snapshot_as_scd2(name)
            .table_filter(E.always_true())
            .source_dataframe(src)
            .effective_timestamp(T[0])
        )

    with pytest.raises(ValidationError, match="key columns not in table"):
        b().key_columns(["nope"]).execute()
    with pytest.raises(ValidationError, match="tracking columns not in table"):
        b().key_columns(["id"]).change_tracking_columns(["ghost"]).execute()
    with pytest.raises(ValidationError, match="overlap keys"):
        b().key_columns(["id"]).change_tracking_columns(["id"]).execute()
    with pytest.raises(ValidationError, match="cannot be key"):
        b().key_columns(["effective_start"]).execute()
    with pytest.raises(ValidationError, match="period column"):
        b().key_columns(["id"]).effective_period_columns("no_start", "no_end").execute()
    with pytest.raises(ValidationError, match="flag column"):
        b().key_columns(["id"]).current_flag_column("no_flag").execute()

    # SCD1 side
    with pytest.raises(ValidationError, match="key columns not in table"):
        (
            engine.apply_snapshot_as_scd1(name)
            .table_filter(E.always_true())
            .source_dataframe(src)
            .key_columns(["nope"])
            .execute()
        )
    with pytest.raises(ValidationError, match="value columns not in table"):
        (
            engine.apply_snapshot_as_scd1(name)
            .table_filter(E.always_true())
            .source_dataframe(src)
            .key_columns(["id"])
            .value_columns(["ghost"])
            .execute()
        )
