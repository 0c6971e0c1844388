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


# ===========================================================================
# Parametrized sweep ported from the reference's provideTestCases matrix
# (SCD2MergeBasicIntegrationTest.java:197-240: each scenario family runs in
# BOTH snapshot and changes mode; multiColumnKey/nullValues/partitioned
# variants are the reference's own axes).  Case TUPLES are lifted, code is
# not: every case builds the table, merges twice, and checks the final
# dimension, the as-of reconstruction of the initial state, version
# counts and flag consistency against a pure-Python expected model.
# ===========================================================================

SWEEP_DDL = (
    "id BIGINT, k2 STRING, name STRING, amount DOUBLE, "
    "effective_start TIMESTAMP, effective_end TIMESTAMP, is_current BOOLEAN"
)

# base dimension state at T[0], keyed (id, k2) — includes a NULL second
# key entity (reference nullValuesTestCase: NULL keys are identities,
# matched null-safely)
BASE = {
    (1, "x"): ("a", 1.0),
    (2, "x"): ("b", 2.0),
    (3, "y"): ("c", 3.0),
    (5, None): ("e", 5.0),
}

# scenario -> desired state at T[1] (snapshot mode feeds it directly;
# changes mode derives I/U/D rows from the diff vs BASE)
SCENARIOS = {
    "mixed": {
        (1, "x"): ("a2", 1.0),   # tracked change (name)
        (2, "x"): ("b", 9.0),    # amount-only change (untracked under TRACK)
        (4, "z"): ("d", 4.0),    # insert
        (5, None): ("e2", 5.0),  # update through the NULL key
        # (3, "y") deleted
    },
    "no_changes": dict(BASE),
    "all_deletes": {},
    "all_inserts": {**BASE, (6, "w"): ("f", 6.0), (7, "w"): ("g", 7.0)},
    "null_second_key": {**BASE, (5, None): ("e2", 5.0)},
    "multi_key": {**BASE, (1, "y"): ("h", 8.0)},  # same id, new k2 → new entity
}


def _sweep_rows(state):
    return [(i, k, n, a) for (i, k), (n, a) in sorted(
        state.items(), key=lambda kv: (kv[0][0], kv[0][1] or "")
    )]


def _expected_final(scenario, tracked_only):
    """What the dimension should hold at T[1]+δ.  With change tracking
    restricted to `name`, an amount-only change is no change at all —
    the old version stays open with its old amount."""
    want = dict(SCENARIOS[scenario])
    if tracked_only:
        for key, (name, _amt) in list(want.items()):
            if key in BASE and BASE[key][0] == name:
                want[key] = BASE[key]  # untracked diff → version survives
    return want


@pytest.mark.parametrize("mode", ["snapshot", "changes"])
@pytest.mark.parametrize("partitioned", [False, True], ids=["flat", "part"])
@pytest.mark.parametrize("tracked_only", [False, True], ids=["track_all", "track_name"])
@pytest.mark.parametrize("scenario", sorted(SCENARIOS))
def test_scd2_sweep(engine, spark, mode, partitioned, tracked_only, scenario):
    name = f"db.sw_{mode[:4]}_{int(partitioned)}{int(tracked_only)}_{scenario}"
    engine.catalog.create_table(
        name, SWEEP_DDL, partition_spec=(["k2"] if partitioned else None)
    )

    def merge(state, prev, ts):
        if mode == "snapshot":
            src = spark.createDataFrame(
                _sweep_rows(state), "id BIGINT, k2 STRING, name STRING, amount DOUBLE"
            )
            b = engine.apply_snapshot_as_scd2(name)
        else:
            ops = []
            for key, val in state.items():
                if key not in prev:
                    ops.append((*key, *val, "I"))
                elif prev[key] != val:
                    ops.append((*key, *val, "U"))
            for key, val in prev.items():
                if key not in state:
                    ops.append((*key, *val, "D"))
            src = spark.createDataFrame(
                ops,
                "id BIGINT, k2 STRING, name STRING, amount DOUBLE, operation_type STRING",
            )
            b = engine.apply_changes_as_scd2(name).operation_type_column(
                "operation_type", "D"
            )
        b = (
            b.table_filter(E.always_true())
            .source_dataframe(src)
            .key_columns(["id", "k2"])
            .current_flag_column("is_current")
            .effective_timestamp(ts)
        )
        if tracked_only:
            b = b.change_tracking_columns(["name"])
        b.execute()

    merge(BASE, {}, T[0])
    merge(SCENARIOS[scenario], BASE, T[1])

    df = engine.catalog.load(name)
    rows = df.collect()

    def as_of(ts):
        return {
            (r["id"], r["k2"]): (r["name"], r["amount"])
            for r in rows
            if r["effective_start"] <= ts
            and (r["effective_end"] is None or r["effective_end"] > ts)
        }

    probe = dt.timedelta(days=1)
    want_final = _expected_final(scenario, tracked_only)
    assert as_of(T[1] + probe) == want_final, "final dimension state"
    # the initial state must stay reconstructible (the point of SCD2)
    assert as_of(T[0] + probe) == BASE, "as-of reconstruction of T0"

    # flag discipline: is_current ⟺ open period; one current row per key
    for r in rows:
        assert r["is_current"] == (r["effective_end"] is None)
    cur = [r for r in rows if r["is_current"]]
    assert len(cur) == len(want_final)
    assert {(r["id"], r["k2"]) for r in cur} == set(want_final)

    # version accounting: closed rows end exactly at T[1]
    closed = [r for r in rows if not r["is_current"]]
    assert all(r["effective_end"] == T[1] for r in closed)
    changed = {
        k for k in BASE
        if k not in want_final or want_final[k] != BASE[k]
    }
    assert len(closed) == len(changed), "one closed version per changed/deleted key"
    assert len(rows) == len(want_final) + len(closed)

    if partitioned:
        # partitioned run: NULL-key rows live in the NULL partition and
        # the manifest records per-partition files
        man = engine.catalog.table(name).meta.read_manifest(
            engine.catalog.table(name).meta.current_snapshot()
        )
        assert all("k2" in e.partition for e in man)
