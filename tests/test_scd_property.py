"""Property-based SCD1 soundness: random target/source states, the
merge result must equal a trivial Python dict model.

Mirrors the reference's parameterized-matrix philosophy
(SCD1MergeBasicIntegrationTest sweeps modes over fixed states) but with
randomized states: snapshot-mode semantics are modeled as
"boundary rows become exactly the in-boundary source; outside rows
survive untouched"; changes mode as ordered upsert/delete application.
Null values flow through the null-safe compare path."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

VALUES = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
STATE = st.dictionaries(st.integers(min_value=0, max_value=6), VALUES, max_size=6)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from swiftlake_spark.engine import SwiftLakeEngine

    return SwiftLakeEngine(
        spark=spark, warehouse=str(tmp_path_factory.mktemp("prop_wh"))
    )


_seq = [0]


def _fresh_table(engine, spark, rows):
    _seq[0] += 1
    name = f"db.prop{_seq[0]}"
    t = engine.catalog.create_table(name, "id BIGINT, v STRING")
    if rows:
        t.append(spark.createDataFrame(rows, schema=t.schema))
    return name


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(target=STATE, source=STATE, bound=st.integers(min_value=0, max_value=6))
def test_scd1_snapshot_matches_model(engine, spark, target, source, bound):
    name = _fresh_table(engine, spark, sorted(target.items()))
    src_rows = sorted(source.items())
    if not src_rows:  # merge needs a source with rows to classify
        src_rows = [(99, "zz")]  # outside every boundary: no-op source
        source = {99: "zz"}
    src = spark.createDataFrame(src_rows, "id BIGINT, v STRING")
    engine.apply_snapshot_as_scd1(name).table_filter_sql(f"id <= {bound}").\
        source_dataframe(src).key_columns(["id"]).execute()

    model = {k: v for k, v in target.items() if k > bound}
    model.update({k: v for k, v in source.items() if k <= bound})
    got = {r["id"]: r["v"] for r in engine.catalog.table(name).scan().collect()}
    assert got == model


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    target=STATE,
    changes=st.dictionaries(
        st.integers(min_value=0, max_value=6),
        st.tuples(st.sampled_from(["U", "D"]), VALUES),
        min_size=1,
        max_size=6,
    ),
)
def test_scd1_changes_matches_model(engine, spark, target, changes):
    name = _fresh_table(engine, spark, sorted(target.items()))
    src = spark.createDataFrame(
        [(k, v, op) for k, (op, v) in sorted(changes.items())],
        "id BIGINT, v STRING, op STRING",
    )
    engine.apply_changes_as_scd1(name).table_filter_sql("id IS NOT NULL").\
        source_dataframe(src).key_columns(["id"]).\
        operation_type_column("op", "D").execute()

    model = dict(target)
    for k, (op, v) in changes.items():
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v
    got = {r["id"]: r["v"] for r in engine.catalog.table(name).scan().collect()}
    assert got == model


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(target=STATE, snap1=STATE, snap2=STATE)
def test_scd2_two_consecutive_snapshots_match_model(engine, spark, target, snap1, snap2):
    """Two successive SCD2 snapshot merges must leave exactly the open/
    closed version history a dict-of-lists temporal model predicts."""
    import datetime as dt

    T0, T1, T2 = (dt.datetime(2024, m, 1) for m in (1, 2, 3))
    _seq[0] += 1
    name = f"db.prop2_{_seq[0]}"
    t = engine.catalog.create_table(
        name, "id BIGINT, v STRING, effective_start TIMESTAMP, effective_end TIMESTAMP"
    )
    if target:
        t.append(spark.createDataFrame(
            [(k, v, T0, None) for k, v in sorted(target.items())], schema=t.schema))

    # model: versions[(id)] = list of (v, start, end|None); open = end is None
    versions = {k: [(v, T0, None)] for k, v in target.items()}

    def apply_snapshot(snap, ts):
        if not snap:
            snap = {99: "zz"}  # engine needs a non-empty source
        src = spark.createDataFrame(sorted(snap.items()), "id BIGINT, v STRING")
        engine.apply_snapshot_as_scd2(name).table_filter_sql("id <= 50").\
            source_dataframe(src).key_columns(["id"]).\
            effective_timestamp(ts).execute()
        # model update (same classification the reference's templates do)
        for k in set(versions) | set(snap):
            if k > 50:
                continue
            open_v = next(
                ((i, ver) for i, ver in enumerate(versions.get(k, []))
                 if ver[2] is None), None)
            if k in snap:
                if open_v is None:               # I: no open version
                    versions.setdefault(k, []).append((snap[k], ts, None))
                elif open_v[1][0] != snap[k]:    # U: value changed
                    i, (v, s, _e) = open_v
                    versions[k][i] = (v, s, ts)
                    versions[k].append((snap[k], ts, None))
                # else N: unchanged, leave open
            elif open_v is not None:             # D: close without successor
                i, (v, s, _e) = open_v
                versions[k][i] = (v, s, ts)

    apply_snapshot(snap1, T1)
    apply_snapshot(snap2, T2)

    def _sk(t):
        return (t[0], t[1] or "", t[2], t[3] or dt.datetime.max)

    expected = sorted(
        ((k, v, s, e) for k, vers in versions.items() for (v, s, e) in vers),
        key=_sk,
    )
    got = sorted(
        (
            (r["id"], r["v"], r["effective_start"], r["effective_end"])
            for r in engine.catalog.table(name).scan().collect()
        ),
        key=_sk,
    )
    assert got == expected
