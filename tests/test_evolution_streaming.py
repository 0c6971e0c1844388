"""Schema evolution (add/drop/widen, name-resolved) and the streaming
extension (windowed + session rollups, lakehouse sink)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from swiftlake_spark.engine import SwiftLakeEngine
from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.metadata import ValidationError


@pytest.fixture()
def engine(spark, tmp_path):
    return SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "wh"))


def test_add_drop_widen_column(engine, spark):
    t = engine.catalog.create_table("db.evo", "id INT, name STRING")
    t.append(spark.createDataFrame([(1, "a")], schema=t.schema))
    # add: old files read NULL for the new column
    t.add_column("score", "double")
    t.append(
        spark.createDataFrame([(2, "b", 2.5)], "id INT, name STRING, score DOUBLE")
    )
    got = {r["id"]: (r["name"], r["score"]) for r in t.scan().collect()}
    assert got == {1: ("a", None), 2: ("b", 2.5)}
    # widen: int → bigint upcast applies to old int32 files
    t.widen_column("id", "bigint")
    assert dict(t.scan().dtypes)["id"] == "bigint"
    assert {r["id"] for r in t.scan().collect()} == {1, 2}
    # drop: extra column in files is ignored on read
    t.drop_column("name")
    assert [f[0] for f in t.scan().dtypes] == ["id", "score"]
    # invalid evolutions rejected
    with pytest.raises(ValidationError):
        t.widen_column("score", "float")  # narrowing
    with pytest.raises(ValidationError):
        t.add_column("id", "int")


def test_drop_partition_column_rejected(engine, spark):
    t = engine.catalog.create_table("db.evo2", "id INT, cat STRING", partition_spec=["cat"])
    with pytest.raises(ValidationError):
        t.drop_column("cat")


def test_rename_column_field_id_resolution(engine, spark):
    """Rename = same field ID, new name (SchemaEvolution.java:328-404):
    files written before AND after the rename read under the new name."""
    t = engine.catalog.create_table("db.ren", "id INT, amount DOUBLE, tag STRING")
    t.append(spark.createDataFrame([(1, 10.0, "x"), (2, 20.0, "y")], schema=t.schema))
    t.rename_column("amount", "amt")
    assert [f[0] for f in t.scan().dtypes] == ["id", "amt", "tag"]
    t.append(
        spark.createDataFrame([(3, 30.0, "z")], "id INT, amt DOUBLE, tag STRING")
    )
    got = {r["id"]: (r["amt"], r["tag"]) for r in t.scan().collect()}
    assert got == {1: (10.0, "x"), 2: (20.0, "y"), 3: (30.0, "z")}

    # filters on the new name apply to old files (stats translated by ID)
    assert {r["id"] for r in t.scan(E.gt("amt", 15.0)).collect()} == {2, 3}

    # rename chains and add-after-drop keep IDs straight
    t.rename_column("amt", "value")
    got2 = {r["id"]: r["value"] for r in t.scan().collect()}
    assert got2 == {1: 10.0, 2: 20.0, 3: 30.0}
    t.drop_column("tag")
    t.add_column("tag", "string")  # NEW field id: old files' tag is gone
    assert {r["tag"] for r in t.scan().collect()} == {None}

    # invalid renames rejected
    with pytest.raises(ValidationError):
        t.rename_column("nope", "x")
    with pytest.raises(ValidationError):
        t.rename_column("value", "id")


def test_rename_partition_source_and_dml(engine, spark):
    """Renaming a partition source keeps pruning + COW DML working."""
    t = engine.catalog.create_table(
        "db.ren2", "id INT, cat STRING, v DOUBLE", partition_spec=["cat"]
    )
    t.append(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "b", 3.0)], schema=t.schema
        )
    )
    t.rename_column("cat", "category")
    assert {d["source"] for d in t.meta.partition_spec} == {"category"}
    assert {r["id"] for r in t.scan(E.col_eq("category", "b")).collect()} == {2, 3}
    # COW update through the renamed column
    t.update(E.col_eq("category", "b"), {"v": F.col("v") + 100})
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert got == {1: 1.0, 2: 102.0, 3: 103.0}
    # new writes land under the new partition key and prune on it
    t.append(spark.createDataFrame([(4, "c", 4.0)], schema=t.schema))
    assert {r["id"] for r in t.scan(E.col_eq("category", "c")).collect()} == {4}


def test_streaming_windowed_rollup_memory_sink(spark, tmp_path):
    from swiftlake_spark.streaming import windowed_rollup

    # drive a streaming query from a parquet source dir
    src = str(tmp_path / "stream_src")
    events = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 1), 10, "click", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 0, 2), 11, "click", 2.0, "{}"),
            (3, dt.datetime(2024, 1, 1, 0, 9), 10, "view", 3.0, "{}"),
        ],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    )
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_rollup(stream, window="5 minutes", watermark="1 minute")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT event_type, n, total_value FROM win_out ORDER BY event_type"
        ).collect()
    finally:
        q.stop()
    assert [(r["event_type"], r["n"], r["total_value"]) for r in rows] == [
        ("click", 2, 3.0),
        ("view", 1, 3.0),
    ]
    # batch/stream parity: same transformation on the batch frame
    batch = windowed_rollup(events)
    brows = {
        (r["event_type"], r["n"]) for r in batch.collect()
    }
    assert brows == {("click", 2), ("view", 1)}


def test_stream_into_lakehouse_table(engine, spark, tmp_path):
    from swiftlake_spark.streaming import stream_into_table

    src = str(tmp_path / "sink_src")
    ck = str(tmp_path / "ck")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, "click", 1.0, "{}")],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    )
    df.write.parquet(src)
    engine.catalog.create_table(
        "db.ev",
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    )
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = stream_into_table(stream, engine, "db.ev", ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert engine.catalog.table("db.ev").scan().count() == 1


def test_streaming_session_rollup(spark, tmp_path):
    from swiftlake_spark.streaming import session_rollup

    src = str(tmp_path / "sess_src")
    events = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0), 1, "c", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 0, 10), 1, "c", 2.0, "{}"),   # same session
            (3, dt.datetime(2024, 1, 1, 2, 0), 1, "c", 3.0, "{}"),    # new session
            (4, dt.datetime(2024, 1, 1, 0, 5), 2, "c", 4.0, "{}"),
        ],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    )
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = session_rollup(stream, gap="30 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, n_events, total_value FROM sess_out ORDER BY user_id, n_events DESC"
        ).collect()
    finally:
        q.stop()
    assert [(r["user_id"], r["n_events"], r["total_value"]) for r in rows] == [
        (1, 2, 3.0),   # merged session of events 1+2
        (1, 1, 3.0),   # lone later session
        (2, 1, 4.0),
    ]
    # batch parity
    b = session_rollup(events)
    assert b.count() == 3


def test_register_testdata_views(spark, tmp_path):
    from swiftlake_spark.engine import SwiftLakeEngine

    eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "whrt"))
    eng.register_testdata("/root/testdata/sf0.001")
    n = eng.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0]["n"]
    assert n > 0


def test_stateful_user_totals_applyinpandas_with_state(spark, tmp_path):
    """applyInPandasWithState: running per-user totals across micro-batches
    with event-time timeout eviction (closed=true rows)."""
    import time

    from swiftlake_spark.streaming import stateful_user_totals

    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    src = str(tmp_path / "state_src")
    (tmp_path / "state_src").mkdir()

    def batch(i, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{src}/b{i}")
        time.sleep(0.05)  # distinct mtimes → stable file-source batch order

    t = dt.datetime(2024, 1, 1, 0, 0)
    batch(1, [(1, t + dt.timedelta(minutes=1), 10, "click", 1.0, "{}"),
              (2, t + dt.timedelta(minutes=2), 10, "click", 2.0, "{}")])
    batch(2, [(3, t + dt.timedelta(minutes=20), 11, "view", 5.0, "{}")])
    batch(3, [(4, t + dt.timedelta(minutes=40), 11, "view", 7.0, "{}")])
    batch(4, [(5, t + dt.timedelta(minutes=60), 11, "view", 1.0, "{}")])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = stateful_user_totals(stream, watermark="1 minutes", idle_timeout_minutes=5)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, n_events, total_value, closed FROM state_out"
        ).collect()
    finally:
        q.stop()

    updates = {(r["user_id"], r["closed"]): (r["n_events"], r["total_value"]) for r in rows}
    # user 10's state accumulated both events of batch 1
    assert updates[(10, False)] == (2, 3.0)
    # user 11 kept accumulating across batches 2-4
    assert updates[(11, False)] == (3, 13.0)
    # watermark (59 min at batch 4) passed user 10's idle timeout
    # (watermark-at-update + 5 min) → state evicted with a closed row
    assert updates[(10, True)] == (2, 3.0)


def test_streaming_append_mode_drops_late_rows(spark, tmp_path):
    """Append mode emits only finalized windows; a row later than the
    watermark allows is dropped (the late-data contract)."""
    import time

    from swiftlake_spark.streaming import windowed_rollup

    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    src = str(tmp_path / "late_src")
    (tmp_path / "late_src").mkdir()
    t = dt.datetime(2024, 1, 1, 0, 0)

    def batch(i, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{src}/b{i}")
        time.sleep(1.1)

    batch(1, [(1, t + dt.timedelta(minutes=1), 1, "click", 1.0, "{}")])
    # advance event time far past the first 5-minute window; the
    # OPERATIVE watermark lags one batch behind the data that moves it,
    # so a second advancing batch locks it in before the late row lands
    batch(2, [(2, t + dt.timedelta(minutes=60), 1, "click", 1.0, "{}")])
    batch(3, [(3, t + dt.timedelta(minutes=65), 1, "click", 1.0, "{}")])
    # late row for the first window — now behind the watermark: dropped
    batch(4, [(4, t + dt.timedelta(minutes=2), 1, "click", 100.0, "{}")])
    batch(5, [(5, t + dt.timedelta(minutes=90), 1, "click", 1.0, "{}")])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = windowed_rollup(stream, window="5 minutes", watermark="1 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT win.start AS s, n, total_value FROM late_out").collect()
    finally:
        q.stop()
    by_start = {r["s"]: (r["n"], r["total_value"]) for r in rows}
    # first window finalized with ONE row — the late 100.0 never landed
    assert by_start[t] == (1, 1.0)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from swiftlake_spark.streaming import dedup_within_watermark

    src = str(tmp_path / "dedup_src")
    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    events = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 1), 10, "click", 1.0, "{}"),
            (1, dt.datetime(2024, 1, 1, 0, 2), 10, "click", 1.0, "{}"),  # dup id
            (2, dt.datetime(2024, 1, 1, 0, 3), 11, "view", 2.0, "{}"),
        ],
        schema,
    )
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        dedup_within_watermark(stream, ["event_id"], watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT event_id FROM dedup_out ORDER BY event_id").collect()
    finally:
        q.stop()
    assert [r["event_id"] for r in rows] == [1, 2]
    # batch parity: degrades to dropDuplicates
    assert dedup_within_watermark(events, ["event_id"]).count() == 2


def test_streaming_enrich_with_dim(spark, tmp_path):
    from swiftlake_spark.streaming import enrich_with_dim

    src = str(tmp_path / "enrich_src")
    events = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 1), 10, "click", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 0, 2), 99, "view", 2.0, "{}"),
        ],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    )
    events.write.parquet(src)
    dim = spark.createDataFrame([(10, "gold"), (11, "silver")], "user_id BIGINT, tier STRING")
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        enrich_with_dim(stream, dim, "user_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT event_id, tier FROM enrich_out ORDER BY event_id"
        ).collect()
    finally:
        q.stop()
    assert [(r["event_id"], r["tier"]) for r in rows] == [(1, "gold"), (2, None)]


def test_stream_stream_interval_join(spark, tmp_path):
    from swiftlake_spark.streaming import interval_join

    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    l_src, r_src = str(tmp_path / "l_src"), str(tmp_path / "r_src")
    impressions = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0), 10, "impression", 0.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 0, 0), 11, "impression", 0.0, "{}"),
        ],
        schema,
    )
    clicks = spark.createDataFrame(
        [
            # within 5 min of impression 1 → joins
            (3, dt.datetime(2024, 1, 1, 0, 3), 10, "click", 1.0, "{}"),
            # 30 min after impression 2 → outside max_delay, dropped
            (4, dt.datetime(2024, 1, 1, 0, 30), 11, "click", 1.0, "{}"),
        ],
        schema,
    )
    impressions.write.parquet(l_src)
    clicks.write.parquet(r_src)
    ls = spark.readStream.schema(impressions.schema).parquet(l_src)
    rs = spark.readStream.schema(clicks.schema).parquet(r_src)
    q = (
        interval_join(ls, rs, key="user_id", max_delay="5 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT l_event_id, r_event_id FROM ij_out ORDER BY l_event_id"
        ).collect()
    finally:
        q.stop()
    assert [(r["l_event_id"], r["r_event_id"]) for r in rows] == [(1, 3)]


def test_consume_appends_exactly_once_feed(engine, spark, tmp_path):
    """CDC feed over table appends: drains once, resumes from the cursor,
    replays a failed batch, and refuses to cross a rewrite."""
    from swiftlake_spark.streaming.jobs import consume_appends

    t = engine.catalog.create_table("db.feed", "id BIGINT, v STRING")
    for i in range(3):
        t.append(spark.createDataFrame([(i, f"v{i}")], schema=t.schema))
    cursor = str(tmp_path / "cursor.json")

    seen: list[tuple[int, ...]] = []

    def collect(df, snap):
        seen.append(tuple(sorted(r["id"] for r in df.collect())))

    assert consume_appends(t, collect, cursor_path=cursor) == 3
    assert seen == [(0,), (1,), (2,)]

    # nothing new → no batches
    assert consume_appends(t, collect, cursor_path=cursor) == 0

    # new appends resume after the cursor
    t.append(spark.createDataFrame([(3, "v3"), (4, "v4")], schema=t.schema))
    t.append(spark.createDataFrame([(5, "v5")], schema=t.schema))
    assert consume_appends(t, collect, cursor_path=cursor) == 2
    assert seen[-2:] == [(3, 4), (5,)]

    # a crash mid-batch replays exactly the failed batch
    t.append(spark.createDataFrame([(6, "v6")], schema=t.schema))
    t.append(spark.createDataFrame([(7, "v7")], schema=t.schema))

    boom = {"armed": True}

    def flaky(df, snap):
        rows = tuple(sorted(r["id"] for r in df.collect()))
        if rows == (7,) and boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("sink crashed")
        seen.append(rows)

    with pytest.raises(RuntimeError):
        consume_appends(t, flaky, cursor_path=cursor)
    assert seen[-1] == (6,)  # batch 6 committed to the cursor...
    assert consume_appends(t, flaky, cursor_path=cursor) == 1
    assert seen[-1] == (7,)  # ...and 7 replayed on resume

    # rewrites break appends-only semantics → explicit refusal
    t.delete_where(E.col_eq("id", 0))
    t.append(spark.createDataFrame([(8, "v8")], schema=t.schema))
    with pytest.raises(ValidationError, match="non-append"):
        consume_appends(t, collect, cursor_path=cursor)


def test_stream_upsert_into_table(engine, spark, tmp_path):
    """foreachBatch CDC apply: upserts keyed per batch, in-batch version
    wins, delete markers honored."""
    from swiftlake_spark.streaming import stream_upsert_into_table

    t = engine.catalog.create_table("db.up", "id BIGINT, v STRING")
    t.append(spark.createDataFrame([(1, "old"), (2, "keep")], schema=t.schema))

    src = str(tmp_path / "up_src")
    schema = "id BIGINT, v STRING, ver BIGINT, op STRING"
    spark.createDataFrame(
        [
            (1, "new-a", 1, "U"),   # update, loses to ver=2 in-batch
            (1, "new-b", 2, "U"),
            (3, "ins", 1, "U"),     # insert
            (2, None, 1, "D"),      # delete marker
        ],
        schema,
    ).write.parquet(src)

    q = stream_upsert_into_table(
        spark.readStream.schema(schema).parquet(src),
        engine,
        "db.up",
        ["id"],
        str(tmp_path / "up_ck"),
        version_column="ver",
        op_column="op",
        delete_value="D",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        tuple(r) for r in engine.catalog.table("db.up").scan().collect()
    )
    assert got == [(1, "new-b"), (3, "ins")]


def test_stream_upsert_without_op_column(engine, spark, tmp_path):
    """The advertised pure-upsert default (op_column=None) must work:
    every batch row is an upsert, no delete sentinel required."""
    from swiftlake_spark.streaming import stream_upsert_into_table

    t = engine.catalog.create_table("db.up2", "id BIGINT, v STRING")
    t.append(spark.createDataFrame([(1, "old")], schema=t.schema))

    src = str(tmp_path / "up2_src")
    schema = "id BIGINT, v STRING, ver BIGINT"
    spark.createDataFrame([(1, "new", 2), (1, "mid", 1), (2, "ins", 1)], schema)\
        .write.parquet(src)

    q = stream_upsert_into_table(
        spark.readStream.schema(schema).parquet(src),
        engine,
        "db.up2",
        ["id"],
        str(tmp_path / "up2_ck"),
        version_column="ver",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted((r["id"], r["v"]) for r in engine.catalog.load("db.up2").collect())
    assert got == [(1, "new"), (2, "ins")]
