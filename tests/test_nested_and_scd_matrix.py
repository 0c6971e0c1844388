"""Nested-type table roundtrips (FIXTURES.md §2.1 main_query_table shape,
reference SwiftLakeEngineIntegrationTest.java:82-135 incl. the all-NULL
row) and a wider SCD merge matrix (multi-key, null keys, partitioned
targets, append-only/empty-target, value metadata in SCD2)."""

import datetime as dt
import decimal

import pytest
from pyspark.sql import Row, functions as F

from swiftlake_spark.engine import SwiftLakeEngine
from swiftlake_spark.dml.scd_common import ValueColumnMeta
from swiftlake_spark.tables import expressions as E


@pytest.fixture()
def engine(spark, tmp_path):
    return SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "wh"))


MAIN_DDL = (
    "id BIGINT, name STRING, category STRING, date DATE, "
    "int_col INT, long_col BIGINT, float_col FLOAT, double_col DOUBLE, "
    "decimal_col DECIMAL(10,2), bool_col BOOLEAN, "
    "timestamp_col TIMESTAMP_NTZ, "
    "time_micros_col BIGINT, "  # reference TIME → micros-since-midnight
    "struct_col STRUCT<nested_int: INT, nested_string: STRING, "
    "                  struct_col: STRUCT<nested_int: INT>>, "
    "list_col ARRAY<STRING>, map_col MAP<STRING, INT>"
)


def _main_rows():
    return [
        Row(
            id=1, name="n1", category="A", date=dt.date(2024, 1, 1),
            int_col=10, long_col=100, float_col=1.5, double_col=2.5,
            decimal_col=decimal.Decimal("12.34"), bool_col=True,
            timestamp_col=dt.datetime(2024, 1, 1, 12, 0, 0, 123456),
            time_micros_col=45_296_000_000,
            struct_col=Row(nested_int=7, nested_string="x", struct_col=Row(nested_int=9)),
            list_col=["a", "b"], map_col={"k": 1},
        ),
        Row(
            id=2, name="n2", category="B", date=dt.date(2024, 2, 1),
            int_col=20, long_col=200, float_col=2.5, double_col=3.5,
            decimal_col=decimal.Decimal("56.78"), bool_col=False,
            timestamp_col=dt.datetime(2024, 2, 1, 8, 30),
            time_micros_col=0,
            struct_col=Row(nested_int=8, nested_string="y", struct_col=Row(nested_int=10)),
            list_col=[], map_col={},
        ),
        # the all-NULLs row (id only)
        Row(
            id=3, name=None, category=None, date=None, int_col=None,
            long_col=None, float_col=None, double_col=None, decimal_col=None,
            bool_col=None, timestamp_col=None, time_micros_col=None,
            struct_col=None, list_col=None, map_col=None,
        ),
    ]


def test_nested_types_roundtrip_partitioned(engine, spark):
    t = engine.catalog.create_table("db.main", MAIN_DDL, partition_spec=["date"])
    df = spark.createDataFrame(_main_rows(), schema=t.schema)
    t.append(df)
    got = {r["id"]: r for r in t.scan().collect()}
    assert got[1]["struct_col"]["struct_col"]["nested_int"] == 9
    assert got[1]["map_col"] == {"k": 1}
    assert got[1]["decimal_col"] == decimal.Decimal("12.34")
    assert got[1]["timestamp_col"].microsecond == 123456
    assert got[2]["list_col"] == []
    assert got[3]["struct_col"] is None and got[3]["date"] is None
    # stats-based pruning on a scalar col works with nested cols present
    man = t.meta.read_manifest(t.meta.current_snapshot())
    assert len(t.prune(man, E.col_eq("int_col", 10))) < len(man)
    # null partition value (all-NULL row) readable via IS NULL
    assert [r["id"] for r in t.scan(E.is_null("date")).collect()] == [3]
    # nested field access through engine SQL
    n = engine.sql(
        "SELECT struct_col.nested_int AS ni FROM db.main WHERE struct_col.nested_int = 7"
    ).collect()
    assert [r["ni"] for r in n] == [7]


def test_nested_cow_update(engine, spark):
    t = engine.catalog.create_table("db.main2", MAIN_DDL, partition_spec=["date"])
    t.append(spark.createDataFrame(_main_rows(), schema=t.schema))
    engine.update("db.main2").condition_sql("id = 1").update_sets(
        {"struct_col": F.named_struct(
            F.lit("nested_int"), F.lit(99),
            F.lit("nested_string"), F.lit("upd"),
            F.lit("struct_col"), F.named_struct(F.lit("nested_int"), F.lit(100)),
        )}
    ).execute()
    got = {r["id"]: r for r in engine.catalog.table("db.main2").scan().collect()}
    assert got[1]["struct_col"]["nested_int"] == 99
    assert got[2]["struct_col"]["nested_int"] == 8


SCD1_DDL = "id BIGINT, region STRING, name STRING, v DOUBLE"


def test_scd1_multi_key_with_nulls(engine, spark):
    t = engine.catalog.create_table("db.mk", SCD1_DDL, partition_spec=["region"])
    engine.insert_into("db.mk").dataframe(
        spark.createDataFrame(
            [(1, "A", "x", 1.0), (1, None, "y", 2.0), (2, "A", "z", 3.0)],
            SCD1_DDL,
        )
    ).execute()
    # keys (id, region): null region must match null-safely (<=>)
    src = spark.createDataFrame(
        [(1, "A", "x", 1.0), (1, None, "y2", 2.0), (2, "A", "z", 3.0)], SCD1_DDL
    )
    engine.apply_snapshot_as_scd1("db.mk").table_filter(
        E.always_true()
    ).source_dataframe(src).key_columns(["id", "region"]).execute()
    got = sorted(
        [(r["id"], r["region"], r["name"]) for r in engine.catalog.load("db.mk").collect()],
        key=lambda x: (x[0], x[1] is None, str(x[1])),
    )
    assert (1, None, "y2") in got and (1, "A", "x") in got and len(got) == 3


def test_scd1_snapshot_empty_target_appends(engine, spark):
    engine.catalog.create_table("db.empty1", SCD1_DDL)
    src = spark.createDataFrame([(1, "A", "x", 1.0)], SCD1_DDL)
    engine.apply_snapshot_as_scd1("db.empty1").table_filter(
        E.always_true()
    ).source_dataframe(src).key_columns(["id"]).execute()
    assert engine.catalog.load("db.empty1").count() == 1


SCD2_DDL = (
    "id BIGINT, region STRING, amount DOUBLE, note STRING, "
    "effective_start TIMESTAMP, effective_end TIMESTAMP"
)
T0, T1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)


def test_scd2_partitioned_target_value_metadata(engine, spark):
    t = engine.catalog.create_table("db.p2", SCD2_DDL, partition_spec=["region"])
    engine.insert_into("db.p2").dataframe(
        spark.createDataFrame(
            [
                (1, "A", 100.0, "a", T0, None),
                (2, "A", 200.0, None, T0, None),
                (3, "B", 300.0, "c", T0, None),
            ],
            SCD2_DDL,
        )
    ).execute()
    # amount moves within delta → no new version; note NULL≡'' → no change
    src = spark.createDataFrame(
        [(1, "A", 100.4, "a"), (2, "A", 200.0, ""), (3, "B", 999.0, "c")],
        "id BIGINT, region STRING, amount DOUBLE, note STRING",
    )
    engine.apply_snapshot_as_scd2("db.p2").table_filter(
        E.always_true()
    ).source_dataframe(src).key_columns(["id"]).change_tracking_columns(
        ["amount", "note"]
    ).change_tracking_metadata(
        {
            "amount": ValueColumnMeta(max_delta=0.5),
            "note": ValueColumnMeta(null_replacement=""),
        }
    ).effective_timestamp(T1).execute()
    open_rows = {
        r["id"]: r["amount"]
        for r in engine.catalog.load("db.p2").collect()
        if r["effective_end"] is None
    }
    # 1 and 2 unchanged (old versions still open with old values)
    assert open_rows[1] == 100.0 and open_rows[2] == 200.0
    assert open_rows[3] == 999.0
    closed = [r for r in engine.catalog.load("db.p2").collect() if r["effective_end"]]
    assert [(r["id"], r["amount"]) for r in closed] == [(3, 300.0)]


def test_scd2_changes_delete_unmatched_is_noop(engine, spark):
    engine.catalog.create_table("db.ghost", SCD2_DDL)
    engine.insert_into("db.ghost").dataframe(
        spark.createDataFrame([(1, "A", 1.0, "x", T0, None)], SCD2_DDL)
    ).execute()
    src = spark.createDataFrame(
        [(99, "Z", 0.0, None, "DELETE")],
        "id BIGINT, region STRING, amount DOUBLE, note STRING, op STRING",
    )
    engine.apply_changes_as_scd2("db.ghost").table_filter(
        E.always_true()
    ).source_dataframe(src).key_columns(["id"]).operation_type_column(
        "op", "DELETE"
    ).effective_timestamp(T1).execute()
    rows = engine.catalog.load("db.ghost").collect()
    assert len(rows) == 1 and rows[0]["effective_end"] is None


def test_scd1_changes_empty_target(engine, spark):
    engine.catalog.create_table("db.ch_empty", SCD1_DDL)
    src = spark.createDataFrame(
        [(1, "A", "x", 1.0, "UPSERT"), (2, "A", "y", 2.0, "DELETE")],
        SCD1_DDL + ", op STRING",
    )
    engine.apply_changes_as_scd1("db.ch_empty").table_filter(
        E.always_true()
    ).source_dataframe(src).key_columns(["id"]).operation_type_column(
        "op", "DELETE"
    ).execute()
    rows = engine.catalog.load("db.ch_empty").collect()
    assert [(r["id"], r["name"]) for r in rows] == [(1, "x")]  # delete of absent → noop


def test_scd2_without_current_flag_and_generated_ts(engine, spark):
    ddl = "id BIGINT, name STRING, effective_start TIMESTAMP, effective_end TIMESTAMP"
    engine.catalog.create_table("db.noflag", ddl)
    engine.insert_into("db.noflag").dataframe(
        spark.createDataFrame([(1, "one", T0, None)], ddl)
    ).execute()
    src = spark.createDataFrame([(1, "one-v2")], "id BIGINT, name STRING")
    engine.apply_snapshot_as_scd2("db.noflag").table_filter(
        E.always_true()
    ).source_dataframe(src).key_columns(["id"]).generate_effective_timestamp(
        True
    ).execute()
    rows = sorted(
        engine.catalog.load("db.noflag").collect(),
        key=lambda r: (r["effective_end"] is None, str(r["effective_end"])),
    )
    assert len(rows) == 2
    closed, open_ = rows[1], rows[0] if rows[0]["effective_end"] is None else rows[1]
    open_rows = [r for r in rows if r["effective_end"] is None]
    closed_rows = [r for r in rows if r["effective_end"] is not None]
    assert len(open_rows) == 1 and open_rows[0]["name"] == "one-v2"
    assert len(closed_rows) == 1 and closed_rows[0]["name"] == "one"
    # generated ts is the new start and the old end
    assert open_rows[0]["effective_start"] == closed_rows[0]["effective_end"]


def test_scd2_second_merge_same_ts_rejected(engine, spark):
    ddl = "id BIGINT, name STRING, effective_start TIMESTAMP, effective_end TIMESTAMP"
    engine.catalog.create_table("db.same_ts", ddl)
    engine.insert_into("db.same_ts").dataframe(
        spark.createDataFrame([(1, "one", T0, None)], ddl)
    ).execute()
    src = spark.createDataFrame([(1, "v2")], "id BIGINT, name STRING")
    engine.apply_snapshot_as_scd2("db.same_ts").table_filter(
        E.always_true()
    ).source_dataframe(src).key_columns(["id"]).effective_timestamp(T1).execute()
    # merging again AT the same effective ts must hit the out-of-order guard
    from swiftlake_spark.tables.metadata import ValidationError

    with pytest.raises(ValidationError, match="out-of-order"):
        engine.apply_snapshot_as_scd2("db.same_ts").table_filter(
            E.always_true()
        ).source_dataframe(
            spark.createDataFrame([(1, "v3")], "id BIGINT, name STRING")
        ).key_columns(["id"]).effective_timestamp(T1).execute()
