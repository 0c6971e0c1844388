"""Generic MERGE INTO (dml/merge.py — beyond the reference surface).

Covers: three-clause merge, per-clause conditions with first-match-wins
ordering, computed update expressions over target./source. namespaces,
conditional insert, delete-only merge, cardinality violation, boundary
filter semantics (out-of-boundary rows in touched files survive; rows
outside the boundary never match), unbounded opt-out requirement,
null-safe key matching, batch transactions, and a DuckDB differential
check of the merged state.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from swiftlake_spark.engine import SwiftLakeEngine
from swiftlake_spark.tables.metadata import ValidationError


@pytest.fixture()
def engine(spark, tmp_path):
    return SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "wh"))


def _key(t):
    return tuple((x is None, str(x)) for x in t)


def rows(df, *cols):
    out = df.select(*cols) if cols else df
    return sorted([tuple(r) for r in out.collect()], key=_key)


DDL = "id BIGINT, cat STRING, qty BIGINT, price DOUBLE"


def seed(engine, spark, name="db.m", data=None, **create_kw):
    engine.catalog.create_table(name, DDL, **create_kw)
    engine.insert_into(name).dataframe(
        spark.createDataFrame(
            data
            or [
                (1, "A", 10, 1.0),
                (2, "A", 20, 2.0),
                (3, "B", 30, 3.0),
                (4, "B", 40, 4.0),
            ],
            DDL,
        )
    ).execute()
    return name


def src(spark, data):
    return spark.createDataFrame(data, DDL)


def test_merge_three_clause(engine, spark):
    seed(engine, spark)
    # upsert + conditional delete: id=2 updated, id=3 deleted (cat B),
    # id=9 inserted, id=1/4 untouched
    engine.merge_into("db.m").using(
        src(spark, [(2, "A", 99, 9.9), (3, "B", 31, 3.1), (9, "C", 5, 0.5)])
    ).key_columns(["id"]).unbounded().when_matched_delete(
        condition="source.cat = 'B'"
    ).when_matched_update().when_not_matched_insert().execute()
    assert rows(engine.catalog.load("db.m"), "id", "cat", "qty", "price") == [
        (1, "A", 10, 1.0),
        (2, "A", 99, 9.9),
        (4, "B", 40, 4.0),
        (9, "C", 5, 0.5),
    ]


def test_merge_first_match_wins_and_computed_sets(engine, spark):
    seed(engine, spark)
    # clause order: the qty-accumulate clause fires first for id=2; the
    # catch-all update would otherwise replace the row
    engine.merge_into("db.m").using(
        src(spark, [(2, "A", 7, 0.0), (3, "B", 1, 0.0)])
    ).key_columns(["id"]).unbounded().when_matched_update(
        sets={"qty": "target.qty + source.qty"}, condition="source.qty > 5"
    ).when_matched_update(
        sets={"price": "source.price"}
    ).execute()
    assert rows(engine.catalog.load("db.m"), "id", "qty", "price") == [
        (1, 10, 1.0),
        (2, 27, 2.0),  # qty accumulated, price untouched (clause 0 fired)
        (3, 30, 0.0),  # clause 1 fired: price replaced, qty untouched
        (4, 40, 4.0),
    ]


def test_merge_conditional_insert_and_values(engine, spark):
    seed(engine, spark)
    engine.merge_into("db.m").using(
        src(spark, [(8, "C", 100, 1.0), (9, "C", 1, 1.0)])
    ).key_columns(["id"]).unbounded().when_not_matched_insert(
        values={"id": "source.id", "cat": "'NEW'", "qty": "source.qty * 2"},
        condition="source.qty >= 50",
    ).execute()
    out = rows(engine.catalog.load("db.m"), "id", "cat", "qty", "price")
    assert (8, "NEW", 200, None) in out
    assert all(r[0] != 9 for r in out)  # condition filtered the insert
    assert len(out) == 5


def test_merge_delete_only(engine, spark):
    seed(engine, spark)
    engine.merge_into("db.m").using(
        src(spark, [(1, None, 0, 0.0), (4, None, 0, 0.0)])
    ).key_columns(["id"]).unbounded().when_matched_delete().execute()
    assert rows(engine.catalog.load("db.m"), "id") == [(2,), (3,)]


def test_merge_cardinality_violation(engine, spark):
    seed(engine, spark)
    with pytest.raises(ValidationError, match="cardinality"):
        engine.merge_into("db.m").using(
            src(spark, [(2, "A", 1, 1.0), (2, "A", 2, 2.0)])
        ).key_columns(["id"]).unbounded().when_matched_update().execute()


def test_merge_requires_filter_or_unbounded(engine, spark):
    seed(engine, spark)
    with pytest.raises(ValidationError, match="unbounded"):
        engine.merge_into("db.m").using(src(spark, [(1, "A", 0, 0.0)])).key_columns(
            ["id"]
        ).when_matched_update().execute()


def test_merge_boundary_semantics(engine, spark):
    # partitioned by cat; merge bounded to cat='A': the B-partition source
    # row is ignored (no update, no insert), and out-of-boundary rows
    # sharing a touched file survive the rewrite
    seed(
        engine,
        spark,
        data=[
            (1, "A", 10, 1.0),
            (2, "A", 20, 2.0),
            (3, "B", 30, 3.0),
        ],
    )  # unpartitioned: one file holds A and B rows → carry-over is exercised
    engine.merge_into("db.m").using(
        src(spark, [(1, "A", 11, 1.1), (3, "B", 99, 9.9), (7, "B", 7, 0.7)])
    ).key_columns(["id"]).table_filter_sql("cat = 'A'").when_matched_update().when_not_matched_insert().execute()
    assert rows(engine.catalog.load("db.m"), "id", "cat", "qty") == [
        (1, "A", 11),  # updated
        (2, "A", 20),  # carried (same file as id=1)
        (3, "B", 30),  # outside boundary: NOT updated, survives carry-over
    ]


def test_merge_null_safe_keys(engine, spark):
    seed(engine, spark, data=[(None, "A", 1, 1.0), (5, "A", 5, 5.0)])
    engine.merge_into("db.m").using(
        src(spark, [(None, "A", 100, 1.0)])
    ).key_columns(["id"]).unbounded().when_matched_update(
        sets={"qty": "source.qty"}
    ).execute()
    assert rows(engine.catalog.load("db.m"), "id", "qty") == [
        (5, 5),
        (None, 100),
    ]


def test_merge_narrow_source_with_explicit_clauses(engine, spark):
    # a source lacking table columns is fine when every clause is explicit
    seed(engine, spark)
    narrow = spark.createDataFrame([(2, 5)], "id BIGINT, delta BIGINT")
    engine.merge_into("db.m").using(narrow).key_columns(["id"]).unbounded().when_matched_update(
        sets={"qty": "target.qty + source.delta"}
    ).execute()
    assert rows(engine.catalog.load("db.m"), "id", "qty") == [
        (1, 10), (2, 25), (3, 30), (4, 40),
    ]
    # …but whole-row update requires the full schema
    with pytest.raises(ValidationError, match="missing table columns"):
        engine.merge_into("db.m").using(narrow).key_columns(
            ["id"]
        ).unbounded().when_matched_update().execute()


def test_merge_in_batch_transaction(engine, spark):
    seed(engine, spark)
    txn = engine.batch_transaction("db.m")
    engine.merge_into(txn).using(
        src(spark, [(1, "A", 77, 7.7), (8, "C", 8, 0.8)])
    ).key_columns(["id"]).unbounded().when_matched_update().when_not_matched_insert().execute()
    # not visible before commit
    assert rows(engine.catalog.load("db.m"), "id", "qty") == [
        (1, 10), (2, 20), (3, 30), (4, 40),
    ]
    txn.commit()
    assert rows(engine.catalog.load("db.m"), "id", "qty") == [
        (1, 77), (2, 20), (3, 30), (4, 40), (8, 8),
    ]


def test_merge_differential_vs_duckdb(engine, spark):
    """Merged state equals DuckDB's full-outer reference computation."""
    tgt_rows = [
        (i, "A" if i % 2 else "B", i * 10, float(i)) for i in range(1, 41)
    ]
    src_rows = [
        (i, "C", i * 3, float(100 - i)) for i in range(20, 61) if i % 3 != 0
    ]
    seed(engine, spark, data=tgt_rows)
    engine.merge_into("db.m").using(src(spark, src_rows)).key_columns(
        ["id"]
    ).unbounded().when_matched_delete(
        condition="source.qty > 150"
    ).when_matched_update(
        sets={"qty": "target.qty + source.qty", "price": "source.price"}
    ).when_not_matched_insert().execute()

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, cat VARCHAR, qty BIGINT, price DOUBLE)")
    con.execute("CREATE TABLE s (id BIGINT, cat VARCHAR, qty BIGINT, price DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", tgt_rows)
    con.executemany("INSERT INTO s VALUES (?,?,?,?)", src_rows)
    expect = con.execute(
        """
        SELECT t.id, t.cat, t.qty + s.qty AS qty, s.price
        FROM t JOIN s USING (id) WHERE NOT (s.qty > 150)
        UNION ALL
        SELECT t.* FROM t ANTI JOIN s USING (id)
        UNION ALL
        SELECT s.* FROM s ANTI JOIN t USING (id)
        ORDER BY id
        """
    ).fetchall()
    got = rows(engine.catalog.load("db.m"), "id", "cat", "qty", "price")
    assert got == sorted([tuple(r) for r in expect], key=_key)


def test_merge_snapshot_summary_and_time_travel(engine, spark):
    seed(engine, spark)
    t = engine.catalog.table("db.m")
    before = t.meta.current_snapshot().snapshot_id
    engine.merge_into("db.m").using(
        src(spark, [(1, "A", 0, 0.0)])
    ).key_columns(["id"]).unbounded().when_matched_delete().snapshot_metadata(
        {"job": "merge-test"}
    ).execute()
    t = engine.catalog.table("db.m")
    snap = t.meta.current_snapshot()
    assert snap.summary.get("job") == "merge-test"
    # time travel still sees the pre-merge state
    assert len(rows(t.scan(snapshot_id=before))) == 4
    assert rows(engine.catalog.load("db.m"), "id") == [(2,), (3,), (4,)]


# -- WHEN NOT MATCHED BY SOURCE (SQL:2016, Spark SQL >=3.4) ---------------


def test_by_source_delete_full_sync(engine, spark):
    # snapshot-style sync: target rows absent from the source are deleted
    seed(engine, spark)
    engine.merge_into("db.m").using(
        src(spark, [(2, "A", 99, 9.9), (9, "C", 5, 0.5)])
    ).key_columns(["id"]).unbounded().when_matched_update().when_not_matched_insert().when_not_matched_by_source_delete().execute()
    assert rows(engine.catalog.load("db.m"), "id", "cat", "qty") == [
        (2, "A", 99),
        (9, "C", 5),
    ]


def test_by_source_update_and_first_match_wins(engine, spark):
    seed(engine, spark)
    engine.merge_into("db.m").using(
        src(spark, [(1, "A", 0, 0.0)])
    ).key_columns(["id"]).unbounded().when_not_matched_by_source_update(
        sets={"cat": "'COLD'"}, condition="target.qty >= 40"
    ).when_not_matched_by_source_update(
        sets={"qty": "target.qty + 1"}
    ).execute()
    # id=1 matched (untouched: no matched clause); id=4 fired clause 0
    # (cat only); id=2/3 fired clause 1 (qty only)
    assert rows(engine.catalog.load("db.m"), "id", "cat", "qty") == [
        (1, "A", 10),
        (2, "A", 21),
        (3, "B", 31),
        (4, "COLD", 40),
    ]


def test_by_source_respects_boundary(engine, spark):
    # bounded to cat='A': the B rows are outside the merge universe and
    # must NOT be deleted by the by-source clause, even when their file
    # is touched by an in-boundary rewrite
    seed(engine, spark)
    engine.merge_into("db.m").using(
        src(spark, [(1, "A", 11, 1.1)])
    ).key_columns(["id"]).table_filter_sql(
        "cat = 'A'"
    ).when_matched_update().when_not_matched_by_source_delete().execute()
    assert rows(engine.catalog.load("db.m"), "id", "cat", "qty") == [
        (1, "A", 11),  # matched, updated
        (3, "B", 30),  # outside boundary: survives
        (4, "B", 40),  # outside boundary: survives
    ]
    # id=2 (cat='A', unmatched) was deleted by the by-source clause


def test_by_source_rejects_source_refs(engine, spark):
    seed(engine, spark)
    b = engine.merge_into("db.m").using(src(spark, [])).key_columns(["id"])
    with pytest.raises(ValidationError, match="source"):
        b.when_not_matched_by_source_update(sets={"qty": "source.qty"})
    with pytest.raises(ValidationError, match="source"):
        b.when_not_matched_by_source_delete(condition="source.qty > 0")
    # a string literal containing the word is fine
    b.when_not_matched_by_source_update(sets={"cat": "'from source.x'"})


def test_by_source_requires_sets(engine, spark):
    seed(engine, spark)
    with pytest.raises(ValidationError, match="sets"):
        engine.merge_into("db.m").when_not_matched_by_source_update(sets={})


def test_by_source_only_clause(engine, spark):
    # a merge with ONLY a by-source clause is legal (prune-style cleanup)
    seed(engine, spark)
    engine.merge_into("db.m").using(
        src(spark, [(1, "A", 0, 0.0), (3, "B", 0, 0.0)])
    ).key_columns(["id"]).unbounded().when_not_matched_by_source_delete().execute()
    assert rows(engine.catalog.load("db.m"), "id") == [(1,), (3,)]


def test_null_rejecting_keys(engine, spark):
    # null_safe_keys(False): NULL keys never match — the NULL-keyed
    # target row classifies NOT MATCHED BY SOURCE (deleted), the
    # NULL-keyed source row classifies NOT MATCHED (inserted)
    seed(engine, spark, data=[(None, "A", 1, 1.0), (5, "A", 5, 5.0)])
    engine.merge_into("db.m").using(
        src(spark, [(None, "B", 100, 1.0), (5, "A", 50, 5.0)])
    ).key_columns(["id"]).unbounded().null_safe_keys(
        False
    ).when_matched_update().when_not_matched_insert().when_not_matched_by_source_delete().execute()
    assert rows(engine.catalog.load("db.m"), "id", "cat", "qty") == [
        (5, "A", 50),      # matched, updated
        (None, "B", 100),  # inserted (source NULL key never matches)
    ]


def test_by_source_differential_vs_duckdb(engine, spark):
    """Full three-way merge (matched update/delete + insert + by-source
    update/delete) equals DuckDB's reference computation."""
    tgt_rows = [
        (i, "A" if i % 2 else "B", i * 10, float(i)) for i in range(1, 41)
    ]
    src_rows = [
        (i, "C", i * 3, float(100 - i)) for i in range(20, 61) if i % 3 != 0
    ]
    seed(engine, spark, data=tgt_rows)
    engine.merge_into("db.m").using(src(spark, src_rows)).key_columns(
        ["id"]
    ).unbounded().when_matched_update(
        sets={"qty": "target.qty + source.qty"}
    ).when_not_matched_insert().when_not_matched_by_source_delete(
        condition="target.cat = 'B'"
    ).when_not_matched_by_source_update(
        sets={"cat": "'STALE'", "price": "target.price * 2"}
    ).execute()

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, cat VARCHAR, qty BIGINT, price DOUBLE)")
    con.execute("CREATE TABLE s (id BIGINT, cat VARCHAR, qty BIGINT, price DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", tgt_rows)
    con.executemany("INSERT INTO s VALUES (?,?,?,?)", src_rows)
    expect = con.execute(
        """
        SELECT t.id, t.cat, t.qty + s.qty AS qty, t.price
        FROM t JOIN s USING (id)
        UNION ALL
        SELECT s.* FROM s ANTI JOIN t USING (id)
        UNION ALL
        SELECT t.id, 'STALE', t.qty, t.price * 2
        FROM t ANTI JOIN s USING (id) WHERE NOT (t.cat = 'B')
        ORDER BY id
        """
    ).fetchall()
    got = rows(engine.catalog.load("db.m"), "id", "cat", "qty", "price")
    assert got == sorted([tuple(r) for r in expect], key=_key)


def test_match_condition_differential_vs_duckdb(engine, spark):
    """ON-residual (match_condition, r10) against DuckDB's reference
    computation with the residual folded into the join condition: a
    pair failing it does not match — the source row inserts, the
    target row walks NOT MATCHED BY SOURCE."""
    tgt_rows = [
        (i, "A" if i % 2 else "B", i * 10, float(i)) for i in range(1, 41)
    ]
    src_rows = [
        (i, "C", (i * 7) % 50, float(i)) for i in range(20, 61)
    ]
    seed(engine, spark, data=tgt_rows)
    engine.merge_into("db.m").using(src(spark, src_rows)).key_columns(
        ["id"]
    ).match_condition("source.qty >= 25").unbounded().when_matched_update(
        sets={"qty": "source.qty"}
    ).when_not_matched_insert(
        values={"id": "source.id + 1000", "cat": "source.cat",
                "qty": "source.qty", "price": "source.price"}
    ).when_not_matched_by_source_update(
        sets={"cat": "'STALE'"}, condition="target.id >= 30"
    ).execute()

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, cat VARCHAR, qty BIGINT, price DOUBLE)")
    con.execute("CREATE TABLE s (id BIGINT, cat VARCHAR, qty BIGINT, price DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", tgt_rows)
    con.executemany("INSERT INTO s VALUES (?,?,?,?)", src_rows)
    expect = con.execute(
        """
        WITH m AS (SELECT t.id FROM t JOIN s ON t.id = s.id AND s.qty >= 25)
        SELECT t.id, t.cat, s.qty AS qty, t.price
        FROM t JOIN s ON t.id = s.id AND s.qty >= 25      -- matched update
        UNION ALL
        SELECT t.id, CASE WHEN t.id >= 30 THEN 'STALE' ELSE t.cat END,
               t.qty, t.price
        FROM t WHERE t.id NOT IN (SELECT id FROM m)       -- by-source walk
        UNION ALL
        SELECT s.id + 1000, s.cat, s.qty, s.price
        FROM s WHERE s.id NOT IN (SELECT id FROM m)       -- unmatched insert
        """
    ).fetchall()
    got = rows(engine.catalog.load("db.m"), "id", "cat", "qty", "price")
    assert got == sorted([tuple(r) for r in expect], key=_key)
