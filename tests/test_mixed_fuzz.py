"""Mixed read/write interleave fuzz (VERDICT r8 ask #3).

The existing fuzz matrix certifies static reads (tests/test_sql_fuzz.py,
tests/test_engine_sql_fuzz.py) and DML state (tests/test_dml_fuzz.py)
separately; this harness crosses the axes: after EVERY DML commit on a
mutating partitioned table — including occasional schema evolution — a
batch of seeded ``engine.sql`` shapes (filters, aggregates, dim joins,
time travel at a random prior snapshot) runs against a DuckDB mirror of
the same state.  That certifies WHERE-extraction → manifest pruning and
join-filter pushdown over tables whose file sets, specs, and schemas
are actively changing, not frozen fixtures.

A pruning-fired health check closes the loop: if extraction silently
stopped pruning (the failure mode of an over-conservative bail-out),
the sequence fails even though every answer matches.

Shared by the pytest seeds below and ``scripts/fuzz_sweep.py --mixed``
(≥40-seed sweeps).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.check_oracle import canon_rows  # noqa: E402
from tests.test_dml_fuzz import (  # noqa: E402
    CATS,
    SCHEMA,
    _rand_cond,
    _rand_rows,
)

DIM_SCHEMA = "cat STRING, region STRING, priority BIGINT"
DIM_ROWS = [("A", "east", 1), ("B", "east", 2), ("C", "west", 1),
            ("D", "west", 3), ("E", "north", 2)]


def _compare(label: str, seed: int, opi: int, spark_df, con, duck_sql: str,
             params=None):
    res = con.execute(duck_sql, params or [])
    d_cols = [d[0].lower() for d in res.description]
    dc, dr = canon_rows(d_cols, res.fetchall())
    sc, sr = canon_rows(spark_df.columns,
                        [tuple(r) for r in spark_df.collect()])
    sc = [c.lower() for c in sc]
    assert sc == dc and len(sr) == len(dr) and all(
        a == b for a, b in zip(sr, dr)
    ), (f"seed {seed} op {opi} [{label}] diverged\n  engine: {sr[:5]}"
        f"\n  duckdb: {dr[:5]}")


def run_mixed_sequence(spark, warehouse: str, seed: int,
                       n_ops: int = 8) -> None:
    """Seeded DML ops interleaved with engine.sql reads vs a DuckDB
    mirror; raises on any divergence or if pruning never fired."""
    from swiftlake_spark.engine import SwiftLakeEngine
    from swiftlake_spark.plans.metrics import ScanMetrics

    rng = random.Random(seed)
    eng = SwiftLakeEngine(spark, warehouse=warehouse)
    pruned = []
    eng.add_metric_collector(
        lambda m: pruned.append(m.pruned_files)
        if isinstance(m, ScanMetrics) and m.pruned_files > 0 else None
    )

    fact = "db.fuzz"
    eng.catalog.create_table(fact, SCHEMA, partition_spec=["cat"],
                             sort_order=["id"])
    eng.catalog.create_table("db.catdim", DIM_SCHEMA)
    eng.insert_into("db.catdim").dataframe(
        spark.createDataFrame(DIM_ROWS, schema=DIM_SCHEMA)).execute()

    con = duckdb.connect()
    con.execute(f"CREATE TABLE m ({SCHEMA.replace('STRING', 'VARCHAR')})")
    con.execute(f"CREATE TABLE catdim ({DIM_SCHEMA.replace('STRING', 'VARCHAR')})")
    con.executemany("INSERT INTO catdim VALUES (?,?,?)", DIM_ROWS)

    extra_cols: list[str] = []  # evolution-added columns (BIGINT, null)

    def mkdf(rows):
        # writes after an evolution carry the evolved width (NULL fill)
        if extra_cols:
            rows = [r + (None,) * len(extra_cols) for r in rows]
            sch = SCHEMA + "".join(f", {c} BIGINT" for c in extra_cols)
            return spark.createDataFrame(rows, schema=sch)
        return spark.createDataFrame(rows, schema=SCHEMA)

    def duck_insert(rows):
        if rows:
            pad = ",?" * len(extra_cols)
            con.executemany(
                f"INSERT INTO m VALUES (?,?,?,?,?{pad})",
                [r + (None,) * len(extra_cols) for r in rows])

    # seed data
    rows = _rand_rows(rng, 40)
    eng.insert_into(fact).dataframe(mkdf(rows)).execute()
    duck_insert(rows)

    def mirror_state():
        cols = "id, cat, ts, v, n" + "".join(f", {c}" for c in extra_cols)
        return con.execute(f"SELECT {cols} FROM m").fetchall()

    def snap_id() -> int:
        return eng.catalog.table(fact).meta.current_snapshot().snapshot_id

    history = [(snap_id(), mirror_state())]
    ops_log = ["seed append 40"]

    for opi in range(n_ops):
        # ---- one mutation -------------------------------------------
        roll = rng.random()
        if roll < 0.3:
            rows = _rand_rows(rng, rng.randrange(1, 25))
            eng.insert_into(fact).dataframe(mkdf(rows)).execute()
            duck_insert(rows)
            ops_log.append(f"append {len(rows)}")
        elif roll < 0.5:
            cats = sorted(rng.sample(CATS, rng.randint(1, 2)))
            rows = _rand_rows(rng, rng.randrange(0, 15), cats=cats)
            cs = ", ".join(f"'{c}'" for c in cats)
            (eng.insert_overwrite(fact).dataframe(mkdf(rows))
             .overwrite_by_filter_sql(f"cat IN ({cs})").execute())
            con.execute(f"DELETE FROM m WHERE cat IN ({cs})")
            duck_insert(rows)
            ops_log.append(f"overwrite {cats} {len(rows)}")
        elif roll < 0.7:
            cond = _rand_cond(rng)
            col, val = rng.choice([("v", rng.randrange(0, 400) / 4.0),
                                   ("n", rng.randrange(-50, 50))])
            (eng.update(fact).condition_sql(cond)
             .update_sets({col: val}).execute())
            con.execute(f"UPDATE m SET {col} = ? WHERE {cond}", [val])
            ops_log.append(f"update {col}={val} where {cond}")
        elif roll < 0.85:
            cond = _rand_cond(rng)
            eng.delete_from(fact).condition_sql(cond).execute()
            con.execute(f"DELETE FROM m WHERE {cond}")
            ops_log.append(f"delete where {cond}")
        else:
            # schema evolution mid-stream: new nullable BIGINT column;
            # later reads must project it as NULL across OLD files
            cname = f"x{len(extra_cols)}"
            eng.catalog.table(fact).add_column(cname, "BIGINT")
            con.execute(f"ALTER TABLE m ADD COLUMN {cname} BIGINT")
            extra_cols.append(cname)
            ops_log.append(f"add column {cname}")
            # evolution is metadata-only (no new snapshot for reads to
            # travel to) — skip history append below if unchanged
        history.append((snap_id(), mirror_state()))

        # ---- interleaved reads over the mutated table ----------------
        ctx = f"(ops: {ops_log})"
        cond = _rand_cond(rng)
        _compare(
            "filter+agg " + ctx, seed, opi,
            eng.sql(f"SELECT cat, COUNT(*) AS cnt, "
                    f"CAST(SUM(n) AS BIGINT) AS sn "
                    f"FROM db.fuzz WHERE {cond} GROUP BY cat"),
            con,
            f"SELECT cat, COUNT(*) AS cnt, CAST(SUM(n) AS BIGINT) AS sn "
            f"FROM m WHERE {cond} GROUP BY cat",
        )
        cat = rng.choice(CATS)
        k = rng.randrange(100, 900)
        cols = "f.id, f.cat, f.n" + "".join(f", f.{c}" for c in extra_cols)
        _compare(
            "partition filter " + ctx, seed, opi,
            eng.sql(f"SELECT {cols} FROM db.fuzz f "
                    f"WHERE f.cat = '{cat}' AND f.id < {k}"),
            con,
            f"SELECT {cols.replace('f.', '')} FROM m "
            f"WHERE cat = '{cat}' AND id < {k}",
        )
        pr = rng.choice([1, 2, 3])
        _compare(
            "dim join " + ctx, seed, opi,
            eng.sql("SELECT d.region, COUNT(*) AS cnt FROM db.fuzz f "
                    "JOIN db.catdim d ON f.cat = d.cat "
                    f"WHERE d.priority = {pr} AND f.id < {k} "
                    "GROUP BY d.region"),
            con,
            "SELECT d.region, COUNT(*) AS cnt FROM m f "
            "JOIN catdim d ON f.cat = d.cat "
            f"WHERE d.priority = {pr} AND f.id < {k} GROUP BY d.region",
        )
        # time travel to a random PRIOR snapshot: the mutating present
        # must not leak into the past
        sid, past = rng.choice(history)
        exp_cnt = len(past)
        exp_sum = sum(r[0] for r in past)
        got = eng.sql(
            f"SELECT COUNT(*) AS cnt, COALESCE(CAST(SUM(id) AS BIGINT), 0) "
            f"AS s FROM db.fuzz$snapshot_{sid}").collect()[0]
        assert (got["cnt"], got["s"]) == (exp_cnt, exp_sum), (
            f"seed {seed} op {opi}: time travel to {sid} diverged "
            f"({got['cnt']},{got['s']}) != ({exp_cnt},{exp_sum}) {ctx}")

    assert pruned, (
        f"seed {seed}: no scan ever pruned a file — extraction went dark "
        f"(ops: {ops_log})")
    con.close()


@pytest.mark.parametrize("seed", [5, 71, 312])
def test_mixed_read_write_matches_mirror(spark, tmp_path, seed):
    run_mixed_sequence(spark, str(tmp_path / "wh"), seed)
