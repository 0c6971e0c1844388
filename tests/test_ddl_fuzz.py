"""Differential textual-DDL state-machine fuzz (VERDICT r9 ask #3).

tests/test_dml_fuzz.py fuzzes the WRITE path through a fixed schema;
this harness fuzzes the SCHEMA lifecycle through ``engine.sql`` TEXT: a
seeded random sequence of CREATE TABLE / CTAS / INSERT INTO / ALTER
(ADD/DROP/RENAME/widen) / DROP TABLE statements runs against the
lakehouse AND a DuckDB mirror executing the equivalent standard DDL,
comparing the FULL state of every live table after every statement.

The bug classes under test are exactly the seams example tests can't
sweep: ddl_route misrouting (a statement silently going to spark.sql),
the sqldml grammar misparsing a column list / type payload, and the
schema-evolution interplay — rows written BEFORE an ADD COLUMN must
read NULL for it afterwards, DROP must not resurrect via old files,
RENAME must follow field ids not names, widen must preserve values —
across arbitrary interleavings, including DROP + re-CREATE of the same
name (metadata must not leak between incarnations).

Shared by the pinned pytest seeds below and
``scripts/fuzz_sweep.py --ddl`` (≥40-seed sweep).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.check_oracle import canon_rows  # noqa: E402

# (engine DDL type, duckdb type, value generator)
_TYPES = {
    "int": ("int", "INTEGER", lambda r: r.randrange(-1000, 1000)),
    "bigint": ("bigint", "BIGINT", lambda r: r.randrange(-10**9, 10**9)),
    "double": ("double", "DOUBLE", lambda r: r.randrange(0, 4000) / 8.0),
    "string": ("string", "VARCHAR", lambda r: r.choice(
        ["alpha", "beta", "gamma", "delta", "epsilon", "z'quote"]
    )),
}
_WIDEN = {"int": "bigint", "double": None, "bigint": None, "string": None}


class _Table:
    """Schema state one side tracks: ordered (name, type-key) pairs."""

    def __init__(self, cols: list[tuple[str, str]]):
        self.cols = list(cols)

    def names(self) -> list[str]:
        return [c for c, _ in self.cols]


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def run_ddl_sequence(spark, warehouse: str, seed: int, n_ops: int = 16) -> None:
    """Seeded DDL/DML statement sequence via engine.sql vs DuckDB mirror."""
    from swiftlake_spark.engine import SwiftLakeEngine

    rng = random.Random(seed)
    eng = SwiftLakeEngine(spark, warehouse=warehouse)
    con = duckdb.connect()
    # textual CREATE routes to the lakehouse only once the db holds a
    # table (ddl_route's positive-evidence rule) — the anchor provides it
    eng.catalog.create_table("ddlfz.anchor", "id BIGINT")

    tables: dict[str, _Table] = {}
    col_seq = [0]
    tbl_seq = [0]
    ops_log: list[str] = []

    def fresh_col() -> str:
        col_seq[0] += 1
        return f"c{col_seq[0]}"

    def fresh_table() -> str:
        tbl_seq[0] += 1
        return f"t{tbl_seq[0]}"

    def rand_cols(k: int) -> list[tuple[str, str]]:
        return [(fresh_col(), rng.choice(list(_TYPES))) for _ in range(k)]

    def rand_rows(t: _Table, k: int) -> list[tuple]:
        out = []
        for _ in range(k):
            out.append(tuple(
                None if rng.random() < 0.12 else _TYPES[ty][2](rng)
                for _, ty in t.cols
            ))
        return out

    def check(name: str) -> None:
        t = tables[name]
        sel = ", ".join(t.names()) or "1"
        eng_df = eng.sql(f"SELECT {sel} FROM ddlfz.{name}")
        e_cols, e_rows = canon_rows(
            eng_df.columns, [tuple(r) for r in eng_df.collect()]
        )
        res = con.execute(f"SELECT {sel} FROM {name}")
        d_cols, d_rows = canon_rows(
            [d[0] for d in res.description], res.fetchall()
        )
        assert e_cols == d_cols and e_rows == d_rows, (
            f"seed {seed}: table {name} diverged after "
            f"{ops_log[-1]!r}\n  engine cols={e_cols} rows={e_rows[:3]}\n"
            f"  duckdb cols={d_cols} rows={d_rows[:3]}\n  log: {ops_log}"
        )

    def check_all() -> None:
        for name in tables:
            check(name)

    def do_create() -> None:
        name = fresh_table()
        cols = rand_cols(rng.randrange(1, 4))
        ine = "IF NOT EXISTS " if rng.random() < 0.3 else ""
        ddl = ", ".join(f"{c} {_TYPES[ty][0]}" for c, ty in cols)
        eng.sql(f"CREATE TABLE {ine}ddlfz.{name} ({ddl})")
        con.execute(
            "CREATE TABLE {} ({})".format(
                name, ", ".join(f"{c} {_TYPES[ty][1]}" for c, ty in cols)
            )
        )
        tables[name] = _Table(cols)
        ops_log.append(f"create {name} ({ddl})")

    def do_ctas() -> None:
        src = rng.choice(list(tables))
        st = tables[src]
        name = fresh_table()
        keep = [c for c in st.cols if rng.random() < 0.8] or st.cols[:1]
        cond = ""
        num = [c for c, ty in keep if ty in ("int", "bigint", "double")]
        if num and rng.random() < 0.6:
            cond = f" WHERE {rng.choice(num)} IS NOT NULL"
        sel = ", ".join(c for c, _ in keep)
        q = f"SELECT {sel} FROM ddlfz.{src}{cond}"
        eng.sql(f"CREATE TABLE ddlfz.{name} AS {q}")
        con.execute(
            f"CREATE TABLE {name} AS SELECT {sel} FROM {src}{cond}"
        )
        tables[name] = _Table(keep)
        ops_log.append(f"ctas {name} from {src}{cond}")

    def do_insert(name: str) -> None:
        t = tables[name]
        rows = rand_rows(t, rng.randrange(1, 8))
        if rng.random() < 0.5 and len(t.cols) > 1:
            # explicit column subset: unlisted columns NULL-fill
            idx = sorted(
                rng.sample(range(len(t.cols)), rng.randrange(1, len(t.cols) + 1))
            )
            cols = [t.cols[i][0] for i in idx]
            vals = ", ".join(
                "(" + ", ".join(_sql_lit(r[i]) for i in idx) + ")" for r in rows
            )
            eng.sql(
                f"INSERT INTO ddlfz.{name} ({', '.join(cols)}) VALUES {vals}"
            )
            con.execute(
                f"INSERT INTO {name} ({', '.join(cols)}) VALUES {vals}"
            )
            ops_log.append(f"insert {name} cols={cols} rows={len(rows)}")
        else:
            vals = ", ".join(
                "(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows
            )
            eng.sql(f"INSERT INTO ddlfz.{name} VALUES {vals}")
            con.execute(f"INSERT INTO {name} VALUES {vals}")
            ops_log.append(f"insert {name} rows={len(rows)}")

    def do_alter(name: str) -> None:
        t = tables[name]
        verbs = ["add"]
        if len(t.cols) > 1:
            verbs += ["drop", "rename"]
        if any(_WIDEN[ty] for _, ty in t.cols):
            verbs.append("widen")
        verb = rng.choice(verbs)
        if verb == "add":
            if rng.random() < 0.4:
                new = rand_cols(rng.randrange(2, 4))
                ddl = ", ".join(f"{c} {_TYPES[ty][0]}" for c, ty in new)
                eng.sql(f"ALTER TABLE ddlfz.{name} ADD COLUMNS ({ddl})")
                for c, ty in new:
                    con.execute(
                        f"ALTER TABLE {name} ADD COLUMN {c} {_TYPES[ty][1]}"
                    )
                t.cols.extend(new)
                ops_log.append(f"alter {name} add columns ({ddl})")
            else:
                c, ty = rand_cols(1)[0]
                eng.sql(
                    f"ALTER TABLE ddlfz.{name} ADD COLUMN {c} {_TYPES[ty][0]}"
                )
                con.execute(
                    f"ALTER TABLE {name} ADD COLUMN {c} {_TYPES[ty][1]}"
                )
                t.cols.append((c, ty))
                ops_log.append(f"alter {name} add {c} {ty}")
        elif verb == "drop":
            i = rng.randrange(len(t.cols))
            c = t.cols[i][0]
            eng.sql(f"ALTER TABLE ddlfz.{name} DROP COLUMN {c}")
            con.execute(f"ALTER TABLE {name} DROP COLUMN {c}")
            t.cols.pop(i)
            ops_log.append(f"alter {name} drop {c}")
        elif verb == "rename":
            i = rng.randrange(len(t.cols))
            old = t.cols[i][0]
            new = fresh_col()
            eng.sql(f"ALTER TABLE ddlfz.{name} RENAME COLUMN {old} TO {new}")
            con.execute(f"ALTER TABLE {name} RENAME COLUMN {old} TO {new}")
            t.cols[i] = (new, t.cols[i][1])
            ops_log.append(f"alter {name} rename {old}->{new}")
        else:  # widen
            cands = [i for i, (_, ty) in enumerate(t.cols) if _WIDEN[ty]]
            i = rng.choice(cands)
            c, ty = t.cols[i]
            wide = _WIDEN[ty]
            eng.sql(f"ALTER TABLE ddlfz.{name} ALTER COLUMN {c} TYPE {wide}")
            con.execute(
                f"ALTER TABLE {name} ALTER COLUMN {c} "
                f"SET DATA TYPE {_TYPES[wide][1]}"
            )
            t.cols[i] = (c, wide)
            ops_log.append(f"alter {name} widen {c} {ty}->{wide}")

    def do_drop(name: str) -> None:
        ie = "IF EXISTS " if rng.random() < 0.3 else ""
        eng.sql(f"DROP TABLE {ie}ddlfz.{name}")
        con.execute(f"DROP TABLE {name}")
        del tables[name]
        ops_log.append(f"drop {name}")

    do_create()  # seed a table so every verb has something to chew on
    do_insert(next(iter(tables)))
    check_all()

    for _ in range(n_ops):
        roll = rng.random()
        if roll < 0.15 or not tables:
            do_create()
        elif roll < 0.3:
            do_ctas()
        elif roll < 0.6:
            do_insert(rng.choice(list(tables)))
        elif roll < 0.88:
            do_alter(rng.choice(list(tables)))
        else:
            do_drop(rng.choice(list(tables)))
        check_all()

    # lifecycle tail: DROP + re-CREATE of the same name must start clean
    # (no schema or data leaking from the previous incarnation)
    if tables:
        name = rng.choice(list(tables))
        do_drop(name)
        cols = rand_cols(2)
        eng.sql(
            "CREATE TABLE ddlfz.{} ({})".format(
                name, ", ".join(f"{c} {_TYPES[ty][0]}" for c, ty in cols)
            )
        )
        con.execute(
            "CREATE TABLE {} ({})".format(
                name, ", ".join(f"{c} {_TYPES[ty][1]}" for c, ty in cols)
            )
        )
        tables[name] = _Table(cols)
        ops_log.append(f"recreate {name}")
        do_insert(name)
        check(name)


@pytest.mark.parametrize("seed", [3, 17, 404])
def test_ddl_sequence_matches_mirror(spark, tmp_path, seed):
    run_ddl_sequence(spark, str(tmp_path / "wh"), seed)
