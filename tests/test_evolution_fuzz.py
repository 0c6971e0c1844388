"""Schema-evolution differential fuzz: DDL interleaved with DML.

The evolution property tests pin value identity for single projections;
this fuzz drives random SEQUENCES — add / drop / rename / widen /
reorder / partition-spec change interleaved with appends, updates and
deletes — against a DuckDB mirror applying the equivalent ALTER TABLE.
The mirror's plain-SQL semantics are exactly the engine's documented
contract:

- added columns NULL-fill rows written before the add;
- drop-then-re-add of the same NAME is a NEW field (the engine retires
  field IDs, so old data stays invisible — same as DROP+ADD in SQL);
- rename keeps values (ID-based resolution ≙ SQL rename);
- widen reads old narrow files at the new type (≙ ALTER TYPE);
- reorder is metadata-only (canon compare is name-keyed, so the check
  is that reads still WORK and values are unmoved);
- partition-spec changes affect only the layout of subsequent writes,
  never visible rows.

Full-state equality over the CURRENT schema is asserted after every op,
so the failure message pins the op that corrupted a projection.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.check_oracle import canon_rows  # noqa: E402

CATS = ["A", "B", "C"]

_DUCK_TYPES = {"bigint": "BIGINT", "int": "INTEGER", "double": "DOUBLE",
               "float": "FLOAT", "string": "VARCHAR",
               "timestamp": "TIMESTAMP"}
_WIDEN = {"int": "bigint", "float": "double"}


def _gen_value(rng: random.Random, dtype: str):
    if rng.random() < 0.12:
        return None
    if dtype in ("bigint", "int"):
        return rng.randrange(-1000, 1000)
    if dtype in ("double", "float"):
        return rng.randrange(0, 4000) / 8.0
    if dtype == "timestamp":
        return dt.datetime(2024, 1, 1) + dt.timedelta(hours=rng.randrange(0, 999))
    return rng.choice(["x", "yy", "zzz", "Q'Q", ""])  # incl. quote + empty


class _Schema:
    """Python-side schema state shared by generator, engine and mirror."""

    def __init__(self) -> None:
        self.cols: list[tuple[str, str]] = [
            ("id", "bigint"), ("cat", "string"), ("v", "double"),
            ("n", "int"),
        ]
        self._next = 0

    def names(self):
        return [c for c, _ in self.cols]

    def ddl(self) -> str:
        return ", ".join(f"{c} {t.upper()}" for c, t in self.cols)

    def fresh_name(self, rng, dropped: list[str]) -> str:
        if dropped and rng.random() < 0.4:
            return rng.choice(dropped)  # re-add a retired name
        self._next += 1
        return f"c{self._next}"

    def droppable(self):
        return [c for c, _ in self.cols if c not in ("id", "cat")]

    def widenable(self):
        return [(c, t) for c, t in self.cols if t in _WIDEN]


@pytest.mark.parametrize("seed", [13, 88, 404])
def test_evolution_sequences_match_mirror(spark, tmp_path, seed):
    from swiftlake_spark.engine import SwiftLakeEngine

    rng = random.Random(seed)
    eng = SwiftLakeEngine(spark, warehouse=str(tmp_path / "wh"))
    name = "db.evo"
    sch = _Schema()
    t = eng.catalog.create_table(name, sch.ddl(), partition_spec=["cat"])
    con = duckdb.connect()
    con.execute(f"CREATE TABLE m ({', '.join(f'{c} {_DUCK_TYPES[ty]}' for c, ty in sch.cols)})")

    def _append(k: int):
        rows = [
            tuple(
                rng.choice(CATS) if c == "cat"
                else (rng.randrange(0, 2000) if c == "id"
                      else _gen_value(rng, ty))
                for c, ty in sch.cols
            )
            for _ in range(k)
        ]
        eng.insert_into(name).dataframe(
            spark.createDataFrame(rows, schema=sch.ddl())
        ).execute()
        marks = ", ".join("?" for _ in sch.cols)
        # explicit column list: the mirror's physical order diverges from
        # the tracked order after reorders (ALTER ADD appends)
        con.executemany(
            f"INSERT INTO m ({', '.join(sch.names())}) VALUES ({marks})", rows
        )

    _append(30)
    dropped: list[str] = []
    ops_log: list[str] = []

    for opi in range(14):
        t = eng.catalog.table(name)
        roll = rng.random()
        if roll < 0.14:
            cname = sch.fresh_name(rng, dropped)
            ctype = rng.choice(["bigint", "int", "double", "string", "timestamp"])
            t.add_column(cname, ctype)
            con.execute(f"ALTER TABLE m ADD COLUMN {cname} {_DUCK_TYPES[ctype]}")
            sch.cols.append((cname, ctype))
            if cname in dropped:
                dropped.remove(cname)
            ops_log.append(f"add {cname} {ctype}")
        elif roll < 0.26 and sch.droppable():
            cname = rng.choice(sch.droppable())
            t.drop_column(cname)
            con.execute(f"ALTER TABLE m DROP COLUMN {cname}")
            sch.cols = [(c, ty) for c, ty in sch.cols if c != cname]
            dropped.append(cname)
            ops_log.append(f"drop {cname}")
        elif roll < 0.38 and sch.droppable():
            old = rng.choice(sch.droppable())
            new = f"r{sch._next}_{old}"
            sch._next += 1
            t.rename_column(old, new)
            con.execute(f"ALTER TABLE m RENAME COLUMN {old} TO {new}")
            sch.cols = [(new if c == old else c, ty) for c, ty in sch.cols]
            ops_log.append(f"rename {old}->{new}")
        elif roll < 0.48 and sch.widenable():
            cname, ty = rng.choice(sch.widenable())
            wide = _WIDEN[ty]
            t.widen_column(cname, wide)
            con.execute(f"ALTER TABLE m ALTER COLUMN {cname} SET DATA TYPE {_DUCK_TYPES[wide]}")
            sch.cols = [(c, wide if c == cname else tt) for c, tt in sch.cols]
            ops_log.append(f"widen {cname} {ty}->{wide}")
        elif roll < 0.56:
            perm = sch.names()
            rng.shuffle(perm)
            t.reorder_columns(perm)
            by = dict(sch.cols)
            sch.cols = [(c, by[c]) for c in perm]
            ops_log.append("reorder")
        elif roll < 0.62:
            spec = rng.choice([["cat"], ["cat", "bucket(2, id)"], []])
            t.update_partition_spec(spec)
            ops_log.append(f"respec {spec}")
        elif roll < 0.82:
            _append(rng.randrange(1, 15))
            ops_log.append("append")
        elif roll < 0.92:
            a = rng.randrange(0, 1800)
            cond = f"id BETWEEN {a} AND {a + 300}"
            if sch.droppable() and rng.random() < 0.3:
                extra = rng.choice(sch.droppable())
                cond += f" AND {extra} IS NOT NULL"
            eng.delete_from(name).condition_sql(cond).execute()
            con.execute(f"DELETE FROM m WHERE {cond}")
            ops_log.append(f"delete {cond}")
        else:
            targets = [(c, ty) for c, ty in sch.cols if c not in ("id", "cat")]
            if not targets:
                _append(3)
                ops_log.append("append (no update targets)")
                continue
            cname, ctype = rng.choice(targets)
            val = _gen_value(rng, ctype)
            a = rng.randrange(0, 1800)
            cond = f"id BETWEEN {a} AND {a + 400}"
            eng.update(name).condition_sql(cond).update_sets(
                {cname: val}).execute()
            con.execute(f"UPDATE m SET {cname} = ? WHERE {cond}", [val])
            ops_log.append(f"update {cname}={val!r} where {cond}")

        cols = sch.names()
        got = [tuple(r) for r in
               eng.catalog.load(name).select(*cols).collect()]
        exp = con.execute(f"SELECT {', '.join(cols)} FROM m").fetchall()
        _, gr = canon_rows(cols, got)
        _, er = canon_rows(cols, exp)
        assert len(gr) == len(er) and all(a == b for a, b in zip(gr, er)), (
            f"seed {seed} diverged at op {opi} ({ops_log[-1]}); ops: {ops_log}\n"
            f"  first diff: "
            f"{next(((a, b) for a, b in zip(gr, er) if a != b), (len(gr), len(er)))}"
        )
