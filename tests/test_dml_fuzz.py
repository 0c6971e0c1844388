"""Differential DML state-machine fuzz.

The read path is fuzzed by tests/test_sql_fuzz.py and
tests/test_engine_sql_fuzz.py; this harness fuzzes the WRITE path: a
seeded random sequence of append / overwrite-by-filter / update /
delete ops runs against a partitioned native table AND a DuckDB mirror
executing the equivalent plain SQL, comparing the FULL table state
after every commit.  A copy-on-write bug — a file dropped that held
non-matching rows, a 3VL slip that deletes NULL-evaluating rows, an
overwrite that misses a partition — shows up as a state diff at the op
that introduced it (the failure message pins seed + op index + op).

Every state in the history is also recorded against its snapshot id,
and after the run a sample of old snapshots is re-read via time travel
— catching any COW op that rewrites files in place instead of creating
new ones (snapshot-isolation regression the per-op diff can't see).

Conditions come from a small generator emitting only shapes the
pushdown grammar (dml/sqlfilter.py) accepts, so the engine side runs
them through condition_sql — the same path users hit.
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

SCHEMA = "id BIGINT, cat STRING, ts TIMESTAMP, v DOUBLE, n BIGINT"
COLS = ["id", "cat", "ts", "v", "n"]
CATS = ["A", "B", "C", "D", "E"]


def _rand_rows(rng: random.Random, k: int, cats=CATS):
    rows = []
    for _ in range(k):
        rows.append((
            rng.randrange(0, 1000),
            rng.choice(cats),
            dt.datetime(2024, 1, 1) + dt.timedelta(hours=rng.randrange(0, 2000)),
            None if rng.random() < 0.1 else rng.randrange(0, 400) / 4.0,
            None if rng.random() < 0.15 else rng.randrange(-50, 50),
        ))
    return rows


def _rand_cond(rng: random.Random) -> str:
    def leaf() -> str:
        roll = rng.random()
        if roll < 0.2:
            return f"cat = '{rng.choice(CATS)}'"
        if roll < 0.35:
            cs = ", ".join(f"'{c}'" for c in sorted(rng.sample(CATS, rng.randint(1, 3))))
            return f"cat IN ({cs})"
        if roll < 0.5:
            a = rng.randrange(0, 900)
            return f"id BETWEEN {a} AND {a + rng.randrange(0, 300)}"
        if roll < 0.6:
            return f"n IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
        if roll < 0.75:
            op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
            return f"v {op} {rng.randrange(0, 400) / 4.0}"
        op = rng.choice(["<", ">", "="])
        return f"n {op} {rng.randrange(-50, 50)}"

    cond = leaf()
    for _ in range(rng.randrange(0, 2)):
        cond = f"({cond}) {rng.choice(['AND', 'OR'])} ({leaf()})"
    return cond


class _Mirror:
    """DuckDB twin executing the plain-SQL equivalent of each op."""

    def __init__(self) -> None:
        self.con = duckdb.connect()
        self.con.execute(
            "CREATE TABLE m (id BIGINT, cat VARCHAR, ts TIMESTAMP, "
            "v DOUBLE, n BIGINT)"
        )

    def append(self, rows) -> None:
        if rows:
            self.con.executemany("INSERT INTO m VALUES (?,?,?,?,?)", rows)

    def overwrite(self, cats, rows) -> None:
        cs = ", ".join(f"'{c}'" for c in cats)
        self.con.execute(f"DELETE FROM m WHERE cat IN ({cs})")
        self.append(rows)

    def update(self, cond, col, val) -> None:
        self.con.execute(f"UPDATE m SET {col} = ? WHERE {cond}", [val])

    def delete(self, cond) -> None:
        self.con.execute(f"DELETE FROM m WHERE {cond}")

    def scd1_snapshot(self, cats, rows) -> None:
        # Reference parity (scd1_merge.xml snapshotBasedMergeResults +
        # WriteUtil.checkMergeCardinality): each IN-FILTER target row
        # whose key appears in the source is REPLACED by its source row
        # — a source key matching k target rows therefore emits k
        # copies, because the cardinality check only rejects ONE target
        # row matching MULTIPLE source rows, not the converse (dup
        # target keys arise from plain appends / partition-column
        # updates).  In-filter rows with keys absent from the source
        # drop; source keys absent from the in-filter target insert
        # once.  (Found by fuzz seed 40228: "final state IS the source"
        # under-modeled the duplicate-target-key corner by one row.)
        cs = ", ".join(f"'{c}'" for c in cats)
        in_filter = self.con.execute(
            f"SELECT id FROM m WHERE cat IN ({cs})").fetchall()
        src_by_key = {r[0]: r for r in rows}
        replaced = [src_by_key[i] for (i,) in in_filter if i in src_by_key]
        inserted = [r for r in rows
                    if r[0] not in {i for (i,) in in_filter}]
        self.con.execute(f"DELETE FROM m WHERE cat IN ({cs})")
        self.append(replaced + inserted)

    def merge(self, cats, rows, del_pred, upd_pred, bs_del_cond=None,
              match_pred=None) -> None:
        """Generic merge twin (dml/merge.py SQL semantics, boundary =
        cat IN cats with the default source filter): matched candidates
        walk DELETE-if / UPDATE-if (whole-row replace) in clause order;
        unmatched source rows insert; with ``bs_del_cond`` (SQL over
        target columns) candidate rows matching NO source id fire the
        WHEN NOT MATCHED BY SOURCE delete — 3VL included, since the
        condition runs as a plain DuckDB DELETE WHERE.  Predicates are
        the Python twins of the engine's source-only clause conditions.
        ``match_pred`` is the ON-residual twin (r10
        ``match_condition``): a source row failing it matches nothing —
        it inserts unconditionally, and its target id (absent from the
        passing ids) walks the by-source clause."""
        src = [r for r in rows if r[1] in cats]  # boundary filters source
        if match_pred is not None:
            src_fail = [r for r in src if not match_pred(r)]
            src = [r for r in src if match_pred(r)]
        else:
            src_fail = []
        ids = [r[0] for r in src]
        cs = ", ".join(f"'{c}'" for c in cats)
        if bs_del_cond is not None:
            # by-source rows are disjoint from every other clause's rows
            # (their ids are absent from the source), so order is free
            not_in = (
                f"AND id NOT IN ({', '.join(str(i) for i in ids)}) " if ids else ""
            )
            self.con.execute(
                f"DELETE FROM m WHERE cat IN ({cs}) {not_in}AND ({bs_del_cond})"
            )
        if not ids:
            self.append(src_fail)  # residual-failed rows still insert
            return
        marks = ", ".join(str(i) for i in ids)
        # per-id match COUNT: appends can duplicate an id inside the
        # boundary, and the engine updates EVERY matched copy (each
        # target row classifies independently) — the mirror must too
        matched = dict(
            self.con.execute(
                f"SELECT id, COUNT(*) FROM m WHERE cat IN ({cs}) "
                f"AND id IN ({marks}) GROUP BY id"
            ).fetchall()
        )
        del_ids = [r[0] for r in src if r[0] in matched and del_pred(r)]
        upd = [
            r for r in src
            if r[0] in matched and not del_pred(r) and upd_pred(r)
        ]
        ins = [r for r in src if r[0] not in matched] + src_fail
        gone = del_ids + [r[0] for r in upd]
        if gone:
            gs = ", ".join(str(i) for i in gone)
            self.con.execute(
                f"DELETE FROM m WHERE cat IN ({cs}) AND id IN ({gs})"
            )
        self.append([r for r in upd for _ in range(matched[r[0]])] + ins)

    def scd1_changes(self, cats, rows_with_op) -> None:
        # matched keys within the filter are replaced or deleted; other
        # source rows insert; target rows outside the filter untouched
        cs = ", ".join(f"'{c}'" for c in cats)
        ids = [r[0] for r in rows_with_op]
        if ids:
            marks = ", ".join(str(i) for i in ids)
            self.con.execute(
                f"DELETE FROM m WHERE cat IN ({cs}) AND id IN ({marks})"
            )
        self.append([r[:-1] for r in rows_with_op if r[-1] != "D"])

    def state(self):
        return self.con.execute(f"SELECT {', '.join(COLS)} FROM m").fetchall()


def _engine_state(eng, name):
    df = eng.catalog.load(name).select(*COLS)
    return [tuple(r) for r in df.collect()]


def _diff(engine_rows, duck_rows) -> str | None:
    _, er = canon_rows(COLS, engine_rows)
    _, dr = canon_rows(COLS, duck_rows)
    if len(er) != len(dr):
        return f"rowcount engine={len(er)} duckdb={len(dr)}"
    for a, b in zip(er, dr):
        if a != b:
            return f"first differing row engine={a} duckdb={b}"
    return None


def run_sequence(spark, warehouse: str, seed: int, n_ops: int = 14) -> None:
    """Seeded op sequence against table + mirror; raises on divergence.
    Shared by the pytest seeds below and scripts/fuzz_sweep.py --dml."""
    from swiftlake_spark.engine import SwiftLakeEngine

    rng = random.Random(seed)
    eng = SwiftLakeEngine(spark, warehouse=warehouse)
    name = "db.fuzz"
    eng.catalog.create_table(
        name, SCHEMA, partition_spec=["cat"], sort_order=["id"]
    )
    mirrors = {"main": _Mirror()}
    history: list[tuple[str, int, list]] = []  # (branch, sid, duckdb state)

    def snap_id(br: str = "main") -> int:
        return eng.catalog.table(name).meta.current_snapshot(br).snapshot_id

    def engine_state(br: str):
        ref = name if br == "main" else f"{name}$branch_{br}"
        return _engine_state(eng, ref)

    def mkdf(rows):
        return spark.createDataFrame(rows, schema=SCHEMA)

    ops_log = []
    # seed data so early conditional ops have something to chew on
    rows = _rand_rows(rng, 40)
    eng.insert_into(name).dataframe(mkdf(rows)).execute()
    mirrors["main"].append(rows)
    ops_log.append("seed append 40")
    history.append(("main", snap_id(), mirrors["main"].state()))

    # branch off: ~30% of ops land on dev; after every op BOTH branches
    # must match their mirrors (cross-branch contamination is the bug
    # class under test), and maintenance must never disturb either
    eng.catalog.table(name).create_branch("dev")
    mirrors["dev"] = _Mirror()
    mirrors["dev"].append(mirrors["main"].state())

    def _scd_source(rng, cats, with_op: bool):
        k = rng.randrange(1, 15)
        ids = rng.sample(range(0, 1000), k)  # cardinality: unique keys
        rows = [(i, *r[1:]) for i, r in zip(ids, _rand_rows(rng, k, cats=cats))]
        if with_op:
            rows = [(*r, "D" if rng.random() < 0.3 else "U") for r in rows]
        return rows

    for opi in range(n_ops):
        br = "dev" if rng.random() < 0.3 else "main"
        mirror = mirrors[br]
        roll = rng.random()
        if roll < 0.25:
            rows = _rand_rows(rng, rng.randrange(1, 30))
            if br == "main" and rng.random() < 0.5:
                # textual INSERT INTO ... SELECT (dml/sqldml.py in loop)
                mkdf(rows).createOrReplaceTempView("fuzz_ins_src")
                eng.sql(f"INSERT INTO {name} SELECT * FROM fuzz_ins_src")
                via = "sql"
            else:
                eng.insert_into(name).dataframe(mkdf(rows)).branch(br).execute()
                via = "api"
            mirror.append(rows)
            ops_log.append(f"[{br}] append({via}) {len(rows)}")
        elif roll < 0.4:
            cats = sorted(rng.sample(CATS, rng.randint(1, 2)))
            rows = _rand_rows(rng, rng.randrange(0, 20), cats=cats)
            cs = ", ".join(f"'{c}'" for c in cats)
            (eng.insert_overwrite(name).dataframe(mkdf(rows))
             .overwrite_by_filter_sql(f"cat IN ({cs})").branch(br).execute())
            mirror.overwrite(cats, rows)
            ops_log.append(f"[{br}] overwrite cats={cats} rows={len(rows)}")
        elif roll < 0.55:
            cats = sorted(rng.sample(CATS, rng.randint(1, 2)))
            cs = ", ".join(f"'{c}'" for c in cats)
            if rng.random() < 0.5:
                rows = _scd_source(rng, cats, with_op=False)
                (eng.apply_snapshot_as_scd1(name)
                 .table_filter_sql(f"cat IN ({cs})")
                 .source_dataframe(mkdf(rows)).key_columns(["id"])
                 .branch(br).execute())
                mirror.scd1_snapshot(cats, rows)
                ops_log.append(f"[{br}] scd1 snapshot cats={cats} rows={len(rows)}")
            else:
                rows = _scd_source(rng, cats, with_op=True)
                (eng.apply_changes_as_scd1(name)
                 .table_filter_sql(f"cat IN ({cs})")
                 .source_dataframe(spark.createDataFrame(
                     rows, schema=SCHEMA + ", op STRING"))
                 .key_columns(["id"])
                 .operation_type_column("op", "D").branch(br).execute())
                mirror.scd1_changes(cats, rows)
                ops_log.append(f"[{br}] scd1 changes cats={cats} rows={len(rows)}")
        elif roll < 0.67:
            # generic MERGE: conditional delete + conditional whole-row
            # update + insert, bounded to 1-2 partitions.  Clause
            # conditions reference only the source so the mirror's
            # Python predicates are exact 3VL twins (NULL → no fire).
            cats = sorted(rng.sample(CATS, rng.randint(1, 2)))
            cs = ", ".join(f"'{c}'" for c in cats)
            rows = _scd_source(rng, cats, with_op=False)
            thr = rng.randrange(-50, 50)
            vthr = rng.randrange(0, 400) / 4.0
            # ~50%: add WHEN NOT MATCHED BY SOURCE DELETE with a
            # 3VL-sensitive condition (NULL n → no fire) — candidate
            # rows absent from the source are pruned
            bs_thr = rng.randrange(-50, 50) if rng.random() < 0.5 else None
            # ~30%: ON-residual over the source (r10 match_condition) —
            # 3VL-sensitive (NULL v → pair does not match → insert +
            # by-source walk)
            res_thr = rng.randrange(0, 400) / 4.0 if rng.random() < 0.3 else None
            if br == "main" and rng.random() < 0.5:
                # textual path: same builder underneath, but the MERGE
                # grammar (dml/sqldml.py — ON analysis, alias rewrite,
                # clause split) is in the loop.  Source rows are all in
                # cats by construction, so the boundary-as-ON-conjunct
                # semantics (filter_source(False)) coincide with the
                # builder path's filtered source.
                mkdf(rows).createOrReplaceTempView("fuzz_merge_src")
                # keys may not appear in SET (builder guard); id is
                # equal across the pair anyway so this IS whole-row
                sets = ", ".join(f"{c} = s.{c}" for c in COLS if c != "id")
                bs_sql = (
                    f"WHEN NOT MATCHED BY SOURCE AND t.n < {bs_thr} THEN DELETE"
                    if bs_thr is not None else ""
                )
                res_sql = f"AND s.v < {res_thr} " if res_thr is not None else ""
                eng.sql(
                    f"MERGE INTO {name} AS t USING fuzz_merge_src AS s "
                    f"ON t.id = s.id AND t.cat IN ({cs}) {res_sql}"
                    f"WHEN MATCHED AND s.n > {thr} THEN DELETE "
                    f"WHEN MATCHED AND s.v <= {vthr} THEN UPDATE SET {sets} "
                    f"WHEN NOT MATCHED THEN INSERT * {bs_sql}"
                )
                via = "sql"
            else:
                b = (
                    eng.merge_into(name)
                    .using(mkdf(rows))
                    .key_columns(["id"])
                    .table_filter_sql(f"cat IN ({cs})")
                    .when_matched_delete(condition=f"source.n > {thr}")
                    .when_matched_update(condition=f"source.v <= {vthr}")
                    .when_not_matched_insert()
                    .branch(br)
                )
                if bs_thr is not None:
                    b = b.when_not_matched_by_source_delete(
                        condition=f"target.n < {bs_thr}"
                    )
                if res_thr is not None:
                    b = b.match_condition(f"source.v < {res_thr}")
                b.execute()
                via = "api"
            mirror.merge(
                cats,
                rows,
                del_pred=lambda r, t=thr: r[4] is not None and r[4] > t,
                upd_pred=lambda r, t=vthr: r[3] is not None and r[3] <= t,
                bs_del_cond=None if bs_thr is None else f"n < {bs_thr}",
                match_pred=None if res_thr is None else (
                    lambda r, t=res_thr: r[3] is not None and r[3] < t
                ),
            )
            ops_log.append(
                f"[{br}] merge({via}) cats={cats} rows={len(rows)} "
                f"del:n>{thr} upd:v<={vthr} bs_del:"
                f"{'off' if bs_thr is None else f'n<{bs_thr}'} res:"
                f"{'off' if res_thr is None else f'v<{res_thr}'}"
            )
        elif roll < 0.84:
            cond = _rand_cond(rng)
            col, val = rng.choice([
                ("v", rng.randrange(0, 400) / 4.0),
                ("n", rng.randrange(-50, 50)),
                ("cat", None),  # placeholder, replaced below
            ])
            if col == "cat":
                # updating the PARTITION column moves rows across
                # partitions — the nastiest COW case
                val = rng.choice(CATS)
            if br == "main" and rng.random() < 0.5:
                # textual path: same builder underneath, but the parse
                # (dml/sqldml.py) is in the loop; ~15% WHERE-less (r10:
                # standard full-table update)
                lit = f"'{val}'" if isinstance(val, str) else repr(val)
                if rng.random() < 0.15:
                    cond = "TRUE"
                    eng.sql(f"UPDATE {name} SET {col} = {lit}")
                else:
                    eng.sql(f"UPDATE {name} SET {col} = {lit} WHERE {cond}")
                via = "sql"
            else:
                (eng.update(name).condition_sql(cond)
                 .update_sets({col: val}).branch(br).execute())
                via = "api"
            mirror.update(cond, col, val)
            ops_log.append(f"[{br}] update({via}) {col}={val} where {cond}")
        else:
            cond = _rand_cond(rng)
            if br == "main" and rng.random() < 0.5:
                if rng.random() < 0.08:
                    # r10: bare DELETE = metadata-only truncate
                    cond = "TRUE"
                    eng.sql(f"DELETE FROM {name}")
                else:
                    eng.sql(f"DELETE FROM {name} WHERE {cond}")
                via = "sql"
            else:
                eng.delete_from(name).condition_sql(cond).branch(br).execute()
                via = "api"
            mirror.delete(cond)
            ops_log.append(f"[{br}] delete({via}) where {cond}")

        for b in ("main", "dev"):
            d = _diff(engine_state(b), mirrors[b].state())
            assert d is None, (
                f"seed {seed} diverged on branch {b} at op {opi}: "
                f"{ops_log[-1]}\n  {d}\n  full op log: {ops_log}"
            )
        history.append((br, snap_id(br), mirror.state()))

        if rng.random() < 0.2:
            # maintenance mid-flight: compaction on a random branch, then
            # snapshot expiry + aggressive vacuum — none of it may
            # disturb either branch head (vacuum keeps every ref target;
            # expired snapshots drop from the travel history)
            from swiftlake_spark.tables.maintenance import (
                compact,
                expire_snapshots,
                vacuum,
            )

            t = eng.catalog.table(name)
            compact(t, branch=rng.choice(["main", "dev"]))
            expired = set(expire_snapshots(t.refresh(), keep_last=3))
            vacuum(t.refresh(), older_than_ms=0)
            history = [h for h in history if h[1] not in expired]
            for b in ("main", "dev"):
                d = _diff(engine_state(b), mirrors[b].state())
                assert d is None, (
                    f"seed {seed}: maintenance after op {opi} disturbed "
                    f"branch {b}: {d}"
                )
            ops_log.append("maintenance")

    # ---- time travel: COW must never have mutated an old snapshot ----
    for _br, sid, expected in rng.sample(history, min(4, len(history))):
        got = [
            tuple(r)
            for r in eng.catalog.table(name).scan(snapshot_id=sid)
            .select(*COLS).collect()
        ]
        d = _diff(got, expected)
        assert d is None, f"seed {seed}: snapshot {sid} changed after the fact: {d}"


@pytest.mark.parametrize("seed", [11, 42, 1007, 40228])
def test_dml_sequence_matches_mirror(spark, tmp_path, seed):
    run_sequence(spark, str(tmp_path / "wh"), seed)


@pytest.mark.parametrize("seed", [7, 23])
def test_concurrent_dml_serial_replay(spark, tmp_path, seed):
    """Concurrent writers under SERIALIZABLE isolation must be
    equivalent to SOME serial order — and the commit lineage names it.
    Threads fire random append/delete/update ops; serializable COW ops
    that lose a race abort with ValidationError and are re-executed from
    scratch (fresh base snapshot), exactly as a user would.  Afterwards
    every successful op is replayed into DuckDB in snapshot-lineage
    order; any divergence means a committed op saw a state other than
    its parent snapshot (isolation bug) or clobbered a concurrent
    commit (lost update)."""
    import threading

    from swiftlake_spark.engine import SwiftLakeEngine
    from swiftlake_spark.tables.metadata import CommitConflict, ValidationError

    rng = random.Random(seed)
    eng = SwiftLakeEngine(spark, warehouse=str(tmp_path / "wh"))
    name = "db.cfuzz"
    eng.catalog.create_table(name, SCHEMA, partition_spec=["cat"])
    seed_rows = _rand_rows(rng, 30)
    eng.insert_into(name).dataframe(
        spark.createDataFrame(seed_rows, schema=SCHEMA)
    ).execute()

    # pre-generate each thread's op list (rng is not thread-safe)
    def gen_op(r: random.Random):
        roll = r.random()
        if roll < 0.45:
            return ("append", _rand_rows(r, r.randrange(1, 12)))
        if roll < 0.75:
            return ("delete", _rand_cond(r))
        col, val = r.choice([("v", r.randrange(0, 400) / 4.0),
                             ("n", r.randrange(-50, 50))])
        return ("update", (_rand_cond(r), col, val))

    thread_ops = [
        [(f"t{t}op{i}", gen_op(random.Random(seed * 100 + t * 10 + i)))
         for i in range(4)]
        for t in range(3)
    ]
    ops_by_uid = {uid: op for ops in thread_ops for uid, op in ops}
    errors: list = []

    # a COW op that matches nothing is a NO-OP: it returns the current
    # snapshot without committing.  Tagging each execution with a unique
    # op_id in the snapshot summary lets the lineage walk identify which
    # snapshots are real commits of which op — a no-op's returned
    # snapshot carries someone else's (or no) op_id and drops out.
    def run_ops(ops):
        try:
            for uid, op in ops:
                meta = {"op_id": uid}
                for attempt in range(6):
                    try:
                        if op[0] == "append":
                            (eng.insert_into(name).dataframe(
                                spark.createDataFrame(op[1], schema=SCHEMA))
                                .snapshot_metadata(meta).execute())
                        elif op[0] == "delete":
                            (eng.delete_from(name)
                             .condition_sql(op[1])
                             .snapshot_metadata(meta)
                             .isolation_level("serializable").execute())
                        else:
                            cond, col, val = op[1]
                            (eng.update(name).condition_sql(cond)
                             .update_sets({col: val})
                             .snapshot_metadata(meta)
                             .isolation_level("serializable").execute())
                        break
                    except (ValidationError, CommitConflict):
                        # ValidationError: serializable saw a conflicting
                        # concurrent add.  CommitConflict: a file this COW
                        # planned to replace was replaced first.  Both are
                        # the designed "recompute from a fresh snapshot"
                        # signals — re-execute the whole op, as a client
                        # would (reference CommitFailedException contract).
                        if attempt == 5:
                            raise
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=run_ops, args=(ops,))
               for ops in thread_ops]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # lineage order: walk parents from the final snapshot
    meta = eng.catalog.table(name).meta
    by_id = {s.snapshot_id: s for s in meta.snapshots}
    chain = []
    cur = by_id[meta.refs["main"]]
    while cur is not None:
        chain.append(cur)
        cur = by_id.get(cur.parent_id)
    chain.reverse()
    replay_order = [s.summary["op_id"] for s in chain
                    if s.summary.get("op_id") in ops_by_uid]
    # appends can never no-op: every one must appear exactly once
    append_uids = [u for u, op in ops_by_uid.items() if op[0] == "append"]
    assert sorted(u for u in replay_order
                  if ops_by_uid[u][0] == "append") == sorted(append_uids)
    assert len(replay_order) == len(set(replay_order)), "op committed twice"

    mirror = _Mirror()
    mirror.append(seed_rows)
    for uid in replay_order:
        op = ops_by_uid[uid]
        if op[0] == "append":
            mirror.append(op[1])
        elif op[0] == "delete":
            mirror.delete(op[1])
        else:
            cond, col, val = op[1]
            mirror.update(cond, col, val)
    d = _diff(_engine_state(eng, name), mirror.state())
    assert d is None, f"serial replay diverged: {d}"
