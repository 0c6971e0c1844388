"""SCD2 differential fuzz against an independent Python model.

The SCD2 matrix tests pin hand-picked cases; this fuzz drives randomized
snapshot- and changes-mode merges (random boundaries, sources, deletes,
value churn incl. NULLs) against a from-scratch reimplementation of the
documented semantics (dml/scd2.py header, scd2_merge.xml):

- candidates are CURRENT versions (end IS NULL) whose row passes the
  boundary filter and whose start < ts;
- snapshot mode: I (source key with no candidate), U (tracking columns
  differ, null-aware), D (candidate missing from source), N untouched;
- changes mode: op=delete closes, upsert closes+inserts on difference,
  re-sent identical rows are suppressed (N-S), unmatched upserts insert;
- closing stamps end := ts / flag := False; new versions start := ts,
  end := NULL, flag := True; closed history is never touched.

Full version-table equality (every column, periods and flag included)
is asserted after each merge, so a drift in any classification bucket
fails at the op that introduced it.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.check_oracle import canon_rows  # noqa: E402

CATS = ["A", "B", "C", "D"]
DATA_COLS = ["id", "cat", "v", "n"]
ALL_COLS = DATA_COLS + ["effective_start", "effective_end", "is_current"]
DDL = ("id BIGINT, cat STRING, v DOUBLE, n BIGINT, "
       "effective_start TIMESTAMP, effective_end TIMESTAMP, "
       "is_current BOOLEAN")
T0 = dt.datetime(2025, 1, 1)


def _rand_vals(rng: random.Random):
    return (
        None if rng.random() < 0.12 else rng.randrange(0, 200) / 4.0,
        None if rng.random() < 0.15 else rng.randrange(-40, 40),
    )


class Scd2Model:
    """Independent list-of-versions model.  A version is a dict over
    ALL_COLS; identity is positional (closing mutates in place)."""

    def __init__(self) -> None:
        self.rows: list[dict] = []

    def seed(self, rows) -> None:
        for r in rows:
            self.rows.append(dict(zip(ALL_COLS, r)))

    def _candidates(self, cats) -> list[dict]:
        out = [r for r in self.rows
               if r["effective_end"] is None and r["cat"] in cats]
        # the model keys candidates by id — duplicate current ids (a
        # violated dimension invariant the generator must not produce)
        # would silently collapse; fail loudly instead
        ids = [r["id"] for r in out]
        assert len(ids) == len(set(ids)), (
            f"generator bug: duplicate current ids among candidates "
            f"{sorted(i for i in ids if ids.count(i) > 1)}"
        )
        return out

    @staticmethod
    def _same(a: dict, b: tuple) -> bool:
        # null-aware tracking compare over non-key data cols (cat, v, n)
        return (a["cat"], a["v"], a["n"]) == (b[1], b[2], b[3])

    def _close(self, r: dict, ts) -> None:
        r["effective_end"] = ts
        r["is_current"] = False

    def _insert(self, src: tuple, ts) -> None:
        self.rows.append({
            "id": src[0], "cat": src[1], "v": src[2], "n": src[3],
            "effective_start": ts, "effective_end": None, "is_current": True,
        })

    def snapshot(self, cats, source: list[tuple], ts) -> None:
        cand = {r["id"]: r for r in self._candidates(cats)}
        src = {s[0]: s for s in source if s[1] in cats}
        for k, s in src.items():
            c = cand.get(k)
            if c is None:
                self._insert(s, ts)                      # I
            elif not self._same(c, s):
                self._close(c, ts)                        # U
                self._insert(s, ts)
            # else N: untouched
        for k, c in cand.items():
            if k not in src:
                self._close(c, ts)                        # D

    def changes(self, cats, source: list[tuple], ts) -> None:
        cand = {r["id"]: r for r in self._candidates(cats)}
        for s in source:
            if s[1] is not None and s[1] not in cats:
                continue  # outside the boundary filter
            k, op = s[0], s[4]
            c = cand.get(k)
            if op == "D":
                if c is not None:
                    self._close(c, ts)
                continue
            if c is None:
                self._insert(s[:4], ts)
            elif not self._same(c, s[:4]):
                self._close(c, ts)
                self._insert(s[:4], ts)
            # else N-S: re-sent identical row suppressed

    def state(self) -> list[tuple]:
        return [tuple(r[c] for c in ALL_COLS) for r in self.rows]


def _diff(engine_rows, model_rows) -> str | None:
    _, er = canon_rows(ALL_COLS, engine_rows)
    _, mr = canon_rows(ALL_COLS, model_rows)
    if len(er) != len(mr):
        return f"rowcount engine={len(er)} model={len(mr)}"
    for a, b in zip(er, mr):
        if a != b:
            return f"first differing row engine={a} model={b}"
    return None


@pytest.mark.parametrize("seed", [5, 77, 310])
def test_scd2_merges_match_model(spark, tmp_path, seed):
    from swiftlake_spark.engine import SwiftLakeEngine

    rng = random.Random(seed)
    eng = SwiftLakeEngine(spark, warehouse=str(tmp_path / "wh"))
    name = "db.dim2"
    eng.catalog.create_table(name, DDL, partition_spec=["cat"])
    model = Scd2Model()

    seed_rows = []
    for k in rng.sample(range(0, 400), 25):
        v, n = _rand_vals(rng)
        seed_rows.append((k, rng.choice(CATS), v, n, T0, None, True))
    eng.insert_into(name).dataframe(
        spark.createDataFrame(seed_rows, schema=DDL)).execute()
    model.seed(seed_rows)

    ops_log = []
    for opi in range(8):
        ts = T0 + dt.timedelta(days=opi + 1)
        cats = sorted(rng.sample(CATS, rng.randint(1, 3)))
        cs = ", ".join(f"'{c}'" for c in cats)
        # sources mix fresh keys with existing ones (some re-sent
        # identical — the N / N-S buckets — via sampling current rows)
        current = [r for r in model.rows
                   if r["effective_end"] is None and r["cat"] in cats]
        source = []
        used = set()
        for r in rng.sample(current, min(len(current), rng.randrange(0, 8))):
            used.add(r["id"])
            if rng.random() < 0.4:   # re-send identical
                source.append((r["id"], r["cat"], r["v"], r["n"]))
            else:                     # value churn (possibly cat move)
                v, n = _rand_vals(rng)
                source.append((r["id"], rng.choice(cats), v, n))
        # fresh keys must not alias a CURRENT id anywhere in the table
        # (any cat): key uniqueness among current versions is the
        # dimension's invariant — SCD2 keys on id alone, so inserting id
        # X into cat C while X is current in cat B creates two current
        # versions of one key.  The engine correctly refuses the matched
        # case later (merge-cardinality guard) and closes BOTH on the
        # unmatched snapshot path; the model's dict-by-id can't represent
        # it.  Sweep seeds 9501/9511/9538 found exactly this.
        current_ids = {
            r["id"] for r in model.rows if r["effective_end"] is None
        }
        for k in rng.sample(range(400, 800), rng.randrange(1, 6)):
            if k not in used and k not in current_ids:
                v, n = _rand_vals(rng)
                source.append((k, rng.choice(cats), v, n))

        if rng.random() < 0.5:
            (eng.apply_snapshot_as_scd2(name)
             .table_filter_sql(f"cat IN ({cs})")
             .source_dataframe(spark.createDataFrame(
                 source, schema="id BIGINT, cat STRING, v DOUBLE, n BIGINT"))
             .key_columns(["id"])
             .effective_period_columns("effective_start", "effective_end")
             .current_flag_column("is_current")
             .effective_timestamp(ts).execute())
            model.snapshot(cats, source, ts)
            ops_log.append(f"snapshot cats={cats} src={len(source)}")
        else:
            withop = [(*s, "D" if rng.random() < 0.25 else "U")
                      for s in source]
            (eng.apply_changes_as_scd2(name)
             .table_filter_sql(f"cat IN ({cs})")
             .source_dataframe(spark.createDataFrame(
                 withop,
                 schema="id BIGINT, cat STRING, v DOUBLE, n BIGINT, op STRING"))
             .key_columns(["id"])
             .operation_type_column("op", "D")
             .effective_period_columns("effective_start", "effective_end")
             .current_flag_column("is_current")
             .effective_timestamp(ts).execute())
            model.changes(cats, withop, ts)
            ops_log.append(f"changes cats={cats} src={len(source)}")

        got = [tuple(r) for r in
               eng.catalog.load(name).select(*ALL_COLS).collect()]
        d = _diff(got, model.state())
        assert d is None, (
            f"seed {seed} diverged at op {opi}: {ops_log[-1]}\n  {d}\n"
            f"  ops: {ops_log}"
        )
