"""Crash-consistency fuzz: injected storage failures mid-commit.

The FileIO seam makes every byte the table format persists pass through
one interface — so a fault-injecting proxy can kill the Nth mutating
storage call of an operation (a data-file upload, a manifest write, the
version claim itself) and the table afterwards must be ATOMIC: a fresh
client reading from storage sees exactly the pre-op state or exactly
the post-op state, never a torn one.  The commit protocol's atomic
boundary is the version-file claim (everything before it is invisible
staging; tables/metadata.py), and the in-memory handle rolls back its
snapshot list on storage failure (table.py _commit) — this fuzz checks
both from the outside, across every failure offset of every op shape.

After each injected crash the sequence also proves the table is not
just readable but USABLE: vacuum runs clean (orphaned staging from the
failed op must not take live data with it) and the next op commits.

Mirrors the state in plain Python + DuckDB per op (pre/post candidate
states), reusing the op generators of tests/test_dml_fuzz.py.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from swiftlake_spark import fileio as fio  # noqa: E402
from tests.test_dml_fuzz import (  # noqa: E402
    CATS,
    COLS,
    SCHEMA,
    _diff,
    _rand_cond,
    _rand_rows,
)

_MUTATING = (
    "write_bytes", "write_text", "try_claim", "replace_text", "delete",
    "upload",
)


class FlakyIO:
    """Delegating FileIO proxy that raises StorageError on the Nth
    mutating call once armed.  Reads never fail (read-side faults are
    retried/propagated trivially and don't threaten durability)."""

    def __init__(self, inner: fio.FileIO) -> None:
        self._inner = inner
        self.fail_after: int | None = None
        self.calls = 0

    def arm(self, fail_after: int) -> None:
        self.fail_after = fail_after
        self.calls = 0

    def disarm(self) -> None:
        self.fail_after = None

    def _maybe_fail(self) -> None:
        if self.fail_after is not None:
            self.calls += 1
            if self.calls > self.fail_after:
                raise fio.StorageError("injected storage failure")

    def __getattr__(self, name):
        attr = getattr(self._inner, name)
        if name in _MUTATING:
            def wrapped(*a, **kw):
                self._maybe_fail()
                return attr(*a, **kw)
            return wrapped
        return attr


class FlakyCatalog:
    """Delegating CatalogCommitService proxy sharing a FlakyIO's fault
    counter: the pointer swap can die just BEFORE the catalog call (the
    commit never happened) or just AFTER it (response lost — the swap
    landed but the client never learns), the two failure modes a
    network catalog adds over local storage.  Reads never fault."""

    def __init__(self, inner, flaky_io: FlakyIO) -> None:
        self._inner = inner
        self._f = flaky_io

    def current(self, k):
        return self._inner.current(k)

    def register(self, k, p):
        self._f._maybe_fail()
        out = self._inner.register(k, p)
        self._f._maybe_fail()
        return out

    def cas(self, k, e, n):
        self._f._maybe_fail()
        out = self._inner.cas(k, e, n)
        self._f._maybe_fail()
        return out

    def drop(self, k):
        return self._inner.drop(k)


def _apply(pre: list, op) -> list:
    """Expected post-state via a throwaway DuckDB table."""
    con = duckdb.connect()
    con.execute("CREATE TABLE m (id BIGINT, cat VARCHAR, ts TIMESTAMP, "
                "v DOUBLE, n BIGINT)")
    if pre:
        con.executemany("INSERT INTO m VALUES (?,?,?,?,?)", pre)
    kind = op[0]
    if kind == "append":
        if op[1]:
            con.executemany("INSERT INTO m VALUES (?,?,?,?,?)", op[1])
    elif kind == "overwrite":
        cats, rows = op[1]
        cs = ", ".join(f"'{c}'" for c in cats)
        con.execute(f"DELETE FROM m WHERE cat IN ({cs})")
        if rows:
            con.executemany("INSERT INTO m VALUES (?,?,?,?,?)", rows)
    elif kind == "delete":
        con.execute(f"DELETE FROM m WHERE {op[1]}")
    else:
        cond, col, val = op[1]
        con.execute(f"UPDATE m SET {col} = ? WHERE {cond}", [val])
    out = con.execute(f"SELECT {', '.join(COLS)} FROM m").fetchall()
    con.close()
    return out


def _run_op(eng, spark, name, op):
    kind = op[0]
    if kind == "append":
        eng.insert_into(name).dataframe(
            spark.createDataFrame(op[1], schema=SCHEMA)).execute()
    elif kind == "overwrite":
        cats, rows = op[1]
        cs = ", ".join(f"'{c}'" for c in cats)
        (eng.insert_overwrite(name)
         .dataframe(spark.createDataFrame(rows, schema=SCHEMA))
         .overwrite_by_filter_sql(f"cat IN ({cs})").execute())
    elif kind == "delete":
        eng.delete_from(name).condition_sql(op[1]).execute()
    else:
        cond, col, val = op[1]
        eng.update(name).condition_sql(cond).update_sets({col: val}).execute()


def _state(eng, name):
    return [tuple(r)
            for r in eng.catalog.load(name).select(*COLS).collect()]


@pytest.mark.parametrize("protocol", ["storage-claim", "catalog-cas"])
@pytest.mark.parametrize("seed", [3, 91])
def test_injected_crashes_preserve_atomicity(spark, seed, protocol):
    store = f"crashfuzz{seed}{protocol.replace('-', '')}"
    fio.reset_memory_store(store)
    _crash_sequence(spark, f"mem://{store}/wh", seed, protocol, "_MEM_IO",
                    "mem://x")
    fio.reset_memory_store(store)


def test_injected_crashes_preserve_atomicity_over_http(spark):
    """Same fuzz across a REAL network boundary: the HTTP FileIO's
    staging/upload flow must have the same atomic boundary."""
    from tests.http_object_store import HttpObjectStore

    with HttpObjectStore() as s:
        _crash_sequence(spark, s.base + "/wh", 17, "storage-claim",
                        "_HTTP_IO", s.base + "/x")


def test_injected_crashes_preserve_atomicity_over_sigv4(spark):
    """The SIGNED store must be crash-consistent, not just
    auth-correct (VERDICT r8 ask #8): same fuzz with every byte going
    through SigV4HttpFileIO's _request override."""
    from tests.http_object_store import HttpObjectStore

    ak, sk = "AKIDCRASH", "crash/secret"
    with HttpObjectStore(credentials=(ak, sk)) as s:
        io = fio.SigV4HttpFileIO(ak, sk, region="us-test-1")
        fio.register_fileio(s.base, io)
        try:
            _crash_sequence(spark, s.base + "/wh", 29, "storage-claim",
                            None, s.base + "/x", register_prefix=s.base)
        finally:
            fio.unregister_fileio(s.base)


def test_injected_crashes_preserve_atomicity_over_rest_catalog(spark):
    """catalog-cas with the Iceberg-REST-shaped pointer authority
    (VERDICT r8 ask #2): storage faults AND catalog-transport faults
    (pointer swap dying just before or just after the commit POST) must
    leave the table exactly pre or exactly post, never torn."""
    from swiftlake_spark import catalog_service as cs
    from tests.rest_catalog_server import RestCatalogServer

    store = "crashfuzzrest"
    fio.reset_memory_store(store)
    with RestCatalogServer() as s:
        svc = cs.RestCatalogCommitService(s.base)
        _crash_sequence(spark, f"mem://{store}/wh", 43, "catalog-cas",
                        "_MEM_IO", "mem://x", catalog=svc)
    fio.reset_memory_store(store)


def _crash_sequence(spark, warehouse, seed, protocol, singleton, probe_url,
                    register_prefix=None, catalog=None):
    from swiftlake_spark.engine import SwiftLakeEngine
    from swiftlake_spark.tables.maintenance import vacuum

    # install the proxy where fileio_for hands out the singleton (or,
    # for per-prefix registered backends like SigV4, re-register the
    # prefix to the proxy)
    real = fio.fileio_for(probe_url)
    flaky = FlakyIO(real)
    if register_prefix is not None:
        fio.register_fileio(register_prefix, flaky)
    else:
        setattr(fio, singleton, flaky)
    prev_svc = None
    if catalog is not None:
        from swiftlake_spark import catalog_service as cs

        prev_svc = cs.set_default_catalog_service(
            FlakyCatalog(catalog, flaky))
    try:
        rng = random.Random(seed)
        eng = SwiftLakeEngine(spark, warehouse=warehouse)
        name = "db.t"
        props = {"commit.protocol": protocol} if protocol == "catalog-cas" else None
        eng.catalog.create_table(
            name, SCHEMA, partition_spec=["cat"], properties=props
        )
        state = _rand_rows(rng, 25)
        eng.insert_into(name).dataframe(
            spark.createDataFrame(state, schema=SCHEMA)).execute()

        def gen_op(r):
            roll = r.random()
            if roll < 0.35:
                return ("append", _rand_rows(r, r.randrange(1, 10)))
            if roll < 0.55:
                cats = sorted(r.sample(CATS, r.randint(1, 2)))
                return ("overwrite", (cats, _rand_rows(r, r.randrange(0, 8),
                                                       cats=cats)))
            if roll < 0.8:
                return ("delete", _rand_cond(r))
            col, val = r.choice([("v", r.randrange(0, 400) / 4.0),
                                 ("n", r.randrange(-50, 50))])
            return ("update", (_rand_cond(r), col, val))

        crashes = 0
        for opi in range(10):
            op = gen_op(rng)
            post = _apply(state, op)
            flaky.arm(rng.randrange(0, 8))
            failed = False
            try:
                _run_op(eng, spark, name, op)
            except Exception:  # noqa: BLE001 — the injected fault class
                failed = True
                crashes += 1
            finally:
                flaky.disarm()

            got = _state(eng, name)
            if _diff(got, post) is None:
                state = post  # op won the race with the fault (or no fault)
            else:
                d_pre = _diff(got, state)
                assert failed, "op reported success but state is not post"
                assert d_pre is None, (
                    f"seed {seed} op {opi} {op[0]}: torn state after injected "
                    f"crash — matches neither pre nor post ({d_pre})"
                )
            # the table must stay USABLE: vacuum never removes live data
            # (staged orphans of the failed op may go), and a fresh client
            # sees the same state
            rep = vacuum(eng.catalog.table(name), older_than_ms=0)
            assert rep is not None
            assert _diff(_state(eng, name), state) is None

        assert crashes >= 3, f"only {crashes} injected crashes fired — " \
                             "fault offsets too large to test anything"
        # clean op after all the carnage
        final_rows = _rand_rows(rng, 5)
        eng.insert_into(name).dataframe(
            spark.createDataFrame(final_rows, schema=SCHEMA)).execute()
        assert _diff(_state(eng, name), state + final_rows) is None
    finally:
        if register_prefix is not None:
            fio.register_fileio(register_prefix, real)
        else:
            setattr(fio, singleton, real)
        if prev_svc is not None:
            from swiftlake_spark import catalog_service as cs

            cs.set_default_catalog_service(prev_svc)
