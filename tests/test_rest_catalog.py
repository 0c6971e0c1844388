"""Iceberg-REST-shaped catalog commit protocol (VERDICT r8 ask #2).

RestCatalogCommitService must meet the same bar as the storage-claim and
HTTP-pointer protocols: pointer lifecycle, threaded CAS races across a
real network boundary, native-table e2e through the engine, and the
crash-consistency fuzz (tests/test_crash_fuzz.py runs that axis).  The
fake server (tests/rest_catalog_server.py) checks requirements and
applies updates atomically, answering the spec's 409
CommitFailedException / AlreadyExistsException envelopes.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import urllib.request

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from swiftlake_spark import catalog_service as cs  # noqa: E402
from tests.rest_catalog_server import RestCatalogServer  # noqa: E402


@pytest.fixture
def rest_server():
    with RestCatalogServer() as s:
        yield s


def test_rest_pointer_lifecycle(rest_server):
    svc = cs.RestCatalogCommitService(rest_server.base)
    key = "/wh/db/t"
    assert svc.current(key) is None
    assert svc.cas(key, "v1-a", "v2-b") is False  # no table → no create
    svc.register(key, "v1-a")
    assert svc.current(key) == "v1-a"
    with pytest.raises(FileExistsError):
        svc.register(key, "v1-other")
    assert svc.cas(key, "v1-WRONG", "v2-x") is False
    assert svc.cas(key, "v1-a", "v2-x") is True
    assert svc.current(key) == "v2-x"
    assert svc.cas(key, "v1-a", "v3-y") is False  # stale basis loses
    svc.drop(key)
    assert svc.current(key) is None


def test_rest_commit_wire_shape(rest_server):
    """The adapter speaks the public shapes: register stores the full
    metadata-location; commits carry assert-ref-snapshot-id requirements
    the server arbitrates; an unsupported update fails loudly (400)."""
    svc = cs.RestCatalogCommitService(rest_server.base, namespace="ns1")
    key = "mem://s/wh/db/t"
    svc.register(key, "v1-aa")
    t = rest_server.tables[("ns1", key)]
    assert t["location"] == "mem://s/wh/db/t/metadata/v1-aa"
    assert t["refs"]["main"] == cs.pointer_snapshot_id("v1-aa")
    assert svc.cas(key, "v1-aa", "v2-bb")
    t = rest_server.tables[("ns1", key)]
    assert t["location"].endswith("/metadata/v2-bb")
    assert t["refs"]["main"] == cs.pointer_snapshot_id("v2-bb")
    assert t["properties"]["swiftlake.metadata-location"] == t["location"]
    # a client drifting from the implemented shape fails loudly (400)
    assert svc._commit(key, [], [{"action": "remove-snapshots"}]) == 400


def test_rest_cas_race(rest_server):
    """N threads race the same expected pointer over the wire; the
    server's atomic requirement check lets exactly one win."""
    svc = cs.RestCatalogCommitService(rest_server.base)
    key = "/wh/db/race"
    svc.register(key, "v1-a")
    wins = []
    barrier = threading.Barrier(6)

    def racer(i):
        barrier.wait()
        if svc.cas(key, "v1-a", f"v2-{i}"):
            wins.append(i)

    threads = [threading.Thread(target=racer, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert svc.current(key) == f"v2-{wins[0]}"


def test_rest_seeding_gap_recovery(rest_server):
    """A crash between register-table and the ref-seeding commit leaves
    the table registered with no main ref; the next cas must self-heal
    via the absent-ref requirement — and still arbitrate races."""
    key = "/wh/db/gap"
    # register WITHOUT seeding (raw wire call = the crashed first half)
    body = json.dumps({
        "name": key, "metadata-location": key + "/metadata/v1-a",
    }).encode()
    req = urllib.request.Request(
        rest_server.base + "/v1/namespaces/swiftlake/register",
        data=body, method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
    svc = cs.RestCatalogCommitService(rest_server.base)
    assert svc.current(key) == "v1-a"
    assert svc.cas(key, "v1-WRONG", "v2-x") is False  # heal only on match
    assert svc.cas(key, "v1-a", "v2-x") is True
    assert svc.current(key) == "v2-x"
    # idempotent register retry (response lost after seeding) succeeds...
    svc2 = cs.RestCatalogCommitService(rest_server.base)
    with pytest.raises(FileExistsError):
        svc2.register(key, "v9-z")


def test_rest_register_seed_idempotent_retry(rest_server):
    """register retried after a lost response must accept its own seeded
    ref and reject a different pointer's."""
    svc = cs.RestCatalogCommitService(rest_server.base)
    key = "/wh/db/retry"
    svc.register(key, "v1-a")
    # same-pointer seed retry: the ref already matches → no error
    st = svc._commit(
        key,
        [{"type": "assert-ref-snapshot-id", "ref": "main",
          "snapshot-id": None}],
        [svc._ref_update("v1-a")],
    )
    assert st == 409  # ref exists — register() tolerates iff it matches
    doc = svc._load(key)
    assert doc["metadata"]["refs"]["main"]["snapshot-id"] == \
        cs.pointer_snapshot_id("v1-a")


def test_rest_bearer_token_auth():
    with RestCatalogServer(token="sekrit") as s:
        bad = cs.RestCatalogCommitService(s.base)
        with pytest.raises(IOError):
            bad.register("/k", "v1-a")
        assert bad.current("/k") is None  # 401 reads as absent, no crash
        good = cs.RestCatalogCommitService(s.base, token="sekrit")
        good.register("/k", "v1-a")
        assert good.current("/k") == "v1-a"
        wrong = cs.RestCatalogCommitService(s.base, token="nope")
        with pytest.raises(IOError):
            wrong.cas("/k", "v1-a", "v2-b")
        assert good.current("/k") == "v1-a"  # nothing moved


def test_rest_native_table_e2e(spark, rest_server, tmp_path):
    """Full catalog-cas lifecycle with the REST catalog as pointer
    authority: create, append, concurrent appends (all land via CAS
    retry), update, stale-handle conflict, drop."""
    from swiftlake_spark.engine import SwiftLakeEngine
    from swiftlake_spark.tables import expressions as E

    prev = cs.set_default_catalog_service(
        cs.RestCatalogCommitService(rest_server.base))
    try:
        eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "wh"))
        t = eng.catalog.create_table(
            "db.rc", "id BIGINT, v DOUBLE",
            properties={"commit.protocol": "catalog-cas"},
        )
        t.append(spark.createDataFrame([(1, 1.0), (2, 2.0)], schema=t.schema))
        assert cs.default_catalog_service().current(t.location).startswith("v2-")

        errs = []

        def appender(i):
            try:
                tt = eng.catalog.table("db.rc")
                tt.append(spark.createDataFrame([(10 + i, float(i))],
                                                schema=tt.schema))
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        threads = [threading.Thread(target=appender, args=(i,))
                   for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errs, errs
        got = sorted(r["id"] for r in eng.catalog.table("db.rc").scan().collect())
        assert got == [1, 2, 10, 11, 12, 13]

        eng.update("db.rc").condition_sql("id = 1").update_sets(
            {"v": 9.5}).execute()
        assert eng.catalog.table("db.rc").scan(
            E.col_eq("id", 1)).collect()[0]["v"] == 9.5

        # raw double-commit at the metadata layer conflicts via CAS
        from swiftlake_spark.tables.metadata import (
            CommitConflict,
            load_metadata,
            write_new_version,
        )
        loc = t.location
        a, b = load_metadata(loc), load_metadata(loc)
        write_new_version(a)
        with pytest.raises(CommitConflict):
            write_new_version(b)

        eng.catalog.drop_table("db.rc")
        assert cs.default_catalog_service().current(loc) is None
    finally:
        cs.set_default_catalog_service(prev)
