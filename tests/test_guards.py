"""Scan guards, scan/commit metrics, batch transaction."""

import pytest

from swiftlake_spark.engine import SwiftLakeEngine
from swiftlake_spark.config import EngineConfig
from swiftlake_spark.plans.guards import FullTableScanError, ScanSizeLimitError
from swiftlake_spark.tables import expressions as E


@pytest.fixture()
def guarded_engine(spark, tmp_path):
    cfg = EngineConfig(allow_full_table_scan=False, total_scan_size_limit_mib=1)
    return SwiftLakeEngine(spark=spark, config=cfg, warehouse=str(tmp_path / "wh"))


def test_full_scan_refused(guarded_engine, spark):
    eng = guarded_engine
    t = eng.catalog.create_table("db.g", "id BIGINT, cat STRING", partition_spec=["cat"])
    t.append(spark.createDataFrame([(1, "A"), (2, "B")], schema=t.schema))
    with pytest.raises(FullTableScanError):
        t.scan()
    # filtered scan passes
    assert t.scan(E.col_eq("cat", "A")).count() == 1


def test_scan_metrics_and_prune_ratio(guarded_engine, spark):
    eng = guarded_engine
    t = eng.catalog.create_table("db.m", "id BIGINT, cat STRING", partition_spec=["cat"])
    t.append(spark.createDataFrame([(i, c) for i, c in enumerate("AABBCC")], schema=t.schema))
    t.scan(E.col_eq("cat", "A"))
    m = t.last_scan_metrics
    assert m.total_files == 3 and m.scanned_files == 1 and m.pruned_files == 2
    assert m.scanned_records == 2
    assert m.prune_ratio == pytest.approx(2 / 3)


def test_scan_size_limit(spark, tmp_path):
    cfg = EngineConfig(total_scan_size_limit_mib=0)  # 0 MiB → everything too big
    eng = SwiftLakeEngine(spark=spark, config=cfg, warehouse=str(tmp_path / "wh2"))
    t = eng.catalog.create_table("db.sz", "id BIGINT")
    t.append(spark.range(10).select("id"))
    with pytest.raises(ScanSizeLimitError):
        t.scan(E.gt("id", 0))


def test_history_dataframe(spark, tmp_path):
    eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "wh3"))
    t = eng.catalog.create_table("db.h", "id BIGINT")
    t.append(spark.range(5).select("id"))
    t.delete_where(E.col_eq("id", 3))
    hist = t.history().collect()
    assert [h["operation"] for h in hist] == ["append", "delete"]
    assert hist[0]["added_records"] == 5


def test_batch_transaction_single_commit(spark, tmp_path):
    eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "wh4"))
    t = eng.catalog.create_table("db.b", "id BIGINT")
    bt = eng.batch_transaction("db.b")
    bt.append(spark.range(3).select("id")).append(spark.range(3, 6).select("id"))
    bt.commit()
    t.refresh()
    assert t.scan().count() == 6
    assert len(t.meta.snapshots) == 1  # one snapshot for two writes
    from swiftlake_spark.tables.metadata import ValidationError

    with pytest.raises(ValidationError):
        bt.commit()


def test_sql_named_and_positional_params(spark, tmp_path):
    eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "whp"))
    t = eng.catalog.create_table("db.p", "id BIGINT, v DOUBLE")
    t.append(spark.createDataFrame([(1, 1.0), (2, 2.0)], schema=t.schema))
    got = eng.sql("SELECT id FROM db.p WHERE v > :lo ORDER BY id", args={"lo": 1.5})
    assert [r["id"] for r in got.collect()] == [2]
    got = eng.sql("SELECT id FROM db.p WHERE v > ? ORDER BY id", args=[0.5])
    assert [r["id"] for r in got.collect()] == [1, 2]


def test_compact_expire_vacuum(spark, tmp_path):
    eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "whm"))
    t = eng.catalog.create_table("db.c", "id BIGINT")
    for i in range(4):  # four tiny appends → four small files
        t.append(spark.createDataFrame([(i,)], schema=t.schema).coalesce(1))
    man0 = t.meta.read_manifest(t.meta.current_snapshot())
    assert len(man0) == 4
    snap = t.compact(target_file_size_bytes=1 << 20)
    assert snap is not None and snap.operation == "replace"
    man1 = t.meta.read_manifest(t.meta.current_snapshot())
    assert len(man1) == 1
    assert t.scan().count() == 4  # data intact

    # expire everything but the head, then vacuum the replaced files
    expired = t.expire_snapshots(keep_last=1)
    assert len(expired) == 4  # the four pre-compaction snapshots
    report = t.vacuum(dry_run=True, older_than_ms=0)
    assert len(report["data_files"]) == 4  # the small files, now orphaned
    t.vacuum(older_than_ms=0)
    assert t.vacuum(dry_run=True, older_than_ms=0)["data_files"] == []
    assert t.scan().count() == 4  # current data untouched

    # further writes still work after maintenance
    t.append(spark.createDataFrame([(99,)], schema=t.schema))
    assert t.scan().count() == 5


def test_files_metadata_table(spark, tmp_path):
    eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "whf"))
    t = eng.catalog.create_table("db.f", "id BIGINT, cat STRING", partition_spec=["cat"])
    t.append(spark.createDataFrame([(1, "A"), (2, "B")], schema=t.schema))
    files = t.files().collect()
    assert len(files) == 2
    assert all(f["records"] == 1 and f["size_bytes"] > 0 for f in files)
    assert {f["partition"] for f in files} == {'{"cat": "A"}', '{"cat": "B"}'}


def test_zorder_cluster_by_improves_multi_column_pruning(spark, tmp_path):
    """cluster_by rewrites the layout so manifest min/max pruning works
    on BOTH z-order columns; a random layout prunes (almost) nothing."""
    eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "whz"))
    t = eng.catalog.create_table(
        "db.z", "a BIGINT, b BIGINT, payload STRING",
        properties={"write.max-records-per-file": "800"},
    )
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(10_000), rng.randrange(10_000), f"p{i}") for i in range(12_800)]
    # random row order + hash-ish distribution → every file spans ~the
    # full domain of both columns
    df = spark.createDataFrame(rows, schema=t.schema).repartition(16)
    t.append(df)

    def files_scanned(expr) -> int:
        t.scan(expr)
        m = t.last_scan_metrics
        return m.scanned_files

    n_files_before = len(list(t.meta.read_manifest(t.meta.current_snapshot("main"))))
    assert n_files_before >= 8
    before_a = files_scanned(E.between("a", 0, 499))
    before_b = files_scanned(E.between("b", 0, 499))
    assert before_a == n_files_before  # random layout: no pruning at all
    assert before_b == n_files_before

    snap = t.cluster_by(["a", "b"], target_file_size_bytes=40_000)
    assert snap is not None
    t2 = eng.catalog.table("db.z")
    n_files_after = len(list(t2.meta.read_manifest(t2.meta.current_snapshot("main"))))
    assert n_files_after >= 8
    assert t2.scan().count() == 12_800  # data intact

    def files_scanned2(expr) -> int:
        t2.scan(expr)
        return t2.last_scan_metrics.scanned_files

    after_a = files_scanned2(E.between("a", 0, 499))
    after_b = files_scanned2(E.between("b", 0, 499))
    # a 1/20th-domain slice on EITHER column now touches a minority of files
    assert after_a <= n_files_after // 2, (after_a, n_files_after)
    assert after_b <= n_files_after // 2, (after_b, n_files_after)
    # rows keep matching the filter exactly
    expected = sum(1 for a, _b, _p in rows if 0 <= a <= 499)
    assert t2.scan(E.between("a", 0, 499)).filter("a BETWEEN 0 AND 499").count() == expected


def test_cluster_by_rejects_partitioned_and_sorted(spark, tmp_path):
    eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "whz2"))
    tp = eng.catalog.create_table("db.zp", "a BIGINT, cat STRING", partition_spec=["cat"])
    with pytest.raises(ValueError, match="unpartitioned"):
        tp.cluster_by(["a"])
    ts = eng.catalog.create_table("db.zs", "a BIGINT", sort_order=["a ASC"])
    with pytest.raises(ValueError, match="sort order"):
        ts.cluster_by(["a"])


def test_partitions_metadata_table(spark, tmp_path):
    """partitions() rolls up the manifest per partition without reading
    data (≙ Iceberg's .partitions metadata table)."""
    eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "whp"))
    t = eng.catalog.create_table(
        "db.pmeta", "id BIGINT, cat STRING", partition_spec=["cat"])
    t.append(spark.createDataFrame(
        [(i, c) for i, c in enumerate("AABBB")], schema=t.schema))
    rows = {r["partition"]: (r["files"], r["records"]) for r in t.partitions().collect()}
    assert len(rows) == 2
    recs = sorted(v[1] for v in rows.values())
    assert recs == [2, 3]


def test_zorder_cluster_by_string_hash_path(spark, tmp_path):
    """cluster_by on a string column takes the hash-bucketing path and
    still produces a valid, complete rewrite."""
    eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "whzs"))
    t = eng.catalog.create_table(
        "db.zs2", "k BIGINT, name STRING",
        properties={"write.max-records-per-file": "500"},
    )
    t.append(spark.createDataFrame(
        [(i, f"name-{i % 37}") for i in range(4000)], schema=t.schema))
    snap = t.cluster_by(["k", "name"], target_file_size_bytes=20_000)
    assert snap is not None and snap.operation == "replace"
    assert eng.catalog.table("db.zs2").scan().count() == 4000


def test_query_timeout_cancels_jobs(spark, tmp_path):
    import time

    from swiftlake_spark.config import EngineConfig
    from swiftlake_spark.engine import QueryTimeout, SwiftLakeEngine

    eng = SwiftLakeEngine(spark=spark, config=EngineConfig(query_timeout_s=2.0))
    # a deliberately huge cross-join count that cannot finish in 2s
    slow = (
        "SELECT COUNT(*) FROM (SELECT explode(sequence(1, 2000000)) a) x "
        "CROSS JOIN (SELECT explode(sequence(1, 2000000)) b) y"
    )
    t0 = time.time()
    with pytest.raises(QueryTimeout):
        eng.execute(slow)
    assert time.time() - t0 < 30  # cancelled, not run to completion
    # engine still healthy afterwards
    assert eng.execute("SELECT 1 AS one")[0]["one"] == 1


def test_concurrent_query_cap(spark):
    import threading

    from swiftlake_spark.config import EngineConfig
    from swiftlake_spark.engine import EngineBusy, SwiftLakeEngine

    eng = SwiftLakeEngine(
        spark=spark,
        config=EngineConfig(max_concurrent_queries=1, query_acquire_timeout_s=0.5),
    )
    release = threading.Event()
    started = threading.Event()

    def hold_slot():
        # hold the only slot via a query whose first row blocks on the event
        sem = eng._query_sem
        sem.acquire()
        started.set()
        release.wait(timeout=30)
        sem.release()

    th = threading.Thread(target=hold_slot, daemon=True)
    th.start()
    started.wait(timeout=10)
    with pytest.raises(EngineBusy):
        eng.execute("SELECT 1 AS one")
    release.set()
    th.join(timeout=10)
    assert eng.execute("SELECT 1 AS one")[0]["one"] == 1


def test_vacuum_age_gate_protects_young_manifests(spark, tmp_path):
    """A manifest not referenced by the (possibly stale) metadata load
    must survive vacuum while young: Table._commit stages the manifest
    BEFORE the metadata version that references it, so deleting a young
    unreferenced manifest can destroy an in-flight commit (ADVICE r6,
    maintenance.py).  Age-gated vacuum keeps it; older_than_ms=0 (the
    no-writers-active promise) removes it."""
    import os

    eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "whvm"))
    t = eng.catalog.create_table("db.vm", "id BIGINT")
    t.append(spark.createDataFrame([(1,)], schema=t.schema))
    mdir = os.path.join(t.location, "metadata")
    # simulate a concurrent commit's just-staged (not yet referenced)
    # manifest: same naming scheme, fresh mtime
    staged = os.path.join(mdir, "manifest-99999999-staged.json")
    with open(staged, "w") as f:
        f.write("[]")

    report = t.vacuum(dry_run=True)  # default 3-day gate
    assert report["manifests"] == []  # young orphan manifest protected
    t.vacuum()  # really run it
    assert os.path.exists(staged)

    # a genuinely old orphan IS collected once aged out
    old = 5 * 24 * 3600
    os.utime(staged, (os.path.getmtime(staged) - old,) * 2)
    report = t.vacuum(dry_run=True)
    assert report["manifests"] == [os.path.basename(staged)]
    t.vacuum()
    assert not os.path.exists(staged)
    assert t.scan().count() == 1  # table intact throughout


def test_cmp_date_datetime_cross_class_soundness():
    """Pruning compare must not order a date literal lexicographically
    against a timestamp stat: '2020-01-01' < '2020-01-01 00:00:00' as
    strings, but they are the SAME instant under Spark's date→timestamp
    upcast (ADVICE r6, expressions.py)."""
    import datetime as dt

    from swiftlake_spark.tables.expressions import _cmp

    midnight = dt.datetime(2020, 1, 1)
    d = dt.date(2020, 1, 1)
    assert _cmp(d, midnight) == 0
    assert _cmp(midnight, d) == 0
    assert _cmp(d, dt.datetime(2019, 12, 31, 23, 59, 59)) == 1
    assert _cmp(d, dt.datetime(2020, 1, 1, 0, 0, 1)) == -1
    # against string-encoded stats bounds (the persisted form)
    assert _cmp(d, "2020-01-01 00:00:00") == 0
    assert _cmp(midnight, "2020-01-01") == 0
    assert _cmp(dt.datetime(2020, 1, 1, 0, 0, 0, 1), "2020-01-01 00:00:00") == 1
    # non-ISO strings are a type mismatch, not a lexicographic compare
    assert _cmp(midnight, "not-a-date") is None
    assert _cmp(d, "20200101") is None


def test_sql_transformers_hook(spark, tmp_path):
    """QueryTransformer parity (reference sql/QueryTransformer.java:23,
    applied in SwiftLakeConnection.prepareStatement:119-137 before
    table processing; VERDICT r11 ask #6): per-call transform runs
    first, then config.sql_transformers in order; transforms apply
    BEFORE DDL/DML routing (a transformer can redirect a statement to a
    lakehouse DML builder); parameter markers survive untouched; a
    transformer returning a non-string fails loudly."""
    calls = []

    def add_where(sql):
        calls.append("add_where")
        return sql.replace("/*W*/", "WHERE id > :lo")

    def rename_table(sql):
        calls.append("rename_table")
        return sql.replace("__alias__", "db.tx")

    cfg = EngineConfig(sql_transformers=[add_where, rename_table])
    eng = SwiftLakeEngine(spark=spark, config=cfg, warehouse=str(tmp_path / "wh"))
    t = eng.catalog.create_table("db.tx", "id BIGINT, v STRING")
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema=t.schema))

    # param markers bind on the TRANSFORMED text; both transformers ran in order
    rows = eng.sql("SELECT id FROM __alias__ /*W*/ ORDER BY id", args={"lo": 1}).collect()
    assert [r["id"] for r in rows] == [2, 3]
    assert calls == ["add_where", "rename_table"]

    # per-call transform runs FIRST (the reference's statement-scoped form)
    calls.clear()
    rows = eng.sql(
        "SELECT COUNT(*) AS n FROM __tbl__ /*W*/",
        args={"lo": 0},
        transform=lambda s: (calls.append("per_call"), s.replace("__tbl__", "__alias__"))[1],
    ).collect()
    assert rows[0]["n"] == 3
    assert calls == ["per_call", "add_where", "rename_table"]

    # transforms happen before DML routing: a rewritten DELETE reaches
    # the lakehouse builder and commits
    receipt = eng.sql("DELETE FROM __alias__ WHERE id = 1").collect()
    assert receipt[0]["operation"] == "delete"
    assert eng.sql("SELECT COUNT(*) AS n FROM db.tx").collect()[0]["n"] == 2

    # loud failure on a bad transformer
    with pytest.raises(ValueError, match="non-empty string"):
        eng.sql("SELECT 1", transform=lambda s: None)
