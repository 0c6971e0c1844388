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
    report = t.vacuum(dry_run=True)
    assert len(report["data_files"]) == 4  # the small files, now orphaned
    t.vacuum()
    assert t.vacuum(dry_run=True)["data_files"] == []
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
