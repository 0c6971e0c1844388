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
