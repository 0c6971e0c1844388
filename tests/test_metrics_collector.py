"""Metric collector seam (VERDICT r6 ask #5; reference
metrics/MetricCollector.java, CommitMetrics.java,
PartitionCommitMetrics.java): engine-registered callables receive every
ScanMetrics and CommitMetrics, the latter carrying exact per-partition
added/removed file+record rollups derived from the manifest delta."""

import pytest

from swiftlake_spark.engine import SwiftLakeEngine
from swiftlake_spark.plans.metrics import CommitMetrics, ScanMetrics
from swiftlake_spark.tables import expressions as E


@pytest.fixture
def eng(spark, tmp_path):
    return SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "whmc"))


def _commits(seen):
    return [m for m in seen if isinstance(m, CommitMetrics)]


def test_collector_sees_partitioned_insert_rollup(eng, spark):
    seen = []
    eng.add_metric_collector(seen.append)
    t = eng.catalog.create_table(
        "db.mc", "id BIGINT, cat STRING", partition_spec=["cat"]
    )
    t.append(spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], schema=t.schema
    ))
    (cm,) = _commits(seen)
    assert cm.operation == "append"
    assert cm.added_files == 2 and cm.removed_files == 0
    assert cm.added_records == 3 and cm.removed_records == 0
    per = {dict(p.partition)["cat"]: p for p in cm.partitions}
    assert set(per) == {"A", "B"}
    assert per["A"].added_files == 1 and per["A"].added_records == 2
    assert per["B"].added_files == 1 and per["B"].added_records == 1
    assert all(p.removed_files == 0 for p in cm.partitions)
    assert cm.duration_ms > 0
    # last_commit_metrics mirrors what the collector saw
    assert t.last_commit_metrics is cm


def test_collector_sees_delete_and_scan(eng, spark):
    seen = []
    eng.add_metric_collector(seen.append)
    t = eng.catalog.create_table(
        "db.mc2", "id BIGINT, cat STRING", partition_spec=["cat"]
    )
    t.append(spark.createDataFrame([(1, "A"), (2, "B")], schema=t.schema))
    t.delete_where(E.col_eq("cat", "A"))
    cms = _commits(seen)
    assert [c.operation for c in cms] == ["append", "delete"]
    d = cms[1]
    # metadata-only full-file drop: one file removed, nothing added
    assert d.removed_files == 1 and d.removed_records == 1
    per = {dict(p.partition)["cat"]: p for p in d.partitions}
    assert list(per) == ["A"] and per["A"].removed_files == 1

    seen.clear()
    t.scan(E.col_eq("cat", "B")).collect()
    scans = [m for m in seen if isinstance(m, ScanMetrics)]
    assert len(scans) == 1
    assert scans[0].scanned_files == 1  # partition pruning visible here


def test_collector_registered_after_table_creation(eng, spark):
    t = eng.catalog.create_table("db.mc3", "id BIGINT")
    seen = []
    eng.add_metric_collector(seen.append)  # AFTER handle creation
    t.append(spark.createDataFrame([(1,)], schema=t.schema))
    assert len(_commits(seen)) == 1  # shared-list wiring works


def test_raising_collector_never_breaks_commit(eng, spark):
    def bad(_):
        raise RuntimeError("collector bug")

    seen = []
    eng.add_metric_collector(bad)
    eng.add_metric_collector(seen.append)
    t = eng.catalog.create_table("db.mc4", "id BIGINT")
    with pytest.warns(UserWarning, match="collector"):
        t.append(spark.createDataFrame([(7,)], schema=t.schema))
    assert t.scan().count() == 1  # commit landed despite the bad collector
    assert len(_commits(seen)) == 1  # later collectors still ran
