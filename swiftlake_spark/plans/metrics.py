"""Scan + commit metrics (reference metrics/TableScanMetrics.java,
CommitMetrics.java; collection IcebergScanExecutor.java:183-196,
Transaction.java:337-458).

Scan metrics come from the manifest prune; commit metrics live in each
snapshot's summary and surface here as a history DataFrame.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ScanMetrics:
    table: str
    total_files: int = 0
    scanned_files: int = 0
    pruned_files: int = 0
    scanned_bytes: int = 0
    scanned_records: int = 0
    planning_ms: float = 0.0
    started_at: float = field(default_factory=time.time)

    @property
    def prune_ratio(self) -> float:
        return self.pruned_files / self.total_files if self.total_files else 0.0

    def as_dict(self) -> dict:
        return {
            "table": self.table,
            "total_files": self.total_files,
            "scanned_files": self.scanned_files,
            "pruned_files": self.pruned_files,
            "scanned_bytes": self.scanned_bytes,
            "scanned_records": self.scanned_records,
            "planning_ms": round(self.planning_ms, 2),
            "prune_ratio": round(self.prune_ratio, 4),
        }


def table_history(spark: SparkSession, table) -> DataFrame:
    """Snapshot log as a DataFrame: one row per snapshot with commit
    metrics (≙ Iceberg's ``.history``/``.snapshots`` metadata tables,
    which the reference cannot expose — README.md:66-68 — and we can)."""
    rows = [
        {
            "snapshot_id": s.snapshot_id,
            "parent_id": s.parent_id,
            "timestamp_ms": s.timestamp_ms,
            "operation": s.operation,
            "added_files": int(s.summary.get("added-files", 0)),
            "deleted_files": int(s.summary.get("deleted-files", 0)),
            "added_records": int(s.summary.get("added-records", 0)),
            "total_files": int(s.summary.get("total-files", 0)),
        }
        for s in table.meta.snapshots
    ]
    schema = (
        "snapshot_id BIGINT, parent_id BIGINT, timestamp_ms BIGINT, "
        "operation STRING, added_files INT, deleted_files INT, "
        "added_records BIGINT, total_files INT"
    )
    return spark.createDataFrame(rows, schema=schema)
