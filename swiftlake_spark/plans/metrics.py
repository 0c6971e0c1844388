"""Scan + commit metrics (reference metrics/TableScanMetrics.java,
CommitMetrics.java, PartitionCommitMetrics.java, MetricCollector.java;
collection IcebergScanExecutor.java:183-196, Transaction.java:337-458).

Scan metrics come from the manifest prune; commit metrics are derived
from the manifest delta at commit time (per-partition added/removed
file and record counts) and also live in each snapshot's summary,
surfacing as a history DataFrame.

Collector seam (≙ reference MetricCollector, a functional interface):
any Python callable ``collector(metrics) -> None`` registered on the
engine receives every ScanMetrics and CommitMetrics the engine
produces.  Dispatch is fail-safe — a collector raising never breaks
the scan or commit that produced the metrics (they are observability,
not part of the operation's contract).
"""

from __future__ import annotations

import time
import warnings
from dataclasses import dataclass, field
from typing import Any, Callable

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


@dataclass(frozen=True)
class PartitionCommitMetrics:
    """Per-partition slice of one commit (reference
    metrics/PartitionCommitMetrics.java: PartitionData + added/removed
    file and record counts).  ``partition`` is the manifest's partition
    dict ({} for unpartitioned tables)."""

    partition: tuple  # sorted (name, value) pairs — hashable group key
    added_files: int = 0
    removed_files: int = 0
    added_records: int = 0
    removed_records: int = 0

    def as_dict(self) -> dict:
        return {
            "partition": dict(self.partition),
            "added_files": self.added_files,
            "removed_files": self.removed_files,
            "added_records": self.added_records,
            "removed_records": self.removed_records,
        }


@dataclass(frozen=True)
class CommitMetrics:
    """One committed snapshot's manifest delta (reference
    metrics/CommitMetrics.java).  Partition rollups are derived from the
    manifest entries themselves, so they are exact regardless of which
    operation (insert/update/delete/SCD/compact) produced the commit."""

    table: str
    operation: str
    snapshot_id: int
    duration_ms: float
    added_files: int
    removed_files: int
    added_records: int
    removed_records: int
    partitions: tuple  # tuple[PartitionCommitMetrics, ...]

    def as_dict(self) -> dict:
        return {
            "table": self.table,
            "operation": self.operation,
            "snapshot_id": self.snapshot_id,
            "duration_ms": round(self.duration_ms, 2),
            "added_files": self.added_files,
            "removed_files": self.removed_files,
            "added_records": self.added_records,
            "removed_records": self.removed_records,
            "partitions": [p.as_dict() for p in self.partitions],
        }


# A collector is any callable(metrics) — metrics is ScanMetrics or
# CommitMetrics (reference MetricCollector.collectMetrics(Metrics)).
MetricCollector = Callable[[Any], None]


def dispatch(collectors, metrics) -> None:
    """Deliver ``metrics`` to every collector; a raising collector is
    warned about and skipped so observability can never fail a commit."""
    for c in collectors or ():
        try:
            c(metrics)
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            warnings.warn(f"metric collector {c!r} raised: {exc!r}", stacklevel=2)


def _pkey(partition: dict) -> tuple:
    return tuple(sorted(partition.items(), key=lambda kv: kv[0]))


def commit_metrics(
    table: str,
    operation: str,
    snapshot_id: int,
    duration_ms: float,
    before: list,  # ManifestEntry list pre-mutation
    after: list,  # ManifestEntry list post-mutation
) -> CommitMetrics:
    """Diff two manifests into a CommitMetrics with per-partition
    rollups.  Identity is the data-file path: a file present on both
    sides contributes nothing (metadata-only commits roll up to zero)."""
    before_paths = {e.path for e in before}
    after_paths = {e.path for e in after}
    added = [e for e in after if e.path not in before_paths]
    removed = [e for e in before if e.path not in after_paths]
    rollup: dict[tuple, list[int]] = {}
    for e in added:
        r = rollup.setdefault(_pkey(e.partition), [0, 0, 0, 0])
        r[0] += 1
        r[2] += e.records
    for e in removed:
        r = rollup.setdefault(_pkey(e.partition), [0, 0, 0, 0])
        r[1] += 1
        r[3] += e.records
    return CommitMetrics(
        table=table,
        operation=operation,
        snapshot_id=snapshot_id,
        duration_ms=duration_ms,
        added_files=len(added),
        removed_files=len(removed),
        added_records=sum(e.records for e in added),
        removed_records=sum(e.records for e in removed),
        partitions=tuple(
            PartitionCommitMetrics(
                partition=k,
                added_files=v[0],
                removed_files=v[1],
                added_records=v[2],
                removed_records=v[3],
            )
            for k, v in sorted(rollup.items(), key=lambda kv: repr(kv[0]))
        ),
    )


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
