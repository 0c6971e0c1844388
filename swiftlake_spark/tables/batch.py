"""Batch transaction: many writes, one commit.

Reference A22 (writer/TableBatchTransaction.java:43-152): accumulate N
write operations against one table and commit a single snapshot — used
to amortize catalog round-trips when a job produces many small writes.
Appends batch freely; mixing in overwrites is rejected (the reference
validates overwrite compatibility; batching appends is the supported
shape here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from swiftlake_spark.tables.metadata import ManifestEntry, Snapshot, ValidationError
from swiftlake_spark.tables.table import Table


class TableBatchTransaction:
    def __init__(self, table: Table, branch: str = "main") -> None:
        self.table = table
        self.branch = branch
        self._pending: list[ManifestEntry] = []
        self._records = 0
        self._committed = False

    def append(self, df: DataFrame) -> "TableBatchTransaction":
        if self._committed:
            raise ValidationError("batch transaction already committed")
        entries = self.table._write_files(df)
        self._pending.extend(entries)
        self._records += sum(e.records for e in entries)
        return self

    def commit(self) -> Snapshot:
        if self._committed:
            raise ValidationError("batch transaction already committed")
        if not self._pending:
            raise ValidationError("nothing to commit")
        pending = list(self._pending)
        snap = self.table._commit(
            op="append",
            branch=self.branch,
            mutate=lambda current: current + pending,
            validate=None,
            summary={
                "added-files": len(pending),
                "added-records": self._records,
                "batched-writes": True,
            },
        )
        self._committed = True
        return snap
