"""Engine-level scan guards.

The reference refuses scans whose residual filter is ``alwaysTrue``
unless explicitly allowed (``validateFullTableScan``,
sql/IcebergScanExecutor.java:433-439) and can cap the total bytes of
files a single scan may touch (``totalFileSizePerScanLimitInMiB``,
ibid. :264-275).  Both guards run at plan time against the manifest —
before Spark lists a single file.
"""

from __future__ import annotations

from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.metadata import ManifestEntry


class FullTableScanError(Exception):
    pass


class ScanSizeLimitError(Exception):
    pass


class ScanGuard:
    def __init__(
        self,
        allow_full_table_scan: bool = True,
        total_scan_size_limit_mib: int | None = None,
    ) -> None:
        self.allow_full_table_scan = allow_full_table_scan
        self.total_scan_size_limit_mib = total_scan_size_limit_mib

    def check(
        self, table_name: str, filter: E.Expr | None, entries: list[ManifestEntry]
    ) -> None:
        if not self.allow_full_table_scan and (
            filter is None or isinstance(filter, E.AlwaysTrue)
        ):
            raise FullTableScanError(
                f"full table scan of {table_name} refused "
                "(allow_full_table_scan=False; add a filter)"
            )
        if self.total_scan_size_limit_mib is not None:
            total = sum(e.size_bytes for e in entries)
            limit = self.total_scan_size_limit_mib * 1024 * 1024
            if total > limit:
                raise ScanSizeLimitError(
                    f"scan of {table_name} would read {total / 2**20:.1f} MiB "
                    f"(> limit {self.total_scan_size_limit_mib} MiB); "
                    "tighten the filter or raise the limit"
                )
