"""Plan-level guards and metrics (reference A8/A23/A30 + §7 step 8)."""

from swiftlake_spark.plans.guards import ScanGuard, FullTableScanError, ScanSizeLimitError
from swiftlake_spark.plans.metrics import ScanMetrics, table_history

__all__ = [
    "ScanGuard",
    "FullTableScanError",
    "ScanSizeLimitError",
    "ScanMetrics",
    "table_history",
]
