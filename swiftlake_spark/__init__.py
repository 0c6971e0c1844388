"""swiftlake_spark — a PySpark-native lakehouse analytics engine.

A brand-new engine with the query and data-processing capabilities of
arcesium/swiftlake (see SURVEY.md), re-expressed Spark-first:

- ``session``   — SparkSession factory tuned for the engine (UTC, AQE, Arrow).
- ``engine``    — the user-facing engine object: ``sql()``, ``table()``,
  DML builders (insert / insert-overwrite / update / delete / SCD1 / SCD2).
- ``tables``    — snapshot-based table format on Parquet (partition
  transforms, file-level stats pruning, copy-on-write rewrites, time travel).
- ``operators`` — large-scale data-pipeline operators beyond the reference
  surface: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  embedding similarity search, text analysis, multimodal column plumbing.
- ``queries``   — the declared query surface (SURVEY.md §2.B) as
  (PySpark implementation, DuckDB oracle SQL) pairs.

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning and
join strategy; Python never materializes row sets on the driver in an
operator path.
"""

from swiftlake_spark.config import EngineConfig
from swiftlake_spark.session import build_session
from swiftlake_spark.engine import SwiftLakeEngine

__all__ = ["EngineConfig", "build_session", "SwiftLakeEngine"]
__version__ = "0.1.0"
