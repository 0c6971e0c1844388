"""Snapshot-based lakehouse table format on Parquet, in pure PySpark.

The reference pairs Iceberg (metadata, snapshots, pruning, commits) with
DuckDB (execution).  No Iceberg runtime is available here, so this
package implements the table layer itself, Spark-first:

- ``metadata``    — versioned table metadata + snapshot log + manifests
  (JSON; the scale path is swapping manifests to a columnar format —
  the interfaces never assume in-memory file lists beyond the manifest).
- ``expressions`` — engine expression tree with SQL 3-valued-logic and
  NaN semantics (reference expressions/Expressions.java), used for
  manifest-level partition + min/max file pruning AND compiled to
  Catalyst Columns for the residual row-level filter.
- ``transforms``  — hidden partition transforms: identity, bucket[n],
  truncate[w], year, month, day, hour (reference README.md:52-58),
  each with a Spark Column form (write path) and a Python scalar form
  (pruning path) that agree exactly.
- ``table``       — Table: scan (pruned), append, overwrite-by-filter,
  copy-on-write update/delete, time travel, branches/tags.
- ``catalog``     — directory catalog (``warehouse/db/table``) with the
  reference's ``$timestamp_…``/``$snapshot_…``/``$branch_…``/``$tag_…``
  name sugar (sql/SqlQueryProcessor.java:371-402).
"""

from swiftlake_spark.tables.catalog import Catalog
from swiftlake_spark.tables.table import Table
from swiftlake_spark.tables import expressions as E

__all__ = ["Catalog", "Table", "E"]
