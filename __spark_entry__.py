"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (TPC-H Q1 pricing summary) at sf0.001.
- ``queries()`` — every declared operator from SURVEY.md §2 as
  ``(spark, sf_dir) -> DataFrame`` callables.
- ``oracle_sql()`` — matching DuckDB SQL for the hash-compare gate.

Implementations live in ``swiftlake_spark.queries`` (one module per
surface area: relational / events / llm).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter where the driver runs us from.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from swiftlake_spark.queries import all_oracles, all_queries  # noqa: E402
from swiftlake_spark.session import tune_existing  # noqa: E402
from swiftlake_spark.config import EngineConfig  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_existing(spark, EngineConfig())
    q = all_queries()["q01_pricing_summary"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
