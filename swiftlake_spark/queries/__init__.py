"""Declared query surface (SURVEY.md §2.B) as oracle-checked pairs.

Every operator the engine commits to support gets a named entry here:
a PySpark implementation ``(spark, sf_dir) -> DataFrame`` and, where
SQL-expressible, an equivalent ANSI-SQL oracle string that DuckDB runs on
the same parquet tables.  The driver hash-compares the two at sf0.01
(CORRECTNESS_r{N}.json).

Conventions that make hash-matching robust (FIXTURES.md §4):

- every query has a deterministic ORDER BY on a unique key;
- double aggregates go through DECIMAL (exact, order-independent) and are
  cast back to DOUBLE at the end, identically on both sides;
- COUNT(...) is BIGINT on both sides; sums of integers are cast to BIGINT
  in the oracle (DuckDB would widen to HUGEINT);
- every computed column is aliased to the same name on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a declared query."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def _load_all() -> None:
    # Import side-effect: populate REGISTRY.
    from swiftlake_spark.queries import relational  # noqa: F401
    from swiftlake_spark.queries import events  # noqa: F401
    from swiftlake_spark.queries import llm  # noqa: F401
    from swiftlake_spark.queries import extended  # noqa: F401
    from swiftlake_spark.queries import types  # noqa: F401
    from swiftlake_spark.queries import tpch  # noqa: F401


def _with_worker_imports(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # make the package importable in Python workers no matter what
        # cwd the harness runs from (UDF closures reference the module)
        from swiftlake_spark.session import ensure_worker_imports

        ensure_worker_imports(spark)
        return fn(spark, sf_dir)

    run.__name__ = fn.__name__
    run.__doc__ = fn.__doc__
    return run


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: _with_worker_imports(q.fn) for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
