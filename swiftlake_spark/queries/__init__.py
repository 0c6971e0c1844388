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


# Driver-gate rotation (round 5).  The correctness driver hash-checks only
# the FIRST 50 entries of queries() in iteration order, so certification must
# rotate: names in _GATE_PRIORITY are emitted first, everything else follows
# in registration order.  Rebuilt per README.md "Driver-gate rotation" from
# the CORRECTNESS_r01..r04 union:
#   1. q76 (the lone red row all 4 rounds — oracle now pins BIGINT over
#      DuckDB's HUGEINT window SUM; needs a green row to confirm);
#   2. q98/q99/q100 (hash-checkable, zero driver rows ever — they sat at
#      positions 51-53 of the round-4 list and missed the 50-slot window);
#   3. queries NEW this round (never had a driver row by construction);
#   4. the rows-only entries (weaker check, but still worth rows) — the
#      round-5 additions q114 (video) and q115 (semantic dedup) included;
#   5. everything else follows in registration order, which is exactly the
#      r1-r3-certified relational block (least-recently certified first) —
#      the r4-certified LLM/extended block registers later, so it naturally
#      falls outside the 50-slot window this round.
_GATE_PRIORITY = [
    'q76_pack_sequences', 'q98_excess_shippers', 'q99_waiting_orders',
    'q100_sales_opportunity',
    # new in round 5
    'q111_nested_evolution', 'q112_murmur3_bucket', 'q113_iceberg_read',
    'q116_simhash_md5',
    # rows-only (weaker driver check)
    'q49_simhash_neardup', 'q50_ann_lsh_topk', 'q58_ivf_topk', 'q53_multimodal_features',
    'q55_embedding_neardup', 'q108_audio_features', 'q114_video_frames', 'q115_semantic_dedup',
]


def _ordered() -> dict[str, QueryDef]:
    """REGISTRY in gate order: _GATE_PRIORITY names first, rest as registered."""
    _load_all()
    first = [n for n in _GATE_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(first)]
    return {n: REGISTRY[n] for n in (*first, *rest)}


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
    return {name: _with_worker_imports(q.fn) for name, q in _ordered().items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
