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


# Driver-gate rotation (round 6).  The correctness driver hash-checks only
# the FIRST 50 entries of queries() in iteration order, so certification must
# rotate: names in _GATE_PRIORITY are emitted first, everything else follows
# in registration order.  Rebuilt from the CORRECTNESS_r01..r05 union by
# last-certified round (staleness-first):
#   1. the 8 queries that were rows-only through r5 and carry NEW verdict
#      oracles this round (planted-dup exactness / recall-vs-brute /
#      codec-roundtrip checks) — never hash-certified, so they lead;
#   2. r2-certified (q46, q47), then the r3-certified block (16);
#   3. the r4-certified block (48, registration order) fills the window —
#      its tail rolls to round 7;
#   4. the r5-certified block (42) follows and sits outside the window.
_GATE_PRIORITY = [
    # newly verdict-oracled (never hash-certified)
    'q49_simhash_neardup', 'q50_ann_lsh_topk', 'q58_ivf_topk',
    'q53_multimodal_features', 'q55_embedding_neardup', 'q108_audio_features',
    'q114_video_frames', 'q115_semantic_dedup',
    # last certified r2
    'q46_cosine_topk', 'q47_embedding_stats',
    # last certified r3
    'q30_tumbling_window', 'q31_sessionization', 'q32_json_props',
    'q38_scd_diff_classify', 'q39_map_funcs', 'q40_dedup_exact',
    'q41_dedup_keeper', 'q42_text_stats', 'q43_ngram_jaccard',
    'q44_fingerprint', 'q45_langid_score', 'q60_lateral_join',
    'q61_scalar_subquery', 'q62_grouping_sets', 'q106_decimal_exact',
    'q107_approx_percentile',
    # last certified r4 (first 24 land inside the 50-slot window)
    'q48_minhash_lsh', 'q51_text_quality', 'q52_langid_pred', 'q54_bpe_tokens',
    'q56_hash_split', 'q57_quantiles', 'q59_vocab_topk', 'q63_exists_subquery',
    'q64_explode_tokens', 'q65_string_agg', 'q66_unpivot', 'q67_regexp',
    'q68_sequence', 'q69_bitwise', 'q70_date_arith', 'q71_array_funcs',
    'q72_local_volume', 'q73_window_extras', 'q74_conditional_agg',
    'q75_gopher_rules', 'q77_contamination', 'q78_returned_revenue',
    'q79_median_stats', 'q80_set_ops_all', 'q81_grouping_id',
    'q82_nation_volume', 'q83_important_stock', 'q84_uuid_type',
    'q85_time_type', 'q86_min_cost_supplier', 'q87_order_priority',
    'q88_forecast_revenue', 'q89_market_share', 'q90_nation_profit',
    'q91_customer_distribution', 'q92_promo_revenue', 'q93_top_supplier',
    'q94_part_supplier_count', 'q95_small_qty_revenue',
    'q96_large_volume_customer', 'q97_disjunctive_revenue',
    'q101_recursive_spine', 'q102_dup_clusters', 'q103_pii_redaction',
    'q104_boilerplate_ngrams', 'q105_dedup_corpus', 'q109_bigram_surprisal',
    'q110_length_histogram',
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
