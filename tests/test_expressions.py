"""Expression-tree semantics (reference expressions/Expressions.java;
SURVEY.md §2.C.1-2): NULL literals, IN null-dropping, NOT pushdown by
leaf negation, NaN ordering, and 3-valued stats evaluation."""

import math

from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.expressions import FileStatsView


def sv(partition=None, stats=None, records=None):
    return FileStatsView(partition, stats, records)


def test_null_literal_comparisons_fold_to_false():
    assert isinstance(E.col_eq("c", None), E.AlwaysFalse)
    assert isinstance(E.lt("c", None), E.AlwaysFalse)
    assert isinstance(E.ge("c", None), E.AlwaysFalse)


def test_in_drops_null_literals():
    e = E.in_("c", [1, None, 2])
    assert isinstance(e, E.InPredicate) and e.values == (1, 2)
    assert isinstance(E.in_("c", [None]), E.AlwaysFalse)
    assert isinstance(E.not_in("c", [None]), E.AlwaysTrue)


def test_not_pushes_to_leaves():
    e = E.not_(E.and_(E.col_eq("a", 1), E.lt("b", 5)))
    assert isinstance(e, E.Or)
    assert e.left == E.Predicate("ne", "a", 1)
    assert e.right == E.Predicate("ge", "b", 5)


def test_stats_eval_eq():
    s = sv(stats={"c": {"min": 10, "max": 20, "nulls": 0}}, records=100)
    assert E.col_eq("c", 5).eval_stats(s) is False
    assert E.col_eq("c", 15).eval_stats(s) is None
    assert E.col_eq("c", 25).eval_stats(s) is False
    point = sv(stats={"c": {"min": 7, "max": 7, "nulls": 0}}, records=10)
    assert E.col_eq("c", 7).eval_stats(point) is True
    # with NULLs present, "all rows match" can't be proven
    pn = sv(stats={"c": {"min": 7, "max": 7, "nulls": 1}}, records=10)
    assert E.col_eq("c", 7).eval_stats(pn) is None


def test_stats_eval_ranges():
    s = sv(stats={"c": {"min": 10, "max": 20, "nulls": 0}}, records=100)
    assert E.lt("c", 10).eval_stats(s) is False
    assert E.lt("c", 21).eval_stats(s) is True
    assert E.gt("c", 20).eval_stats(s) is False
    assert E.gt("c", 9).eval_stats(s) is True
    assert E.between("c", 12, 15).eval_stats(s) is None
    assert E.between("c", 0, 100).eval_stats(s) is True


def test_stats_eval_nulls():
    all_null = sv(stats={"c": {"nulls": 5}}, records=5)
    assert E.is_null("c").eval_stats(all_null) is True
    assert E.not_null("c").eval_stats(all_null) is False
    assert E.col_eq("c", 1).eval_stats(all_null) is False
    no_null = sv(stats={"c": {"min": 1, "max": 2, "nulls": 0}}, records=5)
    assert E.is_null("c").eval_stats(no_null) is False


def test_partition_value_exact():
    s = sv(partition={"p": 3})
    assert E.col_eq("p", 3).eval_stats(s) is True
    assert E.col_eq("p", 4).eval_stats(s) is False
    assert E.in_("p", [1, 3]).eval_stats(s) is True
    assert E.not_in("p", [3]).eval_stats(s) is False
    null_part = sv(partition={"p": None})
    assert E.is_null("p").eval_stats(null_part) is True
    assert E.col_eq("p", 3).eval_stats(null_part) is False


def test_nan_semantics():
    nan = float("nan")
    # le(col, NaN) → TRUE shape; gt(col, NaN) → FALSE shape (§2.C.2)
    s = sv(stats={"c": {"min": 1.0, "max": 2.0, "nulls": 0}}, records=3)
    assert E.gt("c", nan).eval_stats(s) is None  # stats can't see NaN
    # python-side total order: NaN greatest
    from swiftlake_spark.tables.expressions import _cmp

    assert _cmp(nan, 1e308) == 1
    assert _cmp(1e308, nan) == -1
    assert _cmp(nan, nan) == 0


def test_starts_with():
    s = sv(stats={"c": {"min": "apple", "max": "banana", "nulls": 0}}, records=3)
    assert E.starts_with("c", "zebra").eval_stats(s) is False
    assert E.starts_with("c", "app").eval_stats(s) is None


def test_and_or_folding():
    t, f = E.always_true(), E.always_false()
    assert isinstance(E.and_(t, f), E.AlwaysFalse)
    assert isinstance(E.or_(t, f), E.AlwaysTrue)
    p = E.col_eq("a", 1)
    assert E.and_(t, p) is p
    assert E.or_(f, p) is p
