"""Property-based soundness of manifest pruning (hypothesis).

For random "files" (value lists with NULLs) and random expression trees,
the 3-valued stats evaluation must never contradict row-level truth:

- eval_stats == False  ⇒  NO row matches   (else pruning loses rows!)
- eval_stats == True   ⇒  EVERY row matches
- None is always allowed.

Row-level truth uses SQL 3VL (NULL comparisons are not matches), the
same semantics `Expr.column()` compiles to.
"""

import math

from hypothesis import given, settings, strategies as st

from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.expressions import FileStatsView

values = st.one_of(
    st.none(),
    st.integers(min_value=-50, max_value=50),
)

files = st.lists(values, min_size=0, max_size=12)


def file_stats(rows):
    non_null = [v for v in rows if v is not None]
    stats = {"c": {"nulls": sum(1 for v in rows if v is None)}}
    if non_null:
        stats["c"]["min"] = min(non_null)
        stats["c"]["max"] = max(non_null)
    return FileStatsView(None, stats, records=len(rows))


@st.composite
def exprs(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        kind = draw(
            st.sampled_from(
                ["eq", "ne", "lt", "le", "gt", "ge", "is_null", "not_null",
                 "in", "not_in", "between"]
            )
        )
        v = draw(st.integers(min_value=-60, max_value=60))
        if kind == "is_null":
            return E.is_null("c")
        if kind == "not_null":
            return E.not_null("c")
        if kind == "in":
            return E.in_("c", draw(st.lists(st.integers(-60, 60), max_size=4)))
        if kind == "not_in":
            return E.not_in("c", draw(st.lists(st.integers(-60, 60), max_size=4)))
        if kind == "between":
            lo = draw(st.integers(-60, 60))
            return E.between("c", lo, lo + draw(st.integers(0, 30)))
        return {"eq": E.col_eq, "ne": E.col_ne, "lt": E.lt, "le": E.le,
                "gt": E.gt, "ge": E.ge}[kind]("c", v)
    op = draw(st.sampled_from(["and", "or", "not"]))
    if op == "not":
        return E.not_(draw(exprs(depth + 1)))
    l, r = draw(exprs(depth + 1)), draw(exprs(depth + 1))
    return E.and_(l, r) if op == "and" else E.or_(l, r)


def row_matches(e, v) -> bool:
    """Row-level truth under SQL 3VL (unknown → not matched)."""
    if isinstance(e, E.AlwaysTrue):
        return True
    if isinstance(e, E.AlwaysFalse):
        return False
    if isinstance(e, E.And):
        return row_matches(e.left, v) and row_matches(e.right, v)
    if isinstance(e, E.Or):
        return row_matches(e.left, v) or row_matches(e.right, v)
    if isinstance(e, E.Predicate):
        if e.op == "is_null":
            return v is None
        if e.op == "not_null":
            return v is not None
        if v is None:
            return False
        return {
            "eq": v == e.value, "ne": v != e.value, "lt": v < e.value,
            "le": v <= e.value, "gt": v > e.value, "ge": v >= e.value,
        }[e.op]
    if isinstance(e, E.InPredicate):
        if v is None:
            return False
        return (v not in e.values) if e.negated else (v in e.values)
    raise AssertionError(type(e))


@settings(max_examples=2000, deadline=None)
@given(rows=files, e=exprs())
def test_stats_eval_never_contradicts_rows(rows, e):
    verdict = e.eval_stats(file_stats(rows))
    truths = [row_matches(e, v) for v in rows]
    if verdict is False:
        assert not any(truths), (e, rows, "pruned a file containing matches!")
    elif verdict is True:
        assert all(truths), (e, rows, "claimed all-match falsely")


@settings(max_examples=500, deadline=None)
@given(rows=files, e=exprs())
def test_negation_consistency(rows, e):
    """not_(e) must also be sound, and leaf-negation must complement
    row-level truth exactly (NULLs fail both e and not e)."""
    ne = E.not_(e)
    sv = file_stats(rows)
    v1, v2 = e.eval_stats(sv), ne.eval_stats(sv)
    # both can't claim True unless file is empty; both can't claim all-False
    # when a non-null row exists
    non_null = [v for v in rows if v is not None]
    if rows and v1 is True and v2 is True:
        raise AssertionError((e, rows))
    if non_null and v1 is False and v2 is False:
        raise AssertionError((e, rows, "both e and NOT e claim no matches"))


# ---------------------------------------------------------------------------
# Transform projection soundness: if a ROW satisfies the source predicate,
# the projected partition predicate MUST accept the row's partition value
# (inclusive projection — it may be weaker, never stronger).
# ---------------------------------------------------------------------------
import datetime as dt

from swiftlake_spark.tables.transforms import Transform

transforms = st.sampled_from(
    [
        Transform("identity", "c"),
        Transform("bucket", "c", 8),
        Transform("truncate", "c", 10),
    ]
)

int_preds = st.builds(
    lambda kind, v: {
        "eq": E.col_eq, "ne": E.col_ne, "lt": E.lt, "le": E.le,
        "gt": E.gt, "ge": E.ge,
    }[kind]("c", v),
    st.sampled_from(["eq", "ne", "lt", "le", "gt", "ge"]),
    st.integers(-100, 100),
)


@settings(max_examples=2000, deadline=None)
@given(t=transforms, p=int_preds, v=st.integers(-100, 100))
def test_transform_projection_inclusive(t, p, v):
    if not row_matches(p, v):
        return
    projected = t.project(p)
    pv = t.apply(v)
    sv = FileStatsView({t.partition_name: pv}, None)
    assert projected.eval_stats(sv) is not False, (t, p, v, pv)


@settings(max_examples=1000, deadline=None)
@given(
    t=st.sampled_from(
        [Transform("year", "c"), Transform("month", "c"), Transform("day", "c"),
         Transform("hour", "c")]
    ),
    p_kind=st.sampled_from(["eq", "lt", "le", "gt", "ge"]),
    v=st.datetimes(dt.datetime(2020, 1, 1), dt.datetime(2026, 1, 1)),
    lit=st.datetimes(dt.datetime(2020, 1, 1), dt.datetime(2026, 1, 1)),
)
def test_time_transform_projection_inclusive(t, p_kind, v, lit):
    p = {"eq": E.col_eq, "lt": E.lt, "le": E.le, "gt": E.gt, "ge": E.ge}[p_kind](
        "c", lit
    )
    if not row_matches_dt(p, v):
        return
    sv = FileStatsView({t.partition_name: t.apply(v)}, None)
    assert t.project(p).eval_stats(sv) is not False, (t.name, p_kind, v, lit)


def row_matches_dt(p, v):
    return {
        "eq": v == p.value, "ne": v != p.value, "lt": v < p.value,
        "le": v <= p.value, "gt": v > p.value, "ge": v >= p.value,
    }[p.op]


def test_null_count_sound_with_all_null_row_group(spark, tmp_path):
    """A row group that is ALL NULL has a null count but no min/max; its
    count must reach the manifest (or the nulls stat must be absent) —
    recording nulls=0 would let a delete drop the whole file on an
    unsound not_null verdict, silently losing the NULL rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swiftlake_spark.tables.stats import collect_file_stats

    path = str(tmp_path / "nullgroups.parquet")
    t1 = pa.table({"id": pa.array([1, 2], pa.int64()),
                   "v": pa.array(["a", "b"], pa.string())})
    t2 = pa.table({"id": pa.array([3, 4], pa.int64()),
                   "v": pa.array([None, None], pa.string())})
    w = pq.ParquetWriter(path, t1.schema)
    w.write_table(t1)   # row group 1: 0 nulls, has min/max
    w.write_table(t2)   # row group 2: all NULL, no min/max
    w.close()

    _, _, stats = collect_file_stats(path)
    v = stats.get("v", {})
    # either the true total (2) or absent — NEVER a partial 0
    assert v.get("nulls") in (2, None)

    from swiftlake_spark.tables import expressions as E
    from swiftlake_spark.tables.expressions import FileStatsView

    verdict = E.not_null("v").eval_stats(FileStatsView({}, stats, 4))
    assert verdict is not True  # file contains NULLs: must not claim all-match
    verdict2 = E.is_null("v").eval_stats(FileStatsView({}, stats, 4))
    assert verdict2 is not False  # must not prune the file from IS NULL reads


def test_negated_startswith_astral_plane_soundness():
    """NOT startswith must not claim all-match for a file whose values
    carry the prefix followed by astral-plane characters (they sort
    after U+FFFF, which the old p+'\\uffff' bound missed), and must
    prune when both bounds share the prefix."""
    from swiftlake_spark.tables import expressions as E
    from swiftlake_spark.tables.expressions import FileStatsView, StartsWith

    # all values start with 'a' + emoji → NOT startswith('a') matches 0
    sv = FileStatsView({}, {"s": {"min": "a\U0001F600x", "max": "a\U0001F600z", "nulls": 0}}, 2)
    got = StartsWith("s", "a", negated=True).eval_stats(sv)
    assert got is not True  # old code claimed all-match → deleted kept rows
    assert got is False  # both bounds share the prefix → provably zero match

    # range provably above the successor prefix: all-match is sound
    sv2 = FileStatsView({}, {"s": {"min": "b0", "max": "b9", "nulls": 0}}, 2)
    assert StartsWith("s", "a", negated=True).eval_stats(sv2) is True


def test_date_literal_prunes_string_encoded_bounds():
    """Stats store date/timestamp bounds as ISO strings; date/datetime
    predicate literals must still prune (the common filter shape)."""
    import datetime as dt

    from swiftlake_spark.tables import expressions as E
    from swiftlake_spark.tables.expressions import FileStatsView

    sv = FileStatsView(
        {}, {"d": {"min": "2024-01-01", "max": "2024-01-31", "nulls": 0}}, 10
    )
    assert E.gt("d", dt.date(2024, 2, 1)).eval_stats(sv) is False  # prune
    assert E.lt("d", dt.date(2024, 1, 15)).eval_stats(sv) is None  # may match
    sv2 = FileStatsView(
        {},
        {"ts": {"min": "2024-01-01 00:00:00", "max": "2024-01-01 12:00:00",
                "nulls": 0}},
        10,
    )
    assert E.gt("ts", dt.datetime(2024, 6, 1)).eval_stats(sv2) is False


# -------------------------- REAL-footer soundness (strings, NULL chunks)
# The two data-loss bugs this round both lived OUTSIDE the synthetic-stats
# fuzz above: partial null counts in collect_file_stats (real parquet,
# multiple row groups) and StartsWith bound reasoning on exotic strings.
# This fuzzer drives the REAL pipeline: rows → multi-row-group parquet →
# collect_file_stats → eval_stats, checked against row-level truth.
_STR_ALPHABET = ["a", "ab", "b", "", "ü", "\U0001F600", "a\U0001F600", "aa",
                 "x" * 70, "#n", "null", "a b", "z￿"]

_string_values = st.one_of(st.none(), st.sampled_from(_STR_ALPHABET))


def _str_row_matches(e, v) -> bool:
    if isinstance(e, E.StartsWith):
        if v is None:
            return False
        hit = v.startswith(e.prefix)
        return (not hit) if e.negated else hit
    return row_matches(e, v)


@st.composite
def _str_exprs(draw):
    kind = draw(st.sampled_from(
        ["eq", "ne", "lt", "ge", "is_null", "not_null", "sw", "nsw", "in"]
    ))
    v = draw(st.sampled_from(_STR_ALPHABET))
    if kind == "is_null":
        return E.is_null("c")
    if kind == "not_null":
        return E.not_null("c")
    if kind == "sw":
        return E.StartsWith("c", v)
    if kind == "nsw":
        return E.StartsWith("c", v, negated=True)
    if kind == "in":
        return E.in_("c", draw(st.lists(st.sampled_from(_STR_ALPHABET), max_size=3)))
    return {"eq": E.col_eq, "ne": E.col_ne, "lt": E.lt, "ge": E.ge}[kind]("c", v)


@settings(max_examples=150, deadline=None)
@given(
    g1=st.lists(_string_values, min_size=1, max_size=5),
    g2=st.lists(_string_values, min_size=1, max_size=5),
    e=_str_exprs(),
)
def test_real_footer_stats_sound_on_strings(tmp_path_factory, g1, g2, e):
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from swiftlake_spark.tables.stats import collect_file_stats

    path = str(
        tmp_path_factory.mktemp("fuzz") / f"f{_uuid.uuid4().hex[:8]}.parquet"
    )
    schema = pa.schema([("c", pa.string())])
    w = pq.ParquetWriter(path, schema)
    w.write_table(pa.table({"c": pa.array(g1, pa.string())}))
    w.write_table(pa.table({"c": pa.array(g2, pa.string())}))  # 2nd row group
    w.close()
    rows = g1 + g2
    _, _, stats = collect_file_stats(path)
    verdict = e.eval_stats(FileStatsView(None, stats, records=len(rows)))
    truths = [_str_row_matches(e, v) for v in rows]
    if verdict is False:
        assert not any(truths), (e, rows, stats, "pruned matches")
    elif verdict is True:
        assert all(truths), (e, rows, stats, "claimed all-match falsely")
