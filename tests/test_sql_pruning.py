"""resolve_sql WHERE-conjunct extraction → manifest pruning.

Unit layer: tables/sqlextract.py block/conjunct analysis on adversarial
SQL text (no Spark).  Integration layer: engine.sql over a partitioned
native table must prune files (observed via metric collectors) while
returning exactly the unpruned answer.  The full 200-shape differential
corpus runs in tests/test_engine_sql_fuzz.py.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from swiftlake_spark.tables.sqlextract import analyze, mask_literals  # noqa: E402

SCHEMAS = {
    "db.lineitem": {"l_orderkey", "l_partkey", "l_quantity", "l_shipdate",
                    "l_returnflag"},
    "db.orders": {"o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
                  "o_orderpriority"},
    "nation": {"n_nationkey", "n_name"},
    # non-reserved-keyword column names (Spark allows these bare)
    "db.spans": {"id", "start", "width", "end", "case"},
}


def _an(sql):
    return {
        fi.ref + (f"@{fi.alias}" if fi.alias else ""): fi.conjuncts
        for fi in analyze(
            sql,
            mask_literals(sql),
            lambda n: SCHEMAS.get(n),
            lambda b: b in ("db.lineitem", "db.orders", "db.spans"),
        ).values()
    }


class TestAnalyze:
    def test_simple_conjuncts(self):
        got = _an("SELECT l_orderkey FROM db.lineitem "
                  "WHERE l_quantity > 5 AND l_returnflag = 'R'")
        assert got == {"db.lineitem": ["l_quantity > 5", "l_returnflag = 'R'"]}

    def test_join_splits_per_side_and_skips_cross_table(self):
        got = _an(
            "SELECT l.l_orderkey FROM db.lineitem l JOIN db.orders o "
            "ON l.l_orderkey = o.o_orderkey "
            "WHERE l.l_quantity > 5 AND o.o_totalprice > 100 "
            "AND l.l_partkey = o.o_custkey"
        )
        assert got == {
            "db.lineitem@l": ["l_quantity > 5"],
            "db.orders@o": ["o_totalprice > 100"],
        }

    def test_top_level_or_is_one_unit(self):
        got = _an("SELECT * FROM db.orders "
                  "WHERE o_totalprice > 10 OR o_custkey = 5")
        assert got == {"db.orders": ["o_totalprice > 10 OR o_custkey = 5"]}

    def test_or_spanning_tables_extracts_nothing(self):
        got = _an(
            "SELECT * FROM db.lineitem l JOIN db.orders o "
            "ON l.l_orderkey = o.o_orderkey "
            "WHERE l.l_quantity > 5 OR o.o_custkey = 1"
        )
        assert got == {"db.lineitem@l": [], "db.orders@o": []}

    def test_null_extended_side_never_filtered(self):
        got = _an(
            "SELECT * FROM nation n LEFT JOIN db.orders o "
            "ON n.n_nationkey = o.o_custkey WHERE o.o_orderkey IS NULL"
        )
        assert got == {"db.orders@o": []}

    def test_right_join_extends_left_side(self):
        got = _an(
            "SELECT * FROM db.orders o RIGHT JOIN nation n "
            "ON o.o_custkey = n.n_nationkey WHERE o.o_totalprice > 5"
        )
        assert got == {"db.orders@o": []}

    def test_correlated_subquery(self):
        got = _an(
            "SELECT o_orderkey FROM db.orders WHERE o_totalprice < 500 "
            "AND EXISTS (SELECT 1 FROM db.lineitem r "
            "WHERE r.l_orderkey = db.orders.o_orderkey AND r.l_quantity > 30)"
        )
        # outer pred extracted; correlation conjunct skipped (two tables);
        # inner single-table pred extracted for the inner occurrence
        assert got == {
            "db.orders": ["o_totalprice < 500"],
            "db.lineitem@r": ["l_quantity > 30"],
        }

    def test_set_op_arms_independent(self):
        infos = analyze(
            "SELECT o_orderkey FROM db.orders WHERE o_custkey = 1 "
            "UNION ALL SELECT o_orderkey FROM db.orders WHERE o_custkey = 2",
            mask_literals(
                "SELECT o_orderkey FROM db.orders WHERE o_custkey = 1 "
                "UNION ALL SELECT o_orderkey FROM db.orders WHERE o_custkey = 2"
            ),
            lambda n: SCHEMAS.get(n),
            lambda b: b in ("db.lineitem", "db.orders"),
        )
        assert sorted(fi.conjuncts for fi in infos.values()) == [
            ["o_custkey = 1"], ["o_custkey = 2"],
        ]

    def test_between_and_does_not_split(self):
        got = _an("SELECT * FROM db.lineitem "
                  "WHERE l_quantity BETWEEN 1 AND 5 AND l_partkey = 3")
        assert got == {"db.lineitem": ["l_quantity BETWEEN 1 AND 5",
                                       "l_partkey = 3"]}

    def test_literal_noise_is_inert(self):
        got = _an("SELECT * FROM db.orders WHERE o_orderpriority = "
                  "'WHERE x AND FROM db.lineitem OR'")
        assert got == {
            "db.orders": ["o_orderpriority = 'WHERE x AND FROM db.lineitem OR'"]
        }

    def test_unknown_schema_blocks_bare_columns(self):
        got = _an("SELECT * FROM (SELECT 1 AS x) d, db.orders "
                  "WHERE o_custkey = 7 AND x = 1")
        assert got == {"db.orders": []}

    def test_bare_column_of_outer_table_in_subquery_skipped(self):
        # inner block's bare column belongs to the OUTER table: legal SQL
        # correlation; must not be attributed to the inner table
        got = _an(
            "SELECT 1 FROM db.orders WHERE EXISTS "
            "(SELECT 1 FROM db.lineitem WHERE o_custkey = l_partkey)"
        )
        assert got["db.lineitem"] == []

    def test_parameter_marker_bails_entirely(self):
        assert _an("SELECT * FROM db.orders WHERE o_custkey = :k") == {}

    def test_window_clause_keywords_ignored(self):
        got = _an(
            "SELECT o_custkey, ROW_NUMBER() OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderkey) AS rn FROM db.orders WHERE o_totalprice > 3"
        )
        assert got == {"db.orders": ["o_totalprice > 3"]}

    def test_cte_bodies_extract(self):
        got = _an(
            "WITH a AS (SELECT l_orderkey AS k FROM db.lineitem "
            "WHERE l_quantity > 2), b AS (SELECT o_orderkey FROM db.orders "
            "WHERE o_custkey = 5) "
            "SELECT COUNT(*) AS n FROM a JOIN b ON a.k = b.o_orderkey"
        )
        assert got == {
            "db.lineitem": ["l_quantity > 2"],
            "db.orders": ["o_custkey = 5"],
        }

    def test_cte_alias_columns_do_not_leak_to_outer(self):
        # outer WHERE references the CTE's column; must not be attributed
        # to any lakehouse table
        got = _an(
            "WITH a AS (SELECT l_orderkey AS k FROM db.lineitem "
            "WHERE l_quantity > 2) SELECT k FROM a WHERE k < 100"
        )
        assert got == {"db.lineitem": ["l_quantity > 2"]}

    # -- round-8 ADVICE regressions ------------------------------------
    def test_line_comment_bails_entirely(self):
        # '-' lexes as an operator, so without the explicit check the
        # commented-out predicate would become a live pruning conjunct
        assert _an("SELECT * FROM db.orders WHERE o_custkey = 1 "
                   "-- AND o_totalprice = 2") == {}

    def test_block_comment_bails_entirely(self):
        assert _an("SELECT * FROM db.orders /* WHERE o_custkey = 9 */ "
                   "WHERE o_custkey = 1") == {}

    def test_comment_chars_inside_literal_are_inert(self):
        got = _an("SELECT * FROM db.orders WHERE o_orderpriority = '--x/*'"
                  " AND o_custkey = 1")
        assert "o_custkey = 1" in got["db.orders"]

    def test_case_end_nesting_does_not_split(self):
        # an AND between WHEN and THEN is inside the CASE expression;
        # splitting there would prune by a branch condition the WHERE
        # does not imply (rows with o_totalprice <> 2 satisfy this WHERE)
        got = _an(
            "SELECT * FROM db.orders WHERE CASE WHEN o_custkey = 1 "
            "AND o_totalprice = 2 THEN 1 ELSE 0 END = 0 AND o_orderkey = 5"
        )
        conjs = got["db.orders"]
        assert "o_orderkey = 5" in conjs
        assert not any(
            c.replace(" ", "") in ("o_totalprice=2", "o_custkey=1")
            for c in conjs
        )
        assert all("END" in c for c in conjs if "CASE" in c)

    def test_or_inside_case_does_not_collapse_where(self):
        got = _an(
            "SELECT * FROM db.orders WHERE CASE WHEN o_custkey = 1 "
            "OR o_custkey = 2 THEN 1 ELSE 0 END = 1 AND o_orderkey = 5"
        )
        assert "o_orderkey = 5" in got["db.orders"]

    def test_cte_reference_is_never_a_key_source(self):
        # FROM d must resolve to the CTE, not a same-named catalog
        # relation: columns_of must not be consulted for 'd', and the
        # equi edge's other side must be nameless (derived)
        sql = ("WITH d AS (SELECT 1 AS k) SELECT * FROM db.lineitem l "
               "JOIN d ON l.l_orderkey = d.k WHERE l.l_quantity > 2")
        seen = []

        def columns_of(name):
            seen.append(name)
            return SCHEMAS.get(name)

        infos = analyze(sql, mask_literals(sql), columns_of,
                        lambda b: b in ("db.lineitem", "db.orders"))
        assert "d" not in seen
        (fi,) = [f for f in infos.values() if f.ref == "db.lineitem"]
        assert fi.conjuncts == ["l_quantity > 2"]
        for _my_col, other_name, other_span, _oc in fi.equi:
            assert other_name is None and other_span is None

    def test_cte_shadowing_known_schema_name(self):
        # the CTE is named like a real relation with a DIFFERENT schema;
        # bare columns must not be attributed through the shadowed schema
        got = _an(
            "WITH nation AS (SELECT o_custkey AS n_nationkey FROM db.orders"
            " WHERE o_totalprice > 9) "
            "SELECT * FROM nation, db.lineitem WHERE n_nationkey = 3 "
            "AND l_quantity > 2"
        )
        # unknown-schema FROM (the CTE) blocks bare-column attribution in
        # the outer block; the CTE body still extracts
        assert got == {"db.orders": ["o_totalprice > 9"],
                       "db.lineitem": []}

    def test_with_rollup_is_not_a_cte(self):
        got = _an("SELECT o_custkey, COUNT(*) AS n FROM db.orders "
                  "WHERE o_totalprice > 1 GROUP BY o_custkey WITH ROLLUP")
        assert got == {"db.orders": ["o_totalprice > 1"]}

    # -- round-9 ADVICE regressions ------------------------------------
    def test_bare_end_column_does_not_desync_case_tracking(self):
        # ADVICE r8 (medium): the shared paren/CASE depth counter went to
        # -1 on a bare `end` column, so the next CASE restored it to 0
        # and WHEN-branch ANDs split as top-level conjuncts — a branch
        # condition ('start = 2') became a pruning filter that silently
        # dropped matching rows.
        got = _an(
            "SELECT * FROM db.spans WHERE end = 1 AND CASE WHEN id = 5 "
            "AND start = 2 AND width = 3 THEN 1 ELSE 0 END = 0"
        )
        conjs = got["db.spans"]
        assert not any(
            c.replace(" ", "") in ("id=5", "start=2", "width=3")
            for c in conjs
        )

    def test_bare_end_column_siblings_still_extract(self):
        # VERDICT r8 ask #9: a column named `end` must not disable
        # conjunct extraction for the rest of the statement
        got = _an("SELECT * FROM db.spans WHERE end = 1 AND id = 3")
        assert "id = 3" in got["db.spans"]

    def test_qualified_end_column_siblings_still_extract(self):
        got = _an(
            "SELECT * FROM db.spans s WHERE s.end = 1 AND CASE WHEN "
            "s.id = 5 AND s.start = 2 THEN 1 ELSE 0 END = 0 AND s.id = 3"
        )
        conjs = got["db.spans@s"]
        assert "id = 3" in conjs
        assert not any(
            c.replace(" ", "") in ("id=5", "start=2") for c in conjs
        )

    def test_end_column_inside_when_branch_does_not_close_case(self):
        # `end` as a column INSIDE an open CASE must not close it early
        got = _an(
            "SELECT * FROM db.spans WHERE CASE WHEN end = 1 AND start = 2 "
            "THEN 1 ELSE 0 END = 0 AND id = 3"
        )
        conjs = got["db.spans"]
        assert "id = 3" in conjs
        assert not any(c.replace(" ", "") == "start=2" for c in conjs)

    def test_case_named_column_siblings_still_extract(self):
        got = _an("SELECT * FROM db.spans WHERE case = 1 AND id = 2")
        assert "id = 2" in got["db.spans"]

    def test_cte_named_rollup_is_recorded(self):
        # ADVICE r8 (low): 'WITH rollup AS (...)' was mistaken for a
        # GROUP BY modifier, so the CTE name was never recorded and a
        # same-named catalog relation could shadow it
        got = _an(
            "WITH rollup AS (SELECT o_custkey AS k FROM db.orders "
            "WHERE o_totalprice > 9) SELECT * FROM rollup WHERE k < 5"
        )
        assert got == {"db.orders": ["o_totalprice > 9"]}

    def test_function_names_not_columns(self):
        got = _an("SELECT * FROM db.orders "
                  "WHERE LENGTH(o_orderpriority) > 2 AND o_custkey = 1")
        # LENGTH(...) conjunct attributes to orders via its column arg and
        # survives attribution; the grammar then rejects it at parse time
        # (resolve_sql skips it).  The plain conjunct must still extract.
        assert "o_custkey = 1" in got["db.orders"]


class TestResolveSqlPruning:
    @pytest.fixture()
    def eng(self, spark, tmp_path):
        from swiftlake_spark.engine import SwiftLakeEngine

        eng = SwiftLakeEngine(spark, warehouse=str(tmp_path / "wh"))
        schema = ("o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, "
                  "o_orderdate TIMESTAMP, o_status STRING")
        eng.catalog.create_table(
            "db.orders", schema, partition_spec=["bucket(4, o_custkey)"]
        )
        rows = [
            (i, i % 10, float(i),
             dt.datetime(1995, 1, 1) + dt.timedelta(days=i), "AB"[i % 2])
            for i in range(100)
        ]
        eng.insert_into("db.orders").dataframe(
            spark.createDataFrame(rows, schema=schema)
        ).execute()
        return eng

    def _scans(self, eng):
        from swiftlake_spark.plans.metrics import ScanMetrics

        seen = []
        eng.add_metric_collector(
            lambda m: seen.append(m) if isinstance(m, ScanMetrics) else None
        )
        return seen

    def test_prunes_partitions_and_matches_unpruned(self, eng):
        seen = self._scans(eng)
        q = ("SELECT o_orderkey, o_totalprice FROM db.orders "
             "WHERE o_custkey = 3 AND o_totalprice < 50 ORDER BY o_orderkey")
        got = [r.o_orderkey for r in eng.sql(q).collect()]
        assert got == [3, 13, 23, 33, 43]
        assert seen and seen[-1].pruned_files > 0
        eng.catalog.sql_pruning = False
        try:
            assert [r.o_orderkey for r in eng.sql(q).collect()] == got
        finally:
            eng.catalog.sql_pruning = True

    def test_self_join_gets_per_occurrence_filters(self, eng):
        seen = self._scans(eng)
        q = ("SELECT a.o_orderkey FROM db.orders a JOIN db.orders b "
             "ON a.o_orderkey = b.o_orderkey "
             "WHERE a.o_custkey = 3 AND b.o_custkey = 3 AND b.o_totalprice < 10")
        assert [r.o_orderkey for r in eng.sql(q).collect()] == [3]
        # both occurrences scanned pruned (custkey=3 hits one bucket
        # each); join-filter pushdown may re-register each side once
        # more, equally pruned
        assert seen and all(m.scanned_files == 1 for m in seen)

    def test_ambiguous_qualifier_falls_back_unpruned(self, eng):
        seen = self._scans(eng)
        q = ("SELECT o_orderkey FROM db.orders WHERE o_totalprice < 30 "
             "AND EXISTS (SELECT 1 FROM db.orders i "
             "WHERE i.o_orderkey = db.orders.o_orderkey AND i.o_custkey = 3)")
        assert sorted(r.o_orderkey for r in eng.sql(q).collect()) == [3, 13, 23]
        # two FROM occurrences + a table-name qualifier → one shared
        # UNPRUNED view (per-instance filters would be unsound to place)
        assert [m.pruned_files for m in seen] == [0]

    def test_unparseable_conjunct_skipped_not_fatal(self, eng):
        q = ("SELECT o_orderkey FROM db.orders "
             "WHERE o_custkey % 7 = 3 AND o_custkey = 3 ORDER BY o_orderkey")
        assert [r.o_orderkey for r in eng.sql(q).collect()] == [3, 13, 23, 33, 43, 53, 63, 73, 83, 93]

    def test_join_filter_pushdown_prunes_fact_by_dim_keys(self, eng, spark):
        """README 'Joining with a filter table' elevated to the manifest:
        the dim's selectivity (via its extracted conjuncts) bounds the
        fact's join keys, and the fact manifest prunes on the IN set."""
        sch = "l_orderkey BIGINT, l_qty DOUBLE"
        eng.catalog.create_table(
            "db.li", sch, partition_spec=["bucket(4, l_orderkey)"]
        )
        rows = [(i % 100, float(i)) for i in range(300)]
        eng.insert_into("db.li").dataframe(
            spark.createDataFrame(rows, schema=sch)).execute()
        seen = self._scans(eng)
        q = ("SELECT l.l_orderkey, l.l_qty FROM db.li l JOIN db.orders o "
             "ON l.l_orderkey = o.o_orderkey WHERE o.o_custkey = 3 "
             "AND o.o_totalprice < 40 ORDER BY l.l_qty")
        got = [tuple(r) for r in eng.sql(q).collect()]
        li_scans = [m for m in seen if m.table.endswith("/li")]
        assert any(m.pruned_files > 0 for m in li_scans), (
            [(m.scanned_files, m.pruned_files) for m in seen]
        )
        eng.catalog.join_filter_pushdown = False
        try:
            assert [tuple(r) for r in eng.sql(q).collect()] == got
        finally:
            eng.catalog.join_filter_pushdown = True

    def test_join_filter_pushdown_from_plain_temp_view(self, eng, spark):
        # table partitioned on the JOIN key so the IN set can prune
        sch = "l_orderkey BIGINT, l_qty DOUBLE"
        eng.catalog.create_table(
            "db.li2", sch, partition_spec=["bucket(4, l_orderkey)"]
        )
        eng.insert_into("db.li2").dataframe(spark.createDataFrame(
            [(i % 100, float(i)) for i in range(300)], schema=sch)).execute()
        spark.createDataFrame([(3,), (13,)], "k BIGINT") \
            .createOrReplaceTempView("filter_keys")
        seen = self._scans(eng)
        q = ("SELECT DISTINCT l.l_orderkey FROM db.li2 l JOIN filter_keys f "
             "ON l.l_orderkey = f.k ORDER BY l.l_orderkey")
        assert [r.l_orderkey for r in eng.sql(q).collect()] == [3, 13]
        assert any(m.pruned_files > 0 for m in seen)

    def test_join_filter_pushdown_skips_outer_joins(self, eng, spark):
        spark.createDataFrame([(3,)], "k BIGINT") \
            .createOrReplaceTempView("some_keys")
        seen = self._scans(eng)
        q = ("SELECT o.o_orderkey, k FROM db.orders o LEFT JOIN some_keys s "
             "ON o.o_orderkey = s.k WHERE o.o_custkey = 3 "
             "ORDER BY o.o_orderkey")
        rows = eng.sql(q).collect()
        # preserved-side rows without a match must survive
        assert [r.o_orderkey for r in rows] == [3, 13, 23, 33, 43, 53, 63, 73, 83, 93]
        assert [r.k for r in rows][0] == 3
        assert all(r.k is None for r in rows[1:])

    def test_join_filter_pushdown_empty_dim_short_circuits(self, eng, spark):
        spark.createDataFrame([], "k BIGINT") \
            .createOrReplaceTempView("no_keys")
        q = ("SELECT o.o_orderkey FROM db.orders o JOIN no_keys n "
             "ON o.o_orderkey = n.k")
        assert eng.sql(q).count() == 0

    def test_time_travel_ref_still_prunes(self, eng, spark):
        seen = self._scans(eng)
        q = ("SELECT o_orderkey FROM db.orders$branch_main "
             "WHERE o_custkey = 3 AND o_orderkey < 20 ORDER BY o_orderkey")
        assert [r.o_orderkey for r in eng.sql(q).collect()] == [3, 13]
        assert seen[-1].pruned_files > 0
