"""Physical-plan regression checks: filters reach the parquet scan,
column pruning holds, small dims broadcast, and no row-at-a-time Python
UDF ever appears in a declared query (Arrow-batched Pandas UDFs are the
only sanctioned Python, and only in the operators that need them)."""

import pytest

SF = "/root/testdata/sf0.001"


def formatted_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def queries():
    from swiftlake_spark.queries import all_queries

    return all_queries()


def test_q01_filter_pushdown_and_column_pruning(spark, queries):
    plan = formatted_plan(queries["q01_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 7 needed columns — key columns absent
    assert "l_orderkey" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_q03_broadcasts_small_dims(spark, queries):
    plan = formatted_plan(queries["q03_shipping_priority"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_q06_outer_join_pushdown(spark, queries):
    plan = formatted_plan(queries["q06_left_outer_join"](spark, SF))
    # left join preserves all customers; orders scan still prunes columns
    read_schemas = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ]
    assert all("o_orderpriority" not in line for line in read_schemas)


def test_no_row_python_udf_anywhere(spark, queries):
    for name, fn in queries.items():
        plan = formatted_plan(fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"


def test_pandas_udf_only_in_sanctioned_queries(spark, queries):
    arrow_users = set()
    for name, fn in queries.items():
        if "ArrowEvalPython" in formatted_plan(fn(spark, SF)):
            arrow_users.add(name)
    assert arrow_users <= {
        "q50_ann_lsh_topk",
        "q53_multimodal_features",
        "q55_embedding_neardup",
    }, arrow_users


def test_table_scan_residual_filter_pushed(spark, tmp_path):
    from swiftlake_spark.engine import SwiftLakeEngine
    from swiftlake_spark.tables import E

    eng = SwiftLakeEngine(spark=spark, warehouse=str(tmp_path / "wh"))
    t = eng.catalog.create_table("db.pp", "id BIGINT, cat STRING")
    t.append(spark.createDataFrame([(1, "A"), (2, "B")], schema=t.schema))
    plan = formatted_plan(t.scan(E.and_(E.col_eq("cat", "A"), E.gt("id", 0))))
    assert "PushedFilters" in plan
    assert "EqualTo(cat,A)" in plan and "GreaterThan(id,0)" in plan


def test_q72_six_way_join_broadcasts_dims(spark, queries):
    """TPC-H Q5 shape: supplier/nation/region reach the plan as broadcast
    joins; the only shuffle-worthy join is orders⋈lineitem."""
    plan = formatted_plan(queries["q72_local_volume"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    # region filter is pushed into its scan, not applied post-join
    assert "PushedFilters: [In(r_name" in plan or "PushedFilters: [IsNotNull(r_name), In(r_name" in plan


def test_q63_exists_becomes_semi_join(spark, queries):
    """Correlated EXISTS must decorrelate to a semi join — never a
    nested-loop re-scan per outer row."""
    plan = formatted_plan(queries["q63_exists_subquery"](spark, SF))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
