"""Bucketed co-located join: same-bucketed tables join with no Exchange."""

from __future__ import annotations

import pytest

from sstable_migrator_spark import sinks


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sinks.bucketed_write(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    sinks.bucketed_write(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 8, ["o_orderkey"],
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    # hint("merge"): at test scale Spark would broadcast (and skip the
    # bucketed scan entirely); the 100 TB shape is the sort-merge path
    joined = spark.table(t1).hint("merge").join(spark.table(t2), "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() > 0


def test_bucketed_agg_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the layout: no shuffle
    before the final single-partition collect of group results."""
    t2 = bucketed_tables[1]
    agg = spark.table(t2).groupBy("o_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
