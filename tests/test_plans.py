"""Plan-quality assertions: the physical plans we WANT, not just plans
that pass — pushdown reaches the parquet scan, small dims broadcast,
top-k avoids global sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from sstable_migrator_spark import queries as Q
from sstable_migrator_spark.plans import explain


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") > 1000)
        .select("o_orderkey", "o_totalprice")
    )
    plan = explain._plan(df)
    assert "PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,1000)]" in plan
    cols = explain.read_schema_columns(df)
    assert set(cols) == {"o_orderkey", "o_totalprice"}, cols


def test_dimension_joins_broadcast(spark, sf_dir):
    df = Q.q_join_enrich_region(spark, sf_dir)
    assert explain.has_broadcast_hash_join(df)
    plan = explain._plan(df)
    assert "SortMergeJoin" not in plan


def test_geoip_bucketed_join_is_broadcast_hash(spark, sf_dir):
    """The range join must plan as BroadcastHASHJoin on the /8 bucket
    (equi key), not BroadcastNestedLoopJoin over every range."""
    df = Q.q_geoip_enrich(spark, sf_dir)
    plan = explain._plan(df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    df = Q.q_group_topk(spark, sf_dir)
    plan = explain._plan(df)
    assert "TakeOrderedAndProject" in plan


def test_flagship_compiles_whole_stage(spark, sf_dir):
    """The ingest pipeline must stay inside whole-stage codegen (no 64KB
    fallback) — guarded here because it regressed during development.
    AQE hides codegen spans before execution, so execute first and
    assert on the final adaptive plan."""
    df = Q.flagship_ingest(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark operators inside a compiled whole-stage span
    assert "*(1)" in plan and "*(2)" in plan, plan[:2000]
