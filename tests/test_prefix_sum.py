"""global_prefix_sum: the distributed two-phase running sum
(operators/analytics.py) must agree exactly with the single-task
unpartitioned-window definition it replaces, at any partition count."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sstable_migrator_spark.operators.analytics import global_prefix_sum


def _reference(df, order_cols, value_col):
    w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, 0)
    return {
        tuple(r[c] for c in order_cols): r["ref"]
        for r in df.withColumn("ref", F.sum(value_col).over(w)).collect()
    }


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_matches_unpartitioned_window(spark, parts):
    df = spark.range(199).select(
        F.col("id").alias("k"), ((F.col("id") * 7) % 13 + 1).alias("v")
    )
    out, total = global_prefix_sum(df, ["k"], "v", out_col="run", parts=parts)
    got = {(r["k"],): r["run"] for r in out.collect()}
    ref = _reference(df, ["k"], "v")
    assert got == ref
    assert total == df.agg(F.sum("v")).collect()[0][0]


def test_composite_order_and_gaps(spark):
    rows = [(d, c, (d * 31 + c) % 5) for d in range(7) for c in range(d % 4)]
    df = spark.createDataFrame(rows, "a int, b int, v int")
    out, total = global_prefix_sum(df, ["a", "b"], "v", out_col="run", parts=4)
    ref = _reference(df, ["a", "b"], "v")
    assert {(r["a"], r["b"]): r["run"] for r in out.collect()} == ref
    assert total == sum(v for _, _, v in rows)


def test_empty_input(spark):
    df = spark.createDataFrame([], "k int, v long")
    out, total = global_prefix_sum(df, ["k"], "v", out_col="run", parts=3)
    assert out.count() == 0
    assert total == 0


def test_grouped_prefix_sum_matches_window(spark):
    """grouped_prefix_sum == Window.partitionBy(group).orderBy(order)
    running sum, for any partitioning, plus exact group totals."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sstable_migrator_spark.operators.analytics import grouped_prefix_sum

    df = spark.range(200).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("k"),
        ((F.col("id") % 7) + 1).cast("long").alias("v"),
    )
    out, tots = grouped_prefix_sum(df.repartition(11), ["g"], ["k"], "v", "run", parts=5)
    got = {(r["g"], r["k"]): r["run"] for r in out.collect()}
    ref = {(r["g"], r["k"]): r["run"] for r in df.withColumn(
        "run", F.sum("v").over(Window.partitionBy("g").orderBy("k"))
    ).collect()}
    assert got == ref
    assert tots == {("0",): sum(((i % 7) + 1) for i in range(0, 200, 3)),
                    ("1",): sum(((i % 7) + 1) for i in range(1, 200, 3)),
                    ("2",): sum(((i % 7) + 1) for i in range(2, 200, 3))}
