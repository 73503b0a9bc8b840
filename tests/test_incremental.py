"""Incremental materialized-view maintenance (merge_aggregate_state):
the union-reaggregate merge for associative measures, its equivalence
to full recompute, and the avg rejection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sstable_migrator_spark.operators.analytics import merge_aggregate_state


def test_merge_equals_full_recompute(spark):
    base = spark.range(1000).selectExpr(
        "id % 37 AS k", "id AS v", "CAST(id % 251 AS INT) AS m"
    )

    def rollup(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.max("m").alias("mx"),
            F.min("m").alias("mn"),
        )

    snap = rollup(base.filter("id < 700"))
    delta = rollup(base.filter("id >= 700"))
    merged = merge_aggregate_state(
        snap, delta, keys=["k"],
        merges={"n": "count", "sv": "sum", "mx": "max", "mn": "min"},
    )
    full = rollup(base)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_merge_new_and_untouched_keys(spark):
    snap = spark.createDataFrame([(1, 10), (2, 20)], "k long, n long")
    delta = spark.createDataFrame([(2, 5), (3, 7)], "k long, n long")
    got = {
        r["k"]: r["n"]
        for r in merge_aggregate_state(
            snap, delta, keys=["k"], merges={"n": "count"}
        ).collect()
    }
    assert got == {1: 10, 2: 25, 3: 7}  # untouched, merged, new


def test_avg_rejected(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, a double")
    with pytest.raises(ValueError, match="sum\\+count"):
        merge_aggregate_state(df, df, keys=["k"], merges={"a": "avg"})
