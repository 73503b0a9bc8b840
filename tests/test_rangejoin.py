"""interval_join: correctness vs naive BETWEEN join, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from sstable_migrator_spark.operators.rangejoin import interval_join


def _frames(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 250.0), (5, -3.0)],
        "pid int, v double",
    )
    ranges = spark.createDataFrame(
        [
            (10, 0.0, 9.99),     # catches 5.0
            (11, 10.0, 30.0),    # catches 15.0 and 25.0
            (12, 20.0, 27.0),    # overlaps 11: 25.0 matches both
            (13, -10.0, -1.0),   # negative range catches -3.0
        ],
        "rid int, lo double, hi double",
    )
    return points, ranges


def test_interval_join_matches_naive(spark):
    points, ranges = _frames(spark)
    got = {
        (r["pid"], r["rid"])
        for r in interval_join(points, ranges, "v", "lo", "hi", 8.0).collect()
    }
    naive = {
        (r["pid"], r["rid"])
        for r in points.join(
            ranges, (points.v >= ranges.lo) & (points.v <= ranges.hi)
        ).collect()
    }
    assert got == naive
    assert (1, 10) in got and (5, 13) in got  # incl. the negative bucket


def test_interval_join_left(spark):
    points, ranges = _frames(spark)
    out = interval_join(points, ranges, "v", "lo", "hi", 8.0, how="left")
    by_pid = {}
    for r in out.collect():
        by_pid.setdefault(r["pid"], []).append(r["rid"])
    assert by_pid[4] == [None]  # 250.0 in no range, still present
    assert sorted(by_pid[3]) == [11, 12]  # overlapping ranges both match


def test_interval_join_is_not_nested_loop(spark):
    """The bucket equi-key must turn the plan into a hash/sort-merge
    join — a NestedLoopJoin means the grid didn't take effect."""
    points, ranges = _frames(spark)
    plan = (
        interval_join(points, ranges, "v", "lo", "hi", 8.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan, plan


def test_interval_join_rejects_zero_bucket_width(spark):
    import pytest

    from sstable_migrator_spark.operators.rangejoin import interval_join

    p = spark.createDataFrame([(1.0,)], "x double")
    r = spark.createDataFrame([(0.0, 2.0)], "lo double, hi double")
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(p, r, "x", "lo", "hi", bucket_width=0.0)
