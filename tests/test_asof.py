"""asof_join: backward point-in-time semantics, tie-breaks, plan shape."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from sstable_migrator_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),
            (1, _ts("2024-01-01T12:00:00"), "b"),
            (2, _ts("2024-01-01T09:00:00"), "c"),  # before any right row
            (3, _ts("2024-01-01T09:00:00"), "d"),  # key with no right rows
        ],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100, 1.0),  # exact match for first left
            (1, _ts("2024-01-01T11:00:00"), 101, 2.0),
            (1, _ts("2024-01-01T11:00:00"), 102, None),  # ts tie: max id wins
            (2, _ts("2024-01-01T09:30:00"), 200, 4.0),
        ],
        "user_id int, ts timestamp, rid int, score double",
    )
    return left, right


def test_backward_asof_semantics(frames):
    left, right = frames
    out = asof_join(
        left, right, on="user_id", value_cols=["rid", "score"], tie_col="rid"
    )
    rows = {r["tag"]: (r["right_rid"], r["right_score"]) for r in out.collect()}
    assert rows["a"] == (100, 1.0)  # exact-timestamp match allowed
    # ts tie at 11:00 -> rid 102 wins, and BOTH carried cols come from
    # that row (score None, not 2.0 from rid 101)
    assert rows["b"] == (102, None)
    assert rows["c"] == (None, None)  # right rows exist but all later
    assert rows["d"] == (None, None)  # no right rows for key
    assert out.count() == 4  # every left row survives


def test_asof_single_shuffle(frames):
    """The whole operator must cost one Exchange (the keyed window) —
    no join operator in the plan at all."""
    left, right = frames
    out = asof_join(left, right, on="user_id", value_cols=["rid"], tie_col="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_default_value_cols(frames):
    left, right = frames
    out = asof_join(left, right, on="user_id")
    assert {"right_rid", "right_score"} <= set(out.columns)


def test_forward_asof_join(spark):
    """Forward direction: earliest right row at-or-after each left ts;
    exact matches allowed; NULL when no future right exists."""
    from sstable_migrator_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 10), ("k", 25), ("k", 40)], "on string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 10, 1.0), ("k", 20, 2.0), ("k", 30, 3.0)],
        "on string, ts long, px double",
    )
    got = {
        r["ts"]: r["right_px"]
        for r in asof_join(left, right, "on", direction="forward").collect()
    }
    assert got == {10: 1.0, 25: 3.0, 40: None}, got


def test_forward_asof_tie_greatest_wins(spark):
    from sstable_migrator_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 5)], "on string, ts long")
    right = spark.createDataFrame(
        [("k", 7, 1.0), ("k", 7, 9.0)], "on string, ts long, px double"
    )
    got = asof_join(left, right, "on", direction="forward").collect()[0]["right_px"]
    assert got == 9.0


def test_asof_null_keys_never_match(spark):
    """SQL equality never matches NULL keys; the window implementation
    must mask its carried struct to agree with the LATERAL oracle."""
    from sstable_migrator_spark.operators.asof import asof_join

    left = spark.createDataFrame([(None, 10), ("k", 10)], "k string, ts long")
    right = spark.createDataFrame(
        [(None, 5, 1.0), ("k", 5, 2.0)], "k string, ts long, v double"
    )
    got = {r["k"]: r["right_v"] for r in asof_join(left, right, "k").collect()}
    assert got["k"] == 2.0
    assert got[None] is None  # NULL key carries nothing


def test_asof_no_value_cols_raises(spark):
    import pytest

    from sstable_migrator_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 1)], "k string, ts long")
    right = spark.createDataFrame([("k", 1)], "k string, ts long")
    with pytest.raises(ValueError, match="value columns"):
        asof_join(left, right, "k")
