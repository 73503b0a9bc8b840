"""Sketch aggregates: accuracy bounds vs exact answers (q73 has no SQL
oracle by design — estimates are engine-specific)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sstable_migrator_spark.queries import QUERIES, _t

SF = "/root/testdata/sf0.001"


def test_sketches_bound_error(spark):
    got = {
        r["event_type"]: r for r in QUERIES["q73_approx_sketches"](spark, SF).collect()
    }
    ev = _t(spark, SF, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
        )
        .collect()
    }
    assert set(got) == set(exact) and got
    for et, e in exact.items():
        g = got[et]
        # HLL++ at rsd=2%: allow 3x the nominal std error
        assert abs(g["approx_users"] - e["users"]) <= max(3, 0.06 * e["users"])
        # quantile sketch with 10k accuracy on ~2k rows is near-exact
        assert abs(g["approx_p50"] - e["p50"]) <= 0.05 * max(1.0, e["p50"])
