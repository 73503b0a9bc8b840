"""Sketch aggregates: accuracy bounds vs exact answers (q73 carries
its bounds IN-PLAN since round 8 — estimates are engine-specific, so
the oracle gates exact values + integer-cross-multiplied flags)."""

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
        # the exact columns match an independent aggregation...
        assert g["exact_users"] == e["users"]
        # ...and the in-plan bounds (HLL within 6% = 3x nominal std
        # error at rsd=2%; approx-p50 within rank tolerance) hold
        assert g["hll_within_6pct"] == 1
        assert g["p50_rank_ok"] == 1


# ---------------------------------------------------------------------------
# quantile sketch (operators/quantiles.py)
# ---------------------------------------------------------------------------


def test_log_bucket_exact_below_16_and_bounded_error(spark):
    """Every integer below 16 gets its own bucket (exact inverse);
    above, the lower bound is within 6.25% of any member value."""
    from pyspark.sql import functions as F

    from sstable_migrator_spark.operators.quantiles import (
        bucket_lower_bound,
        log_bucket,
    )

    vals = list(range(0, 16)) + [16, 17, 31, 32, 100, 1000, 123456,
                                 (1 << 40) + 12345, (1 << 62) + 7]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v",
        log_bucket(F.col("v")).alias("b"),
    ).select("v", "b", bucket_lower_bound(F.col("b")).alias("lo"))
    for r in df.collect():
        v, lo = r["v"], r["lo"]
        if v < 16:
            assert lo == v, (v, lo)
        else:
            assert lo <= v and (v - lo) * 16 <= v, (v, lo)


def test_quantile_sketch_accuracy_vs_exact(spark):
    """Sketch percentiles must land within one mantissa step below the
    exact percentile of a skewed distribution."""
    from pyspark.sql import functions as F

    from sstable_migrator_spark.operators.quantiles import (
        quantile_sketch,
        sketch_quantiles,
    )

    vals = [i * i % 9973 + 1 for i in range(20000)]  # deterministic, skewed
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["pct"]: r for r in
           sketch_quantiles(quantile_sketch(df, "v"), [50, 90, 99]).collect()}
    import math

    s = sorted(vals)
    for pct in (50, 90, 99):
        exact = s[math.ceil(pct * len(s) / 100) - 1]
        lo = got[pct]["est_lo"]
        assert lo <= exact, (pct, lo, exact)
        assert (exact - lo) * 16 <= exact + 16, (pct, lo, exact)
        assert got[pct]["n"] == len(vals)


def test_quantile_sketch_mergeable_and_stable(spark):
    """Sketches merge by adding counts: union of two halves equals the
    sketch of the whole; results identical under repartitioning."""
    from pyspark.sql import functions as F

    from sstable_migrator_spark.operators.quantiles import quantile_sketch

    vals = [(i % 997) * 3 + 1 for i in range(5000)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v long")
    whole = {r["bucket"]: r["cnt"]
             for r in quantile_sketch(df, "v").collect()}
    a = quantile_sketch(df.filter("i % 2 = 0"), "v")
    b = quantile_sketch(df.filter("i % 2 = 1"), "v")
    merged = {}
    for r in a.unionByName(b).groupBy("bucket").agg(
        F.sum("cnt").alias("cnt")
    ).collect():
        merged[r["bucket"]] = r["cnt"]
    assert merged == whole
    repart = {r["bucket"]: r["cnt"]
              for r in quantile_sketch(df.repartition(13), "v").collect()}
    assert repart == whole
