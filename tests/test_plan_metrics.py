"""Executed-plan metrics harvest: per-operator SQLMetrics from the
final adaptive plan, and the run-log shuffle rollup."""

from __future__ import annotations

from sstable_migrator_spark.plans.metrics import plan_metrics, shuffle_summary


def test_plan_metrics_after_action(spark):
    df = spark.range(100000).selectExpr("id % 7 AS k").groupBy("k").count()
    df.collect()
    ops = plan_metrics(df)
    names = [o["op"] for o in ops]
    assert any("HashAggregate" in n for n in names)
    assert any("Exchange" in n for n in names)
    rng = next(o for o in ops if o["op"] == "Range")
    assert rng["metrics"]["numOutputRows"] == 100000
    ex = next(o for o in ops if o["op"] == "Exchange")
    assert ex["metrics"]["shuffleBytesWritten"] > 0
    assert ex["metrics"]["shuffleRecordsWritten"] > 0


def test_shuffle_summary_feeds_run_log(spark, tmp_path):
    from sstable_migrator_spark.sinks.ops import append_run_log

    df = spark.range(50000).selectExpr("id % 13 AS k").groupBy("k").count()
    df.collect()
    s = shuffle_summary(df)
    assert s["root_output_rows"] == 13
    assert s["shuffle_bytes_written"] > 0
    assert s["shuffle_records_written"] > 0
    # integer dict drops straight into the K8 run log
    log = str(tmp_path / "runlog")
    append_run_log(spark, log, "r1", "nightly_join", s, ts=1.0)
    row = spark.read.parquet(log).collect()[0]
    assert row["metrics"]["root_output_rows"] == 13
