"""Watermarked tumbling-window agg: append-mode finalization + late-data
drop across micro-batches."""

from __future__ import annotations

from pyspark.sql import types as T

from sstable_migrator_spark.streaming.daily import windowed_counts

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("k", T.StringType()),
    ]
)


def _tick(spark, in_dir, out_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).csv(str(in_dir) + "/*.csv")
    out = windowed_counts(stream, window="1 hour", watermark="1 hour", key="k")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r["window_start"].isoformat(), r["k"]): r["n"]
        for r in spark.read.parquet(str(out_dir)).collect()
    }


def test_windowed_counts_late_data(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    # batch 1: two events in the 10:00 window, one at 13:00 (advances
    # the watermark to 12:00, finalizing the 10:00 window)
    (in_dir / "b1.csv").write_text(
        "2024-01-01T10:05:00,a\n"
        "2024-01-01T10:20:00,a\n"
        "2024-01-01T13:00:00,a\n"
    )
    got = _tick(spark, in_dir, out_dir, ckpt)
    assert got.get(("2024-01-01T10:00:00", "a")) == 2
    # 13:00 window not finalized yet (watermark hasn't passed its end)
    assert ("2024-01-01T13:00:00", "a") not in got

    # batch 2: a LATE event for the already-finalized 10:00 window must
    # be dropped; a 15:00 event advances the watermark past 13:00+1h
    (in_dir / "b2.csv").write_text(
        "2024-01-01T10:40:00,a\n"
        "2024-01-01T15:30:00,a\n"
    )
    got = _tick(spark, in_dir, out_dir, ckpt)
    assert got.get(("2024-01-01T10:00:00", "a")) == 2  # unchanged: late row dropped
    assert got.get(("2024-01-01T13:00:00", "a")) == 1  # now finalized


def test_drift_stream_flags(spark, tmp_path):
    """drift_stream: windowed counts vs a static baseline — within-band
    keys pass, >50% deviation flags, and a key unknown to the baseline
    flags on first sight."""
    from sstable_migrator_spark.streaming.daily import drift_stream

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    baseline = spark.createDataFrame(
        [("a", 4), ("b", 2)], "k string, expected_per_window long"
    )
    # 10:00 window: a x4 (on-baseline), b x4 (2x baseline), c x1 (new
    # key); the 13:00 row advances the watermark past 11:00 so the
    # 10:00 window finalizes
    (in_dir / "b1.csv").write_text(
        "".join(f"2024-01-01T10:{m:02d}:00,a\n" for m in (1, 2, 3, 4))
        + "".join(f"2024-01-01T10:{m:02d}:00,b\n" for m in (5, 6, 7, 8))
        + "2024-01-01T10:09:00,c\n"
        + "2024-01-01T13:00:00,a\n"
    )
    stream = spark.readStream.schema(SCHEMA).csv(str(in_dir) + "/*.csv")
    out = drift_stream(
        stream, baseline, key="k", window="1 hour", watermark="1 hour",
        threshold_num=1, threshold_den=2,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"].isoformat(), r["k"]): (
            r["n"], r["expected_per_window"], r["drifted"]
        )
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    assert got[("2024-01-01T10:00:00", "a")] == (4, 4, 0)
    assert got[("2024-01-01T10:00:00", "b")] == (4, 2, 1)
    assert got[("2024-01-01T10:00:00", "c")] == (1, 0, 1)
    # 13:00 window not finalized yet
    assert ("2024-01-01T13:00:00", "a") not in got
