"""Structured-Streaming micro-batch parity (SURVEY T1-T3): the daily
cron tick as availableNow triggers with watermarked dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sstable_migrator_spark.streaming.daily import run_available_now


def test_available_now_micro_batch(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "batch1.csv").write_text(
        "www.example.com,A,1.2.3.4\n"
        "dup.example.com,A,1.2.3.5\n"
        "dup.example.com,A,1.2.3.6\n"
    )
    out_dir = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")

    run_available_now(spark, str(in_dir) + "/*.csv", out_dir, ckpt)
    got = spark.read.parquet(out_dir)
    assert got.count() == 2  # in-batch duplicate suppressed
    assert "batch_date" in got.columns

    # second cron tick: new file, previously-seen key within watermark
    (in_dir / "batch2.csv").write_text(
        "dup.example.com,A,1.2.3.7\n"
        "fresh.example.com,A,1.2.3.8\n"
    )
    run_available_now(spark, str(in_dir) + "/*.csv", out_dir, ckpt)
    got = spark.read.parquet(out_dir)
    doms = [r["domain"] for r in got.collect()]
    assert sorted(doms) == ["dup.example.com", "fresh.example.com", "www.example.com"]
