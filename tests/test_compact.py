"""compact_small_files: many tiny files -> few split-sized files."""

from __future__ import annotations

import os

from sstable_migrator_spark import sinks


def _file_count(path):
    return sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def test_compact_small_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    # simulate micro-batch accretion: 40 single-row files
    spark.range(40).repartition(40).write.parquet(path)
    assert _file_count(path) > 10  # AQE may coalesce some, stays fragmented
    before = spark.read.parquet(path).collect()

    n = sinks.compact_small_files(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    assert _file_count(path) == 1
    after = spark.read.parquet(path).collect()
    assert sorted(r["id"] for r in after) == sorted(r["id"] for r in before)
