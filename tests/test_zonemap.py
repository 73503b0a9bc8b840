"""Zone-map data skipping: pruned reads must equal full-scan filters
(never a false skip), pruning must actually skip files on a range
layout, all-null files are skippable, and empty-result predicates
avoid the scan entirely."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from sstable_migrator_spark.sinks.zonemap import (
    zonemap_prune,
    zonemap_read,
    zonemap_write,
)


def _table(spark, n=2000):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 97).alias("bucket"),
        F.date_add(F.lit("1995-01-01").cast("date"), (F.col("id") % 365).cast("int")).alias("d"),
        F.concat(F.lit("cust-"), F.format_string("%05d", F.col("id") % 500)).alias("ckey"),
    )


def test_pruned_read_equals_full_filter(spark, tmp_path):
    df = _table(spark)
    path = str(tmp_path / "t")
    manifest = zonemap_write(df, path, ["id", "d", "ckey"], n_files=8)
    assert len(manifest["files"]) == 8
    cases = [
        [("id", "between", (100, 180))],
        [("id", ">=", 1900)],
        [("id", "<", 60)],
        [("d", "=", datetime.date(1995, 3, 1))],
        [("ckey", ">=", "cust-00490")],
        [("id", "between", (100, 180)), ("ckey", "<=", "cust-00160")],
    ]
    for preds in cases:
        got = sorted(r["id"] for r in zonemap_read(spark, path, preds).collect())
        full = df
        for c, op, v in preds:
            if op == "between":
                full_f = F.col(c).between(v[0], v[1])
            else:
                full_f = {"=": F.col(c) == v, "<": F.col(c) < v, "<=": F.col(c) <= v,
                          ">": F.col(c) > v, ">=": F.col(c) >= v}[op]
            full = full.filter(full_f)
        want = sorted(r["id"] for r in full.collect())
        assert got == want, preds


def test_pruning_skips_files_on_range_layout(spark, tmp_path):
    path = str(tmp_path / "t")
    zonemap_write(_table(spark), path, ["id"], n_files=8)
    keep, report = zonemap_prune(path, [("id", "between", (0, 200))])
    assert report["files_total"] == 8
    assert report["files_skipped"] >= 6  # narrow range hits ~1 of 8 range files
    assert report["files_read"] == len(keep) >= 1
    assert report["rows_read_bound"] < report["rows_total"]


def test_all_pruned_returns_empty_with_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    zonemap_write(_table(spark, 100), path, ["id"], n_files=4)
    out = zonemap_read(spark, path, [("id", ">", 10_000)])
    assert out.count() == 0
    assert out.columns == ["id", "bucket", "d", "ckey"]
    _, report = zonemap_prune(path, [("id", ">", 10_000)])
    assert report["files_read"] == 0


def test_all_null_files_are_skipped(spark, tmp_path):
    df = spark.range(100).select(
        "id",
        F.when(F.col("id") < 50, F.col("id")).alias("v"),  # second half NULL
    ).orderBy(F.col("v").isNull(), "v")
    path = str(tmp_path / "t")
    zonemap_write(df.coalesce(1), path, ["v"], n_files=4, order_by="id")
    # layout on id puts the null-v rows into dedicated tail files
    keep, report = zonemap_prune(path, [("v", ">=", 0)])
    assert report["files_skipped"] >= 1  # the all-null file(s) dropped
    got = sorted(r["id"] for r in zonemap_read(spark, path, [("v", ">=", 0)]).collect())
    assert got == list(range(50))


def test_misuse_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    zonemap_write(_table(spark, 50), path, ["id"], n_files=2)
    with pytest.raises(ValueError, match="no zone-map stats"):
        zonemap_prune(path, [("bucket", "=", 3)])
    with pytest.raises(ValueError, match="supported ops"):
        zonemap_prune(path, [("id", "!=", 3)])
    with pytest.raises(ValueError, match="stats column"):
        zonemap_write(_table(spark, 10), str(tmp_path / "u"), ["nope"])
    with pytest.raises(ValueError, match="at least one"):
        zonemap_write(_table(spark, 10), str(tmp_path / "u"), [])
