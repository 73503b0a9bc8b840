"""WebDataset tar shards (sinks/tarshard.py): round-trip, rolling caps,
deterministic bytes, member-layout conformance, adjacency guard."""

from __future__ import annotations

import glob
import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from sstable_migrator_spark.sinks.tarshard import read_tar_shards, write_tar_shards


def _df(spark, n=25):
    return spark.range(n).select(
        F.concat(F.lit("sample"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("key"),
        F.encode(F.concat(F.lit("img-bytes-"), F.col("id")), "utf-8").alias("img"),
        F.concat(F.lit("caption for "), F.col("id")).alias("txt"),
    )


def test_roundtrip_and_manifest(spark, tmp_path):
    df = _df(spark).coalesce(2)
    man = write_tar_shards(df, str(tmp_path), "key", ["img", "txt"], max_rows_per_shard=10)
    assert sum(m["samples"] for m in man) == 25
    with open(tmp_path / "_tar_manifests.json") as fh:
        assert json.load(fh) == man
    back = read_tar_shards(
        spark, str(tmp_path), "key", ["img", "txt"], binary_cols=["img"]
    )
    got = {r["key"]: (bytes(r["img"]), r["txt"]) for r in back.collect()}
    want = {r["key"]: (bytes(r["img"]), r["txt"]) for r in df.collect()}
    assert got == want


def test_rolling_cap_and_member_layout(spark, tmp_path):
    df = _df(spark, 12).coalesce(1)
    write_tar_shards(df, str(tmp_path), "key", ["img", "txt"], max_rows_per_shard=5)
    shards = sorted(glob.glob(str(tmp_path / "shard-*.tar")))
    assert len(shards) == 3  # 5 + 5 + 2
    with tarfile.open(shards[0]) as tf:
        names = tf.getnames()
    # WebDataset convention: one sample's members adjacent, key.field
    assert names[0].endswith(".img") and names[1].endswith(".txt")
    assert names[0].rsplit(".", 1)[0] == names[1].rsplit(".", 1)[0]
    assert len(names) == 10


def test_deterministic_bytes(spark, tmp_path):
    df = _df(spark, 8).coalesce(1)
    write_tar_shards(df, str(tmp_path / "a"), "key", ["img", "txt"])
    write_tar_shards(df, str(tmp_path / "b"), "key", ["img", "txt"])
    a = (tmp_path / "a" / "shard-00000-000.tar").read_bytes()
    b = (tmp_path / "b" / "shard-00000-000.tar").read_bytes()
    assert a == b


def test_null_field_skipped_and_bad_key_raises(spark, tmp_path):
    df = spark.createDataFrame(
        [("k1", b"x", None), ("k2", b"y", "cap")],
        "key string, img binary, txt string",
    )
    write_tar_shards(df, str(tmp_path / "ok"), "key", ["img", "txt"])
    back = read_tar_shards(
        spark, str(tmp_path / "ok"), "key", ["img", "txt"], binary_cols=["img"]
    ).collect()
    got = {r["key"]: r["txt"] for r in back}
    assert got == {"k1": None, "k2": "cap"}

    bad = spark.createDataFrame([("a.b", b"x", "t")], "key string, img binary, txt string")
    with pytest.raises(Exception):
        write_tar_shards(bad, str(tmp_path / "bad"), "key", ["img", "txt"])


def test_non_contiguous_key_rejected(spark, tmp_path):
    """A hand-built tar interleaving two keys violates the WebDataset
    adjacency invariant and must be rejected loudly."""
    import io

    os.makedirs(tmp_path / "evil", exist_ok=True)
    with tarfile.open(tmp_path / "evil" / "shard-00000-000.tar", "w") as tf:
        for name in ["a.txt", "b.txt", "a.img"]:
            ti = tarfile.TarInfo(name)
            ti.size = 1
            tf.addfile(ti, io.BytesIO(b"x"))
    with pytest.raises(Exception, match="contiguous"):
        read_tar_shards(
            spark, str(tmp_path / "evil"), "key", ["txt", "img"]
        ).collect()


def test_dotted_field_name_rejected_at_write(spark, tmp_path):
    """Field names share the member grammar with keys (split on the
    LAST dot): a '.' inside a field would re-split wrong on read, so
    write_tar_shards rejects it up front."""
    df = spark.createDataFrame([("k", b"x")], "key string, img binary")
    for bad in ["im.g", "a/b", ""]:
        with pytest.raises(ValueError, match="field names"):
            write_tar_shards(df, str(tmp_path / "f"), "key", [bad])


def test_unknown_field_raises_on_read(spark, tmp_path):
    """Reading with a payload list that doesn't cover the shard's
    members is a schema mismatch — loud error, never a silent drop."""
    df = spark.createDataFrame([("k", b"x", "t")], "key string, img binary, txt string")
    write_tar_shards(df, str(tmp_path), "key", ["img", "txt"])
    with pytest.raises(Exception, match="schema mismatch"):
        read_tar_shards(spark, str(tmp_path), "key", ["img"], binary_cols=["img"]).collect()


def test_column_subset_projection_with_strict_false(spark, tmp_path):
    """strict=False reads a column SUBSET of a wider shard — the
    previously valid projection read — skipping unknown members."""
    df = spark.createDataFrame(
        [("k1", b"x", "t1"), ("k2", b"y", "t2")],
        "key string, img binary, txt string",
    )
    write_tar_shards(df, str(tmp_path), "key", ["img", "txt"])
    back = read_tar_shards(
        spark, str(tmp_path), "key", ["txt"], strict=False
    ).collect()
    assert {r["key"]: r["txt"] for r in back} == {"k1": "t1", "k2": "t2"}
