"""Bloom semi-join prefilter: zero false negatives (the exactness
property the oracle relies on), measured false-positive rate near the
target, NULL handling, filter reuse, and composition == plain semi
join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sstable_migrator_spark.operators.bloomjoin import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
)


def test_no_false_negatives_and_bounded_fpp(spark):
    small = spark.range(0, 2000).select((F.col("id") * 3).alias("key"))
    bl = build_bloom(small, "key", fpp=0.01)
    assert bl["n_keys"] == 2000 and bl["k"] >= 1

    probe = spark.range(0, 20000).select(F.col("id").alias("key"))
    passed = probe.filter(bloom_might_contain(bl, "key"))
    got = {r["key"] for r in passed.collect()}
    members = {i * 3 for i in range(2000)}
    assert members <= got  # every member passes: NO false negatives
    false_pos = len(got - members)
    non_members = 20000 - len(members & set(range(20000)))
    assert false_pos / non_members < 0.05  # target 1%, generous margin


def test_semi_join_composition_exact(spark):
    big = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    small = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    got = sorted(r["k"] for r in bloom_semi_join(big, small, "k").collect())
    want = sorted(
        r["k"] for r in big.join(small.distinct(), "k", "left_semi").collect()
    )
    assert got == want


def test_null_keys_probe_false(spark):
    small = spark.range(5).select(F.col("id").alias("k"))
    bl = build_bloom(small, "k")
    probe = spark.createDataFrame([(1,), (None,)], "k long")
    got = {
        r["k"]: r["hit"]
        for r in probe.select("k", bloom_might_contain(bl, "k").alias("hit")).collect()
    }
    assert got[1] is True and got[None] is False


def test_bloom_reuse_and_string_keys(spark):
    small = spark.createDataFrame([(f"dom{i}.com",) for i in range(100)], "k string")
    bl = build_bloom(small, "k", fpp=0.001)
    big = spark.createDataFrame(
        [(f"dom{i}.com",) for i in range(50)] + [(f"other{i}.net",) for i in range(50)],
        "k string",
    )
    out = bloom_semi_join(big, small, "k", bloom=bl)
    assert sorted(r["k"] for r in out.collect()) == sorted(
        f"dom{i}.com" for i in range(50)
    )


def test_bad_fpp_rejected(spark):
    small = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="fpp"):
        build_bloom(small, "k", fpp=1.5)


def test_key_type_mismatch_rejected(spark):
    """xxhash64 hashes the raw type: string '5' != bigint 5, so a
    coerced-equality semi join would match rows the bloom drops —
    the mismatch must fail loudly, not false-negative silently."""
    big = spark.createDataFrame([("5",), ("6",)], "k string")
    small = spark.range(5, 7).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="type mismatch"):
        bloom_semi_join(big, small, "k")
