from __future__ import annotations

from pyspark.sql import functions as F

from sstable_migrator_spark.functions.net import (
    int_to_ip,
    ip_block,
    ip_int,
    is_valid_ipv4,
)


def test_ip_blocks_golden(spark):
    """App.java:673-699: byte-aligned masking == zeroing trailing octets."""
    df = spark.createDataFrame([("203.145.7.91",), ("8.8.8.8",)], "ip string")
    rows = df.select(
        ip_block(F.col("ip"), 8).alias("ip8"),
        ip_block(F.col("ip"), 16).alias("ip16"),
        ip_block(F.col("ip"), 24).alias("ip24"),
        ip_int(F.col("ip")).alias("n"),
    ).collect()
    assert tuple(rows[0]) == ("203.0.0.0", "203.145.0.0", "203.145.7.0",
                              203 * 16777216 + 145 * 65536 + 7 * 256 + 91)
    assert tuple(rows[1]) == ("8.0.0.0", "8.8.0.0", "8.8.8.0",
                              8 * 16777216 + 8 * 65536 + 8 * 256 + 8)


def test_ip_validity(spark):
    good = ["0.0.0.0", "255.255.255.255", "1.2.3.4", "99.100.200.250"]
    bad = ["256.1.1.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "1..2.3", "01.2.3.999", ""]
    df = spark.createDataFrame([(v,) for v in good + bad], "ip string")
    got = [r[0] for r in df.select(is_valid_ipv4(F.col("ip"))).collect()]
    assert got == [True] * len(good) + [False] * len(bad)


def test_int_ip_roundtrip(spark):
    vals = [0, 1, 255, 256, 16909060, 4294967295]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    rows = df.select(ip_int(int_to_ip(F.col("n"))).alias("rt")).collect()
    assert [r["rt"] for r in rows] == vals
