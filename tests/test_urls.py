"""Canonical URL normalization (functions/urls.py): rule semantics and
Spark/DuckDB twin parity (the contract q202 hash-gates)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from sstable_migrator_spark.functions.urls import canonical_url, sql_canonical_url

CASES = [
    ("HTTP://Example.COM:80/Path/Page?b=2&utm_source=x&a=1#frag",
     "http://example.com/Path/Page?a=1&b=2"),
    ("https://Example.com:443/", "https://example.com/"),
    ("https://example.com:8443/keep:port?z=1&gclid=abc",
     "https://example.com:8443/keep:port?z=1"),
    ("http://example.com/path?", "http://example.com/path"),
    ("http://example.com/path?fbclid=only", "http://example.com/path"),
    ("example.com/noscheme?b=2&a=1", "example.com/noscheme?a=1&b=2"),
    ("ftp://Files.Example.com:21/pub", "ftp://files.example.com:21/pub"),
    ("", ""),
    # path/query case preserved; only scheme+host fold
    ("http://example.com/CaseSensitive/Path?Key=Val&key=val2",
     "http://example.com/CaseSensitive/Path?Key=Val&key=val2"),
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _want) in enumerate(CASES)], "i long, u string"
    )
    got = {r["i"]: r["c"]
           for r in df.select("i", canonical_url(F.col("u")).alias("c")).collect()}
    for i, (_raw, want) in enumerate(CASES):
        assert got[i] == want, (i, got[i], want)


def test_sql_twin_parity(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _w) in enumerate(CASES)], "i long, u string"
    )
    got = {r["i"]: r["c"]
           for r in df.select("i", canonical_url(F.col("u")).alias("c")).collect()}
    con = duckdb.connect()
    for i, (raw, _w) in enumerate(CASES):
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS u", [raw])
        (d,) = con.execute(f"SELECT {sql_canonical_url('u')} FROM t").fetchone()
        assert got[i] == d, (i, got[i], d)
