"""Cleaner parity goldens (clean_rdns.go / clean_subdomains.go /
clean_cname.go): error codes EL/ED/EA, output shapes, stripDot handling.
"""

from __future__ import annotations

from sstable_migrator_spark.operators.clean import (
    clean_cname,
    clean_rdns,
    clean_rdns_v1,
    clean_subdomains,
)

TLDS = ["com", "uk", "co", "de", "in", "gov", "org"]


def _lines(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def test_clean_rdns(spark):
    lines = [
        "1.2.3.4,example.com.",      # valid, dot stripped
        "1.2.3.4,*.rescue.com",      # cleanable -> kept (Go behavior)
        "only_one_field",            # EL
        "a,b,c",                     # EL
        "1.2.3.4,bad..domain",       # ED
    ]
    rows = {r["value"]: r for r in clean_rdns(_lines(spark, lines)).collect()}
    assert rows["1.2.3.4,example.com."]["error_code"] is None
    assert rows["1.2.3.4,example.com."]["output"] == "1.2.3.4,example.com"
    assert rows["1.2.3.4,*.rescue.com"]["error_code"] is None
    assert rows["1.2.3.4,*.rescue.com"]["output"] == "1.2.3.4,rescue.com"
    assert rows["only_one_field"]["error_code"] == "EL"
    assert rows["a,b,c"]["error_code"] == "EL"
    assert rows["1.2.3.4,bad..domain"]["error_code"] == "ED"


def test_clean_rdns_v1_apex_mismatch(spark):
    lines = [
        "f0,example.com,www.example.com,f3",   # apex matches
        "f0,wrong.com,www.example.com,f3",     # EA
        "f0,a,b,c,d",                          # EL
        "f0,x.com,bad..dom,f3",                # ED
        "f0,Example.COM,WWW.Example.COM,f3",   # Go is case-preserving: VALID
        "f0,example.com,WWW.Example.COM,f3",   # case mismatch vs apex: EA
    ]
    rows = {r["value"]: r for r in clean_rdns_v1(_lines(spark, lines), TLDS).collect()}
    ok = rows["f0,example.com,www.example.com,f3"]
    assert ok["error_code"] is None
    # Go output drops the apex field: f0,domain,f3 (clean_rdns.go:39)
    assert ok["output"] == "f0,www.example.com,f3"
    assert rows["f0,wrong.com,www.example.com,f3"]["error_code"] == "EA"
    assert rows["f0,a,b,c,d"]["error_code"] == "EL"
    assert rows["f0,x.com,bad..dom,f3"]["error_code"] == "ED"
    mixed = rows["f0,Example.COM,WWW.Example.COM,f3"]
    assert mixed["error_code"] is None
    assert mixed["output"] == "f0,WWW.Example.COM,f3"
    assert rows["f0,example.com,WWW.Example.COM,f3"]["error_code"] == "EA"


def test_clean_subdomains(spark):
    lines = [
        "com,example,www,,,,,2024-01-01",   # -> www.example.com
        "com,example,*,,,,,2024-01-01",     # '*' skipped -> example.com
        "a,b,2024",                          # EL (arity 3)
        "com,-bad-,x,,,,,2024-01-01",       # ED
    ]
    rows = {r["value"]: r for r in clean_subdomains(_lines(spark, lines)).collect()}
    assert rows["com,example,www,,,,,2024-01-01"]["output"] == "www.example.com,2024-01-01"
    assert rows["com,example,*,,,,,2024-01-01"]["output"] == "example.com,2024-01-01"
    assert rows["a,b,2024"]["error_code"] == "EL"
    assert rows["com,-bad-,x,,,,,2024-01-01"]["error_code"] == "ED"


def test_clean_cname(spark):
    lines = [
        "target.com,apex.com,www.apex.com",  # valid -> target,domain
        "target.com,apex.com",               # EL
        "bad..t,apex.com,www.apex.com",      # ED
        "target.com.,apex.com,www.apex.com.",  # Go keeps FQDN dots as-given
    ]
    rows = {r["value"]: r for r in clean_cname(_lines(spark, lines)).collect()}
    assert rows["target.com,apex.com,www.apex.com"]["output"] == "target.com,www.apex.com"
    assert rows["target.com,apex.com"]["error_code"] == "EL"
    assert rows["bad..t,apex.com,www.apex.com"]["error_code"] == "ED"
    dotted = rows["target.com.,apex.com,www.apex.com."]
    assert dotted["error_code"] is None
    assert dotted["output"] == "target.com.,www.apex.com."  # no stripDot in Go
