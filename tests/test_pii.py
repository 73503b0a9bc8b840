"""PII scrub functions: category counts, redaction, span boundaries.
Training-data extension (no reference analog — see README coverage
table); patterns must stay inside the Java/RE2 shared regex subset so
the DuckDB oracle (q82) sees identical matches."""

from __future__ import annotations

from pyspark.sql import functions as F

from sstable_migrator_spark.functions.pii import PII_PATTERNS, pii_count, redact_pii

SAMPLE = (
    "mail user5@example.com or u.x+1@a-b.co call 555-012-3456 or "
    "555.987.6543 from 10.1.2.99 and 192.168.255.255 end"
)


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(
        *[pii_count(F.col("t"), k).alias(f"n_{k}") for k in PII_PATTERNS],
        redact_pii(F.col("t")).alias("red"),
    ).first()


def test_counts_and_redaction(spark):
    r = _one(spark, SAMPLE)
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (2, 2, 2)
    assert r["red"] == (
        "mail <EMAIL> or <EMAIL> call <PHONE> or <PHONE> from <IPV4> and <IPV4> end"
    )


def test_no_pii_passthrough(spark):
    text = "plain text with numbers 123 and a dot. nothing else"
    r = _one(spark, text)
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (0, 0, 0)
    assert r["red"] == text


def test_boundaries(spark):
    # word boundaries: digits glued to letters are not phones/IPs;
    # a trailing-dot sentence end does not extend an IP match
    r = _one(spark, "v1.2.3.4beta and build555-123-4567x but 10.0.0.1.")
    assert r["n_phone"] == 0
    # '1.2.3.4beta' fails the trailing \b (digit->letter is not a
    # boundary); '10.0.0.1.' matches up to the last digit
    assert r["n_ipv4"] == 1


def test_categories_disjoint(spark):
    # phone with dot separators is not an IPv4 (3 groups vs 4)
    r = _one(spark, "call 555.987.6543 now")
    assert (r["n_phone"], r["n_ipv4"]) == (1, 0)
