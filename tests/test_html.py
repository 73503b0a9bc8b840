"""HTML -> text extraction (functions/text.html_to_text): tag/script/
entity handling, the double-decode trap, broken markup tolerance, and
Spark/DuckDB pattern-pipeline parity (the exact contract q201 gates)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from sstable_migrator_spark.functions.text import html_to_text, sql_html_to_text

CASES = [
    ('<html><head><style>p{color:red}</style><script>var x="</div>";</script>'
     '</head><body><h1>Title &amp; more</h1><p>alpha &lt;b&gt; beta</p>'
     '<!-- note --></body></html>',
     'Title & more alpha <b> beta'),
    ('no markup at all', 'no markup at all'),
    ('&amp;lt; stays encoded once', '&lt; stays encoded once'),
    ('<p>multi</p>\n<p>line&nbsp;text</p>', 'multi line text'),
    ('<SCRIPT>upper()</SCRIPT>ok<STYLE a=b>x</STYLE>', 'ok'),
    ('broken <tag never closes', 'broken <tag never closes'),
    ('', ''),
]


def test_html_to_text_semantics(spark):
    df = spark.createDataFrame(
        [(i, c) for i, (c, _want) in enumerate(CASES)], "i long, h string"
    )
    got = {r["i"]: r["t"]
           for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()}
    for i, (_c, want) in enumerate(CASES):
        assert got[i] == want, (i, got[i], want)


def test_sql_twin_parity(spark):
    """The DuckDB twin applies the IDENTICAL pattern pipeline — any
    drift between the two regex dialects must surface here, not in a
    driver hash mismatch."""
    df = spark.createDataFrame(
        [(i, c) for i, (c, _w) in enumerate(CASES)], "i long, h string"
    )
    got = {r["i"]: r["t"]
           for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()}
    con = duckdb.connect()
    for i, (c, _w) in enumerate(CASES):
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS h", [c])
        (d,) = con.execute(f"SELECT {sql_html_to_text('h')} FROM t").fetchone()
        assert got[i] == d, (i, got[i], d)
