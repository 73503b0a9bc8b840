"""One-call corpus datasheet (operators/datasheet.py)."""

from __future__ import annotations

import pytest

from sstable_migrator_spark.operators.datasheet import corpus_datasheet


def _rows(df):
    return {
        (r["section"], r["key"], r["metric"]): r["value"] for r in df.collect()
    }


def test_datasheet_planted_counts(spark):
    docs = spark.createDataFrame(
        [
            # 3 copies of one text (dup group of 3), natural English
            (1, "the cat sat on the mat and it is a fine day for all", "en", "web"),
            (2, "the cat sat on the mat and it is a fine day for all", "en", "web"),
            (3, "The cat sat on the  mat and it is a fine day for ALL", "en", "books"),
            # unique short doc (under 10 tokens -> not natural)
            (4, "short text", "de", "web"),
            # unique doc with no stopwords -> not natural
            (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    r = _rows(corpus_datasheet(docs, len_bucket_width=8))
    assert r[("total", "", "docs")] == 5
    # fingerprint normalizes case + whitespace: docs 1-3 collide
    assert r[("dup", "", "exact_dup_docs")] == 2
    assert r[("dup_hist", "3", "groups")] == 1
    assert r[("dup_hist", "1", "groups")] == 2
    assert r[("quality", "", "natural_docs")] == 3
    assert r[("lang", "en", "docs")] == 4
    assert r[("lang", "de", "docs")] == 1
    assert r[("source", "web", "docs")] == 4
    assert r[("source", "books", "docs")] == 1
    # 13-token docs land in band 8, 2- and 10-token docs in bands 0 and 8
    assert r[("len_hist", "0", "docs")] == 1  # "short text" (2 tokens)
    assert r[("len_hist", "8", "docs")] == 4
    # token totals are consistent across sections
    assert r[("total", "", "tokens")] == (
        r[("lang", "en", "tokens")] + r[("lang", "de", "tokens")]
    )


def test_datasheet_rejects_bad_width(spark):
    docs = spark.createDataFrame(
        [(1, "x", "en", "web")], "doc_id long, text string, lang string, source string"
    )
    with pytest.raises(ValueError, match="len_bucket_width"):
        corpus_datasheet(docs, len_bucket_width=0)
