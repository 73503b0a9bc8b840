"""RAG chunking (operators/chunking.py): coverage and overlap
guarantees, edge cases, id stability, and the shuffle-free plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sstable_migrator_spark.operators.chunking import chunk_documents


def _text(n):
    return " ".join(f"t{i}" for i in range(n))


def test_coverage_and_overlap(spark):
    """Every token appears in some chunk; consecutive chunks overlap by
    exactly `overlap` except the clamped tail; reassembling the strided
    prefixes reproduces the document."""
    n, chunk, ov = 103, 32, 8
    docs = spark.createDataFrame([(1, _text(n))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, chunk, ov).collect(), key=lambda r: r["chunk_idx"]
    )
    stride = chunk - ov
    toks = _text(n).split()
    seen = set()
    for r in rows:
        ct = r["chunk_text"].split()
        start = r["chunk_idx"] * stride
        assert ct == toks[start : start + chunk]
        assert r["n_tokens"] == len(ct)
        seen.update(range(start, start + len(ct)))
    assert seen == set(range(n))  # full coverage
    # consecutive overlap: next chunk re-covers the last `ov` tokens
    for a, b in zip(rows, rows[1:]):
        assert a["chunk_text"].split()[stride:] == b["chunk_text"].split()[
            : len(a["chunk_text"].split()) - stride
        ]


@pytest.mark.parametrize("n,expect", [(1, 1), (31, 1), (32, 1), (33, 2), (56, 2), (57, 3), (80, 3)])
def test_chunk_counts(spark, n, expect):
    docs = spark.createDataFrame([(1, _text(n))], "doc_id long, text string")
    assert chunk_documents(docs, 32, 8).count() == expect


def test_empty_doc_yields_nothing_and_ids_stable(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "hello world")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, 32, 8).collect()
    assert [r["doc_id"] for r in rows] == [3]
    a = rows[0]["chunk_id"]
    b = chunk_documents(docs.repartition(7), 32, 8).collect()[0]["chunk_id"]
    assert a == b and len(a) == 32  # md5 hex, partitioning-stable


def test_bad_params_raise(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, 32, 32)
    with pytest.raises(ValueError):
        chunk_documents(docs, 32, -1)


def test_plan_has_no_exchange(spark):
    docs = spark.createDataFrame([(1, _text(100))], "doc_id long, text string")
    plan = (
        chunk_documents(docs, 32, 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
