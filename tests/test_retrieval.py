"""Integer BM25 retrieval (operators/retrieval.py): ranking semantics,
saturation/normalization behavior, determinism, and plan shape."""

from __future__ import annotations

import pytest

from sstable_migrator_spark.operators.retrieval import bm25_topk, build_postings


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark cluster computing engine for large scale data processing"),
            (2, "the cat sat on the mat"),
            (3, "data processing at scale with distributed computing on a cluster"),
            (4, "spark spark spark spark spark"),
            (5, "cooking recipes for a lazy sunday afternoon with the cat"),
        ],
        "doc_id long, text string",
    )


def test_postings_shape(spark):
    post = {(r["doc"], r["term"]): (r["tf"], r["dl"])
            for r in build_postings(_docs(spark)).collect()}
    assert post[(4, "spark")] == (5, 5)
    assert post[(2, "the")] == (2, 6)


def test_ranking_semantics(spark):
    """Multi-term coverage beats keyword stuffing; irrelevant docs are
    absent; order is (score desc, id)."""
    got = bm25_topk(_docs(spark), ["spark", "cluster", "data"], topk=10).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[0] == 1                       # matches all three terms
    assert set(ids) == {1, 3, 4}             # 2 and 5 match nothing
    hits = {r["doc_id"]: r["n_hit"] for r in got}
    assert hits == {1: 3, 3: 2, 4: 1}
    # scores strictly ordered with deterministic tie rule
    scores = [(r["score_q"], r["doc_id"]) for r in got]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))


def test_tf_saturation(spark):
    """Robertson saturation: 5x the tf must yield far less than 5x the
    contribution (k1 bounds the tf factor at k1+1)."""
    docs = spark.createDataFrame(
        [(1, "spark alpha beta gamma delta"), (2, "spark spark spark spark spark"),
         (3, "unrelated filler text about nothing at all here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score_q"]
           for r in bm25_topk(docs, ["spark"], topk=3).collect()}
    assert got[2] < 2 * got[1]


def test_deterministic_under_partitioning(spark):
    docs = _docs(spark)
    a = [tuple(r) for r in bm25_topk(docs, ["data", "cat"], topk=5).collect()]
    b = [tuple(r) for r in
         bm25_topk(docs.repartition(7), ["data", "cat"], topk=5).collect()]
    assert a == b


def test_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark), [])


def test_plan_broadcast_and_take_ordered(spark):
    """The idf side must broadcast and the top-k must plan as
    TakeOrderedAndProject, not a global sort."""
    df = bm25_topk(_docs(spark), ["spark", "data"], topk=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
