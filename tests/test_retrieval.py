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
    """The single-row stats side must broadcast, the top-k must plan as
    TakeOrderedAndProject (not a global sort), and the fixed-terms form
    must stay map-only: no postings explode, no data-sized shuffle join
    (round 10 — per-term tf is an array count, df/N/T ride ONE bounded
    aggregate)."""
    df = bm25_topk(_docs(spark), ["spark", "data"], topk=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "Generate" not in plan  # no explode anywhere in the scoring path


def test_postings_index_roundtrip_and_pruning(spark, tmp_path):
    """The persisted index serves the SAME results as the corpus-scan
    path, and the serve-path scan is partition-pruned to the query
    terms' hash buckets — index lookup, not corpus scan."""
    from pyspark.sql import functions as F

    from sstable_migrator_spark.functions import text as TX
    from sstable_migrator_spark.operators.retrieval import (
        _PB_SEED,
        bm25_topk_from_postings,
        term_bucket_py,
        write_postings_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    meta = write_postings_index(docs, path, n_buckets=16)
    assert meta["n"] == 5 and meta["n_buckets"] == 16

    terms = ["spark", "cluster", "data"]
    base = bm25_topk(docs, terms, topk=10).collect()
    served = bm25_topk_from_postings(spark, path, terms, topk=10)
    assert [tuple(r) for r in served.collect()] == [tuple(r) for r in base]

    # driver-side bucket twin agrees with the column hash
    col_pb = {
        r["term"]: r["pb"]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select("term", (TX.hash64(F.col("term"), seed=_PB_SEED) % 16).alias("pb"))
        .collect()
    }
    for t in terms:
        assert term_bucket_py(t, 16) == col_pb[t]

    # the scan is pruned: PartitionFilters on pb, strictly fewer
    # buckets than the index holds
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pb" in plan
    want_pbs = {term_bucket_py(t, 16) for t in terms}
    assert len(want_pbs) < 16
    import glob as _glob
    import os as _os

    all_dirs = {d for d in _os.listdir(path) if d.startswith("pb=")}
    assert {f"pb={b}" for b in want_pbs} <= all_dirs
    # files ACTUALLY read (input_file_name over the pruned scan — a
    # runtime account, unlike inputFiles() which is pre-pruning) sit
    # only in the query buckets' directories
    read_dirs = {
        r[0].split("/")[-2]
        for r in spark.read.parquet(path)
        .filter(F.col("pb").isin(sorted(want_pbs)))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert read_dirs and read_dirs <= {f"pb={b}" for b in want_pbs}, read_dirs


def test_batch_scorer_matches_per_query(spark):
    from sstable_migrator_spark.operators.retrieval import bm25_topk_batch

    docs = _docs(spark)
    queries = {
        "qa": ["spark", "cluster", "data"],
        "qb": ["cat", "mat"],
        "qc": ["cooking", "spark"],
    }
    got = bm25_topk_batch(docs, queries, topk=3).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score_q"], r["n_hit"])
        )
    for qid, terms in queries.items():
        want = [
            (r["doc_id"], r["score_q"], r["n_hit"])
            for r in bm25_topk(docs, terms, topk=3).collect()
        ]
        assert by_q.get(qid, []) == want, qid
    with pytest.raises(ValueError):
        bm25_topk_batch(docs, {})
    with pytest.raises(ValueError):
        bm25_topk_batch(docs, {"q": []})


def test_batch_scorer_window_is_partitioned(spark):
    """The per-query top-k window must be PARTITIONED by query_id —
    an unpartitioned window would serialize the whole scored relation
    through one task at scale."""
    from sstable_migrator_spark.operators.retrieval import bm25_topk_batch

    plan = (
        bm25_topk_batch(_docs(spark), {"qa": ["spark"], "qb": ["cat"]}, topk=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # Window specs print as: Window [...], [query_id#..], [score_q#.. DESC ...]
    assert re.search(r"Window \[[^\]]*\], \[query_id#\d+", plan), plan


def test_append_postings_index_equals_rebuild(spark, tmp_path):
    """Incremental index maintenance: indexing corpus A then appending
    corpus B serves EXACTLY the ranking a full A+B rebuild serves, and
    the corpus constants track the union."""
    from sstable_migrator_spark.operators.retrieval import (
        append_postings_index,
        bm25_topk_from_postings,
        write_postings_index,
    )

    docs_a = _docs(spark)
    docs_b = spark.createDataFrame(
        [
            (10, "spark shuffle service handles large scale cluster data movement"),
            (11, "the lazy cat naps while distributed computing hums along"),
        ],
        "doc_id long, text string",
    )
    inc = str(tmp_path / "inc")
    write_postings_index(docs_a, inc, n_buckets=16)
    meta = append_postings_index(docs_b, inc)
    full = str(tmp_path / "full")
    meta_full = write_postings_index(docs_a.unionByName(docs_b), full, n_buckets=16)
    assert meta == meta_full

    for terms in (["spark", "cluster", "data"], ["cat"], ["computing", "scale"]):
        a = [tuple(r) for r in
             bm25_topk_from_postings(spark, inc, terms, topk=10).collect()]
        b = [tuple(r) for r in
             bm25_topk_from_postings(spark, full, terms, topk=10).collect()]
        assert a == b, terms


def test_rebuild_postings_stats_repairs_crash(spark, tmp_path):
    """The documented crash repair: postings appended but stats not yet
    overwritten (stale n/t). rebuild_postings_stats recovers the exact
    constants from the index itself and rankings match the clean path."""
    import shutil

    from sstable_migrator_spark.operators.retrieval import (
        append_postings_index,
        bm25_topk_from_postings,
        rebuild_postings_stats,
        write_postings_index,
    )

    docs_a = _docs(spark)
    docs_b = spark.createDataFrame(
        [(10, "spark shuffle service handles large scale cluster data movement")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    write_postings_index(docs_a, idx, n_buckets=16)
    stale = str(tmp_path / "stale_stats")
    shutil.copytree(f"{idx}/_corpus_stats", stale)
    meta = append_postings_index(docs_b, idx)
    # simulate the crash window: postings appended, stats still pre-append
    shutil.rmtree(f"{idx}/_corpus_stats")
    shutil.copytree(stale, f"{idx}/_corpus_stats")
    repaired = rebuild_postings_stats(spark, idx, n_buckets=16)
    assert repaired == meta
    # auto mode recovers exact n/t too (n_buckets = max(pb)+1 can
    # undershoot on a fixture this small; restore the real value after)
    auto = rebuild_postings_stats(spark, idx)
    assert auto["n"] == meta["n"] and auto["t"] == meta["t"]
    rebuild_postings_stats(spark, idx, n_buckets=16)
    got = [tuple(r) for r in
           bm25_topk_from_postings(spark, idx, ["spark", "data"], topk=5).collect()]
    full = str(tmp_path / "full")
    write_postings_index(docs_a.unionByName(docs_b), full, n_buckets=16)
    want = [tuple(r) for r in
            bm25_topk_from_postings(spark, full, ["spark", "data"], topk=5).collect()]
    assert got == want


def test_rebuild_postings_stats_empty_index(spark, tmp_path):
    """The crash-repair path must not TypeError on an EMPTY postings
    parquet (plausible exactly in the scenario it exists for: crash
    before the first postings append): without n_buckets it fails with
    a descriptive error; with an explicit n_buckets it writes zero
    stats."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from sstable_migrator_spark.operators.retrieval import (
        rebuild_postings_stats,
    )

    path = str(tmp_path / "postings")
    # an unpartitioned empty write leaves a schema-bearing zero-row
    # part file — the readable-but-empty state a crash can leave
    spark.createDataFrame(
        [], "term string, doc long, tf long, dl long, pb int"
    ).coalesce(1).write.parquet(path)
    with _pytest.raises(ValueError, match="no rows"):
        rebuild_postings_stats(spark, path)
    stats = rebuild_postings_stats(spark, path, n_buckets=16)
    assert stats == {"n": 0, "t": 0, "n_buckets": 16}
    from sstable_migrator_spark.operators.retrieval import read_corpus_stats

    assert read_corpus_stats(spark, path) == {
        "n": 0, "t": 0, "n_buckets": 16,
    }


def test_rrf_fuse_algebra(spark):
    from sstable_migrator_spark.operators.retrieval import rrf_fuse

    # two systems, one query: doc 10 ranked 1st by A and 3rd by B,
    # doc 20 ranked 2nd by both, doc 30 only in A, doc 40 only in B
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)],
        "query_id long, doc_id long, rank long",
    )
    b = spark.createDataFrame(
        [(1, 20, 2), (1, 40, 1), (1, 10, 3)],
        "query_id long, doc_id long, rank long",
    )
    got = {r["doc_id"]: r for r in rrf_fuse([a, b]).collect()}
    S = 1_000_000_000
    assert got[10]["rrf_x"] == S // 61 + S // 63
    assert got[20]["rrf_x"] == 2 * (S // 62)
    assert got[30]["rrf_x"] == S // 63 and got[30]["n_systems"] == 1
    assert got[40]["rrf_x"] == S // 61
    # fused order: 10 (both, high) > 20 > 40 > 30
    order = sorted(got.values(), key=lambda r: r["fused_rank"])
    assert [r["doc_id"] for r in order] == [10, 20, 40, 30]
    assert got[10]["n_systems"] == 2

    # exact ties break by doc id: two singleton docs at the same rank
    c = spark.createDataFrame(
        [(2, 7, 1), (2, 5, 1)], "query_id long, doc_id long, rank long"
    )
    tied = {r["doc_id"]: r["fused_rank"] for r in rrf_fuse([c]).collect()}
    assert tied == {5: 1, 7: 2}

    import pytest

    with pytest.raises(ValueError, match="ranking"):
        rrf_fuse([])


def test_rrf_hybrid_bm25_plus_dense(spark, sf_dir):
    """The hybrid-search composition: BM25 lexical ranks + brute-force
    dense ranks fused by RRF. A doc that both systems like outranks a
    doc only one system likes at comparable ranks."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sstable_migrator_spark.operators.retrieval import bm25_topk, rrf_fuse
    from sstable_migrator_spark.operators.simsearch import brute_force_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    lex = (
        bm25_topk(docs, ["the", "and"], topk=10)
        .withColumn("query_id", F.lit(0).cast("long"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id")
                .orderBy(F.desc("score_q"), F.asc("doc_id"))
            ).cast("long"),
        )
        .select("query_id", "doc_id", "rank")
    )
    qv = emb.filter(F.col("vec_id") == 5).select(
        F.lit(0).cast("long").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    dense = brute_force_topk(emb, qv, k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("long").alias("rank"),
    )
    fused = rrf_fuse([lex, dense]).collect()
    assert len(fused) >= 10
    by_id = {r["doc_id"]: r for r in fused}
    two_sys = [r for r in fused if r["n_systems"] == 2]
    # every two-system doc outscores any single-system doc whose best
    # rank is no better
    for t in two_sys:
        assert t["rrf_x"] > 1_000_000_000 // 61 // 2
    # fused_rank is a permutation 1..N per query
    ranks = sorted(r["fused_rank"] for r in fused)
    assert ranks == list(range(1, len(fused) + 1))
    assert by_id  # non-empty sanity
