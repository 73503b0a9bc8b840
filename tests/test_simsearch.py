"""Similarity search: brute-force exactness vs a NumPy reference, LSH
bucket behavior and candidate scoring."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sstable_migrator_spark.operators.simsearch import (
    brute_force_topk,
    lsh_bucketize,
    lsh_topk,
    make_hyperplanes,
)


def _corpus(spark, n=50, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype("float64")
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)], "vec_id long, embedding array<double>"
    )
    return df, vecs


def test_brute_force_matches_numpy(spark):
    corpus, vecs = _corpus(spark)
    queries = spark.createDataFrame(
        [(0, vecs[0].tolist()), (1, vecs[7].tolist())],
        "query_id long, query_vec array<double>",
    )
    out = brute_force_topk(corpus, queries, k=5).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    for qid, qvec_idx in [(0, 0), (1, 7)]:
        expected = np.argsort(-sims[qvec_idx], kind="stable")[:5].tolist()
        mine = [n for _, n in sorted(got[qid])]
        assert mine == expected, f"query {qid}: {mine} != {expected}"


def test_lsh_bucketize_and_topk(spark):
    corpus, vecs = _corpus(spark)
    planes = make_hyperplanes(dim=8, bits=4, seed=7)
    bucketed = lsh_bucketize(corpus, planes)
    buckets = [r["lsh_bucket"] for r in bucketed.collect()]
    assert all(0 <= b < 16 for b in buckets)
    assert len(set(buckets)) > 1  # spread across buckets

    queries = spark.createDataFrame(
        [(0, vecs[0].tolist())], "query_id long, query_vec array<double>"
    )
    out = lsh_topk(corpus, queries, planes, k=3).collect()
    assert out, "query vector must at least find itself in its own bucket"
    best = min(out, key=lambda r: r["rank"])
    assert best["neighbor_id"] == 0 and abs(best["cosine"] - 1.0) < 1e-9


def test_ivf_assign_matches_numpy(spark):
    from sstable_migrator_spark.operators.simsearch import ivf_assign

    corpus, vecs = _corpus(spark)
    cent_ids = [0, 10, 20, 30]
    centroids = [(i, vecs[i].tolist()) for i in cent_ids]
    got = {r["vec_id"]: r["cell"] for r in ivf_assign(corpus, centroids).collect()}
    norms = np.linalg.norm(vecs, axis=1)
    for vid in range(len(vecs)):
        sims = [
            (vecs[vid] @ vecs[c]) / (norms[vid] * norms[c]) for c in cent_ids
        ]
        best = cent_ids[int(np.argmax(sims))]
        assert got[vid] == best, f"vec {vid}: {got[vid]} != {best}"


def test_ivf_full_probe_equals_brute_force(spark):
    """Probing every cell makes IVF exact — must equal brute force."""
    from sstable_migrator_spark.operators.simsearch import ivf_topk

    corpus, vecs = _corpus(spark)
    centroids = [(i, vecs[i].tolist()) for i in (0, 10, 20, 30)]
    queries = spark.createDataFrame(
        [(0, vecs[3].tolist()), (1, vecs[42].tolist())],
        "query_id long, query_vec array<double>",
    )
    brute = brute_force_topk(corpus, queries, k=5)
    ivf = ivf_topk(corpus, queries, centroids, k=5, n_probe=4)
    b = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in brute.collect()}
    i = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in ivf.collect()}
    assert b == i


def test_ivf_narrow_probe_finds_self(spark):
    from sstable_migrator_spark.operators.simsearch import ivf_topk

    corpus, vecs = _corpus(spark)
    centroids = [(i, vecs[i].tolist()) for i in (0, 10, 20, 30)]
    queries = spark.createDataFrame(
        [(7, vecs[7].tolist())], "query_id long, query_vec array<double>"
    )
    out = ivf_topk(corpus, queries, centroids, k=3, n_probe=1).collect()
    assert out, "query's own cell must contain at least itself"
    best = min(out, key=lambda r: r["rank"])
    assert best["neighbor_id"] == 7 and abs(best["cosine"] - 1.0) < 1e-9


def test_pq_roundtrip_and_adc(spark):
    """PQ on a clustered corpus: vectors sitting AT subspace centroids
    quantize losslessly, so ADC must reproduce exact squared distances
    and the true nearest neighbor."""
    import numpy as np

    from sstable_migrator_spark.operators.simsearch import (
        pq_adc_topk,
        pq_assign,
        pq_train,
    )

    rng_pts = []
    # 8-dim vectors built from 4 subspaces x 4 distinct 2-d patterns
    patterns = [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    for i in range(64):
        v = []
        for s in range(4):
            v.extend(patterns[(i >> s) % 4])
        rng_pts.append((i, v))
    books = pq_train([v for _, v in rng_pts], m=4, k=4, iters=5)
    assert books.shape == (4, 4, 2)

    df = spark.createDataFrame(rng_pts, "vec_id long, embedding array<double>")
    coded = pq_assign(df, books)
    rows = {r["vec_id"]: r["pq_code"] for r in coded.collect()}
    assert all(len(c) == 4 for c in rows.values())

    query = rng_pts[13][1]
    top = pq_adc_topk(coded, books, query, k=3).collect()
    # lossless quantization -> the query's own vector is distance 0
    assert top[0]["vec_id"] == 13 and abs(top[0]["approx_d2"]) < 1e-9
    # ADC distances match exact L2^2 for every returned neighbor
    by_id = dict(rng_pts)
    for r in top:
        exact = sum((a - b) ** 2 for a, b in zip(by_id[r["vec_id"]], query))
        assert abs(r["approx_d2"] - exact) < 1e-9


def test_pq_dim_guard():
    import pytest

    from sstable_migrator_spark.operators.simsearch import pq_train

    with pytest.raises(ValueError):
        pq_train([[1.0, 2.0, 3.0]], m=2)


def test_ivf_pq_topk_recall(spark):
    """Composed IVF-PQ vs brute-force L2 truth on a clustered corpus:
    the probed-cell + ADC path must recover the true nearest neighbors
    when quantization is lossless and the query's cell is probed."""
    import numpy as np

    from sstable_migrator_spark.operators.simsearch import ivf_pq_topk, pq_train

    # two tight clusters on orthogonal axes, 8-dim, losslessly PQ-able
    pts = []
    for i in range(40):
        base = [2.0, 0.0] if i % 2 == 0 else [0.0, 2.0]
        v = (base + [float(i % 4), 0.0] + base + [0.0, float(i % 3)])
        pts.append((i, v))
    centroids = [(0, pts[0][1]), (1, pts[1][1])]
    books = pq_train([v for _, v in pts], m=4, k=16, iters=5)

    corpus = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    queries = [(100, pts[6][1]), (101, pts[9][1])]
    got = ivf_pq_topk(corpus, queries, centroids, books, k=3, n_probe=1)
    rows = sorted((r["query_id"], r["rank"], r["neighbor_id"], r["approx_d2"])
                  for r in got.collect())
    by_q = {}
    for qid, rank, nid, d2 in rows:
        by_q.setdefault(qid, []).append((rank, nid, d2))
    # rank-1 hit is the query's own vector at distance ~0
    assert by_q[100][0][1] == 6 and abs(by_q[100][0][2]) < 1e-9
    assert by_q[101][0][1] == 9 and abs(by_q[101][0][2]) < 1e-9
    # every returned ADC distance equals the exact L2^2 (lossless PQ)
    vecs = dict(pts)
    qs = dict(queries)
    for qid, triples in by_q.items():
        for _rank, nid, d2 in triples:
            exact = sum((a - b) ** 2 for a, b in zip(vecs[nid], qs[qid]))
            assert abs(d2 - exact) < 1e-9


def test_ivf_recall_on_real_embeddings(spark, sf_dir):
    """Quantitative recall pin for the IVF scale path on the REAL
    embeddings table: recall@10 vs brute-force cosine truth must stay
    high at n_probe=4 of 8 cells, and rise monotonically with n_probe
    (the accuracy/cost knob the 100 TB deployment turns)."""
    from pyspark.sql import functions as F

    from sstable_migrator_spark.operators.simsearch import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") % 40 == 0)
        .orderBy("vec_id").limit(8).collect()
    ]
    queries = (
        emb.filter(F.col("vec_id") % 37 == 0)
        .limit(6)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }

    def recall(n_probe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(emb, queries, cents, k=10, n_probe=n_probe).collect()
        }
        return len(got & truth) / len(truth)

    r2, r4, r8 = recall(2), recall(4), recall(8)
    assert r8 == 1.0          # probing every cell = exact
    assert r4 >= 0.5          # half the cells recovers most of top-10
    assert r2 <= r4 <= r8     # monotone in the knob


def test_trained_centroids_full_probe_exact(spark, sf_dir):
    """MLlib-trained IVF centroids slot into the fixed-centroid
    contract: at full probe (n_probe == k cells) IVF must equal
    brute-force exactly, whatever the centroids are; and the trained
    cells must be non-degenerate (more than one non-empty cell)."""
    from sstable_migrator_spark.operators.simsearch import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = train_ivf_centroids(emb, k=8, seed=7)
    assert len(cents) == 8 and [c for c, _ in cents] == list(range(8))

    n_cells = ivf_assign(emb, cents).select("cell").distinct().count()
    assert n_cells > 1

    queries = emb.filter(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    brute = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(emb, queries, cents, k=5, n_probe=8).collect()
    }
    assert ivf == brute
