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


# --- persisted ANN index (build/serve split) --------------------------------


def _centroids_from(vecs, ids):
    return [(i, vecs[j].tolist()) for i, j in enumerate(ids)]


def test_ann_index_roundtrip_and_pruning(spark, tmp_path):
    """The persisted index serves rank-identical results to the
    in-memory ivf_topk, and the serve-path scan is partition-pruned to
    the probed cells — index lookup, not corpus scan."""
    from sstable_migrator_spark.operators.simsearch import (
        ann_topk_from_index,
        ivf_topk,
        write_ann_index,
    )

    corpus, vecs = _corpus(spark, n=60, dim=8)
    cents = _centroids_from(vecs, [0, 10, 20, 30, 40, 50])
    path = str(tmp_path / "annidx")
    meta = write_ann_index(corpus, path, cents)
    assert meta == {
        "n_cells": 6, "dim": 8, "pq_m": None, "pq_k": None,
        "pq_residual": False,
    }

    qlist = [(0, vecs[3].tolist()), (1, vecs[33].tolist())]
    qdf = spark.createDataFrame(qlist, "query_id long, query_vec array<double>")
    base = ivf_topk(corpus, qdf, cents, k=5, n_probe=2).select(
        "query_id", "neighbor_id", "rank"
    )
    served = ann_topk_from_index(spark, path, qlist, k=5, n_probe=2)
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in served.collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in base.collect()
    )
    assert got == want and len(got) == 10

    # pruned scan: PartitionFilters on cell, and the files ACTUALLY
    # read (input_file_name — a runtime account) sit only in probed
    # cells' directories
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    import os as _os

    import numpy as np

    cmat = np.stack([np.asarray(v) for _, v in cents])
    unit = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    want_cells = set()
    for _, qv in qlist:
        order = np.argsort(-(unit @ np.asarray(qv)), kind="stable")[:2]
        want_cells.update(int(c) for c in order)
    all_cells = {d for d in _os.listdir(path) if d.startswith("cell=")}
    assert len(want_cells) < len(all_cells)
    read_dirs = {
        r[0].split("/")[-2]
        for r in spark.read.parquet(path)
        .filter(F.col("cell").isin(sorted(want_cells)))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert read_dirs and read_dirs <= {f"cell={c}" for c in want_cells}


def test_ann_index_params_drift(spark, tmp_path):
    """Geometry drift fails loudly via the _params.json sidecar: a
    serve with wrong-dim queries, an append with wrong-dim vectors,
    and an explicit check with a different cell count all refuse."""
    import pytest

    from sstable_migrator_spark.operators.simsearch import (
        ann_topk_from_index,
        append_ann_index,
        check_ann_index_params,
        write_ann_index,
    )

    corpus, vecs = _corpus(spark, n=20, dim=8)
    cents = _centroids_from(vecs, [0, 10])
    path = str(tmp_path / "annidx")
    write_ann_index(corpus, path, cents)

    rec = check_ann_index_params(path, dim=8, n_cells=2)
    assert rec["metric"] == "cosine" and rec["pq_m"] is None
    with pytest.raises(ValueError, match="built with"):
        check_ann_index_params(path, n_cells=4)
    with pytest.raises(ValueError, match="built with"):
        ann_topk_from_index(spark, path, [(0, [1.0] * 16)], k=3)
    bad = spark.createDataFrame(
        [(99, [1.0] * 16)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dim"):
        append_ann_index(bad, path)
    with pytest.raises(ValueError, match="_params"):
        append_ann_index(bad, str(tmp_path / "nosuch"))
    # a crashed/partial build (params stamp is the LAST write) refuses
    # to serve instead of silently skipping the geometry guard
    import os as _os

    _os.remove(_os.path.join(path, "_params.json"))
    with pytest.raises(ValueError, match="partial"):
        ann_topk_from_index(spark, path, [(0, [1.0] * 8)], k=3)


def test_ann_index_append_equals_rebuild(spark, tmp_path):
    """Incremental vector append: index half the corpus, append the
    other half — serving equals a full rebuild exactly (disjoint ids,
    the update_postings_index contract)."""
    from sstable_migrator_spark.operators.simsearch import (
        ann_topk_from_index,
        append_ann_index,
        write_ann_index,
    )

    corpus, vecs = _corpus(spark, n=60, dim=8)
    cents = _centroids_from(vecs, [0, 10, 20, 30])
    first = corpus.filter(F.col("vec_id") < 30)
    rest = corpus.filter(F.col("vec_id") >= 30)

    inc_path = str(tmp_path / "inc")
    write_ann_index(first, inc_path, cents)
    append_ann_index(rest, inc_path)
    full_path = str(tmp_path / "full")
    write_ann_index(corpus, full_path, cents)

    qlist = [(0, vecs[5].tolist()), (1, vecs[45].tolist())]
    inc = ann_topk_from_index(spark, inc_path, qlist, k=5, n_probe=2)
    full = ann_topk_from_index(spark, full_path, qlist, k=5, n_probe=2)
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])
    assert sorted(map(key, inc.collect())) == sorted(map(key, full.collect()))
    # appended rows landed inside the same cell= layout
    import os as _os

    assert all(
        d.startswith("cell=") or d.startswith("_")
        for d in _os.listdir(inc_path)
        if not d.startswith(".")
    )


def test_ann_index_adc_serving(spark, tmp_path):
    """An index built WITH codebooks serves PQ-ADC rankings identical
    to the in-memory ivf_pq_topk, and the ADC scan reads the code
    column, never raw embeddings (column pruning in the plan)."""
    from sstable_migrator_spark.operators.simsearch import (
        ann_topk_from_index,
        ivf_pq_topk,
        pq_train,
        write_ann_index,
    )

    corpus, vecs = _corpus(spark, n=60, dim=8)
    cents = _centroids_from(vecs, [0, 10, 20, 30])
    books = pq_train(vecs.tolist(), m=4, k=8, iters=5)
    path = str(tmp_path / "annpq")
    meta = write_ann_index(corpus, path, cents, codebooks=books)
    assert meta["pq_m"] == 4 and meta["pq_k"] == 8

    qlist = [(0, vecs[3].tolist()), (1, vecs[33].tolist())]
    base = ivf_pq_topk(corpus, qlist, cents, books, k=5, n_probe=2)
    served = ann_topk_from_index(
        spark, path, qlist, k=5, n_probe=2, scoring="adc"
    )
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])
    assert sorted(map(key, served.collect())) == sorted(
        map(key, base.collect())
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "pq_code" in plan
    # the pruned ADC scan's ReadSchema carries codes, not embeddings
    import re as _re

    reads = _re.findall(r"ReadSchema: [^\n]*", plan)
    assert reads and all("embedding" not in r for r in reads), reads

    # flat index refuses ADC
    import pytest

    flat = str(tmp_path / "flat")
    write_ann_index(corpus, flat, cents)
    with pytest.raises(ValueError, match="codebooks"):
        ann_topk_from_index(spark, flat, qlist, scoring="adc")


def test_build_ann_index_trained_end_to_end(spark, tmp_path):
    """The one-call trained build: distributed KMeans centroids +
    sampled PQ codebooks -> persisted index; serving works on both
    paths and the geometry sidecar records the trained shape."""
    from sstable_migrator_spark.operators.simsearch import (
        ann_topk_from_index,
        build_ann_index,
        check_ann_index_params,
    )

    corpus, vecs = _corpus(spark, n=80, dim=8)
    path = str(tmp_path / "trained")
    meta = build_ann_index(
        corpus, path, n_cells=4, pq_m=4, pq_k=4, pq_sample=64, seed=11
    )
    assert meta["n_cells"] == 4 and meta["dim"] == 8
    assert meta["pq_m"] == 4 and meta["pq_k"] == 4
    rec = check_ann_index_params(path, dim=8, n_cells=4)
    assert rec["pq_m"] == 4

    qlist = [(0, vecs[5].tolist())]
    exact = ann_topk_from_index(spark, path, qlist, k=3, n_probe=4)
    got = {r["neighbor_id"] for r in exact.collect()}
    assert 5 in got  # full probe: the vector finds itself
    adc = ann_topk_from_index(spark, path, qlist, k=3, n_probe=4, scoring="adc")
    assert adc.count() == 3


def test_ann_index_append_mixed_dim_refused(spark, tmp_path):
    """The append dim guard validates EVERY row, not just the first: a
    mixed-width batch (row 1 right, later rows wrong) is refused loudly
    with the index path and both observed widths, BEFORE any placement
    — previously it passed the first-row check and died inside the
    assignment kernel's np.stack with an opaque error."""
    import pytest

    from sstable_migrator_spark.operators.simsearch import (
        append_ann_index,
        write_ann_index,
    )

    corpus, vecs = _corpus(spark, n=20, dim=8)
    cents = _centroids_from(vecs, [0, 10])
    path = str(tmp_path / "idx")
    write_ann_index(corpus, path, cents)

    mixed = spark.createDataFrame(
        [(100, vecs[0].tolist()), (101, vecs[1].tolist()[:5])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match=r"dim=8.*\[5, 8\]"):
        append_ann_index(mixed, path)

    # uniformly wrong width: also refused with both bounds equal
    wrong = spark.createDataFrame(
        [(102, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match=r"dim=8.*\[3, 3\]"):
        append_ann_index(wrong, path)

    # nothing was appended by the refused calls
    assert spark.read.parquet(path).count() == 20

    # empty append is still the documented no-op
    append_ann_index(
        spark.createDataFrame([], "vec_id long, embedding array<double>"), path
    )
    assert spark.read.parquet(path).count() == 20


def test_ann_join_rank_identical_to_list_path(spark, tmp_path):
    """ann_join (DataFrame queries) ranks EXACTLY like the bounded
    list path on the same persisted index, for both exact-cosine and
    PQ-ADC scoring — the set-to-set path is the same math with the
    query side kept distributed."""
    from sstable_migrator_spark.operators.simsearch import (
        ann_join,
        ann_topk_from_index,
        pq_train,
        write_ann_index,
    )

    corpus, vecs = _corpus(spark, n=60, dim=8)
    cents = _centroids_from(vecs, [0, 10, 20, 30])
    books = pq_train(vecs.tolist(), m=4, k=8, iters=5)
    path = str(tmp_path / "annpq")
    write_ann_index(corpus, path, cents, codebooks=books)

    qlist = [(0, vecs[3].tolist()), (1, vecs[33].tolist()), (2, vecs[7].tolist())]
    qdf = spark.createDataFrame(
        [(i, v) for i, v in qlist], "query_id long, query_vec array<double>"
    )
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])
    for scoring in ("exact", "adc"):
        lst = ann_topk_from_index(
            spark, path, qlist, k=5, n_probe=2, scoring=scoring
        )
        st = ann_join(qdf, path, k=5, n_probe=2, scoring=scoring)
        assert sorted(map(key, st.collect())) == sorted(
            map(key, lst.collect())
        ), scoring

    # ADC via ann_join still never reads raw corpus vectors
    plan = (
        ann_join(qdf, path, k=5, n_probe=2, scoring="adc")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re as _re

    reads = [
        r for r in _re.findall(r"ReadSchema: [^\n]*", plan)
        if "pq_code" in r or "embedding" in r
    ]
    assert reads and all("embedding" not in r for r in reads), reads
    # and the probed-cell pruning reaches the scan
    assert "PartitionFilters" in plan and "cell" in plan


def test_ann_join_guards(spark, tmp_path):
    """ann_join's loud refusals: no sidecar (crashed build), wrong or
    mixed query width, empty query set, ADC on a flat index; and the
    list path's NEW query-count bound points callers at ann_join."""
    import pytest

    from sstable_migrator_spark.operators.simsearch import (
        ann_join,
        ann_topk_from_index,
        write_ann_index,
    )

    corpus, vecs = _corpus(spark, n=20, dim=8)
    cents = _centroids_from(vecs, [0, 10])
    path = str(tmp_path / "flat")
    write_ann_index(corpus, path, cents)
    qdf = spark.createDataFrame(
        [(0, vecs[1].tolist())], "query_id long, query_vec array<double>"
    )

    with pytest.raises(ValueError, match="_params.json"):
        ann_join(qdf, str(tmp_path / "nowhere"))
    with pytest.raises(ValueError, match=r"dim=8.*\[5, 8\]"):
        ann_join(
            spark.createDataFrame(
                [(0, vecs[1].tolist()), (1, vecs[2].tolist()[:5])],
                "query_id long, query_vec array<double>",
            ),
            path,
        )
    with pytest.raises(ValueError, match="empty query"):
        ann_join(
            spark.createDataFrame([], "query_id long, query_vec array<double>"),
            path,
        )
    with pytest.raises(ValueError, match="codebooks"):
        ann_join(qdf, path, scoring="adc")
    with pytest.raises(ValueError, match="scoring"):
        ann_join(qdf, path, scoring="cosine")

    # the list path refuses query sets past its closure bound, naming
    # the set-to-set alternative
    big = [(i, vecs[0].tolist()) for i in range(11)]
    with pytest.raises(ValueError, match="ann_join"):
        ann_topk_from_index(spark, path, big, max_list_queries=10)


def test_ann_join_large_query_set(spark, tmp_path):
    """A 10k-query DataFrame completes through ann_join without any
    driver-side query list or per-query closure state — the closure
    balloon the list path's bound exists to prevent. Sanity: every
    query returns k rows and self-queries rank themselves first."""
    import numpy as np

    from sstable_migrator_spark.operators.simsearch import (
        ann_join,
        write_ann_index,
    )

    corpus, vecs = _corpus(spark, n=100, dim=8)
    cents = _centroids_from(vecs, [0, 25, 50, 75])
    path = str(tmp_path / "big")
    write_ann_index(corpus, path, cents)

    n_q = 10_000
    rng = np.random.default_rng(17)
    picks = rng.integers(0, 100, size=n_q)
    qdf = spark.createDataFrame(
        [(int(i), vecs[p].tolist()) for i, p in enumerate(picks)],
        "query_id long, query_vec array<double>",
    )
    out = ann_join(qdf, path, k=3, n_probe=4)  # full probe: exact
    got = out.groupBy("query_id").count().agg(
        F.min("count"), F.max("count"), F.count(F.lit(1))
    ).first()
    assert got == (3, 3, n_q)
    # a query that IS a corpus vector finds itself at rank 1
    firsts = {
        r["query_id"]: r["neighbor_id"]
        for r in out.filter(F.col("rank") == 1).collect()
    }
    assert all(firsts[i] == picks[i] for i in range(n_q))


def _residual_adc_reference(vecs, cents_list, books, qv, n_probe):
    """Pure-numpy IVF-PQ-residual reference: assign cells by the
    ivf_assign rule, encode residuals, score ADC with per-cell LUTs.
    Returns {vec_id: approx_d2} over the probed cells only."""
    import math

    import numpy as np

    ordered = sorted(cents_list)
    cmat = np.array(
        [
            [x / (math.sqrt(sum(y * y for y in cv)) or 1.0) for x in cv]
            for _, cv in ordered
        ]
    ).T
    cent_ids = np.array([c for c, _ in ordered])
    cent_mat = np.array([cv for _, cv in ordered])
    books = np.asarray(books)
    m, kk, dsub = books.shape
    assign = np.argmax(vecs @ cmat, axis=1)
    res = vecs - cent_mat[assign]
    codes = np.empty((len(vecs), m), dtype=int)
    for s in range(m):
        sub = res[:, s * dsub : (s + 1) * dsub]
        d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d2.argmin(axis=1)
    q = np.asarray(qv, dtype=np.float64)
    probed_pos = np.argsort(-(q @ cmat), kind="stable")[:n_probe]
    out = {}
    for pos in probed_pos:
        qres = q - cent_mat[pos]
        lut = np.empty((m, kk))
        for s in range(m):
            lut[s] = ((books[s] - qres[s * dsub : (s + 1) * dsub]) ** 2).sum(
                axis=1
            )
        for i in np.where(assign == pos)[0]:
            out[i] = lut[np.arange(m), codes[i]].sum()
    return out, cent_ids[assign]


def test_residual_pq_matches_numpy_reference(spark, tmp_path):
    """An index built with pq_residual=True serves ADC distances equal
    to an independent numpy replay of the standard IVF-PQ recipe
    (encode vector - assigned_centroid; score with per-(query, cell)
    LUTs over the SAME residual frame)."""
    from sstable_migrator_spark.operators.simsearch import (
        ann_topk_from_index,
        pq_train,
        write_ann_index,
    )

    corpus, vecs = _corpus(spark, n=60, dim=8)
    cents = _centroids_from(vecs, [0, 10, 20, 30])
    # train codebooks on residuals, exactly as build_ann_index would
    import math

    import numpy as np

    cmat = np.array(
        [
            [x / (math.sqrt(sum(y * y for y in cv)) or 1.0) for x in cv]
            for _, cv in sorted(cents)
        ]
    ).T
    cent_mat = np.array([cv for _, cv in sorted(cents)])
    res_sample = vecs - cent_mat[np.argmax(vecs @ cmat, axis=1)]
    books = pq_train(res_sample.tolist(), m=4, k=8, iters=5)

    path = str(tmp_path / "respq")
    meta = write_ann_index(corpus, path, cents, codebooks=books, pq_residual=True)
    assert meta["pq_residual"] is True

    served = ann_topk_from_index(
        spark, path, [(0, vecs[3].tolist())], k=60, n_probe=2, scoring="adc"
    ).collect()
    ref, _cells = _residual_adc_reference(vecs, cents, books, vecs[3], n_probe=2)
    assert len(served) == len(ref) > 0
    for r in served:
        assert r["approx_d2"] == ref[r["neighbor_id"]], r


def test_residual_append_and_ann_join_parity(spark, tmp_path):
    """A residual index appends with the index's OWN convention
    (append + build == one-shot build on the serve path), and
    ann_join's ADC ranks bit-equal to the list path on the same
    residual index."""
    from sstable_migrator_spark.operators.simsearch import (
        ann_join,
        ann_topk_from_index,
        append_ann_index,
        build_ann_index,
        check_ann_index_params,
        write_ann_index,
    )

    corpus, vecs = _corpus(spark, n=60, dim=8)
    cents = _centroids_from(vecs, [0, 10, 20, 30])
    import math

    import numpy as np

    from sstable_migrator_spark.operators.simsearch import pq_train

    cmat = np.array(
        [
            [x / (math.sqrt(sum(y * y for y in cv)) or 1.0) for x in cv]
            for _, cv in sorted(cents)
        ]
    ).T
    cent_mat = np.array([cv for _, cv in sorted(cents)])
    books = pq_train(
        (vecs - cent_mat[np.argmax(vecs @ cmat, axis=1)]).tolist(), m=4, k=8, iters=5
    )

    inc_path = str(tmp_path / "inc")
    write_ann_index(
        corpus.filter(F.col("vec_id") < 30), inc_path, cents,
        codebooks=books, pq_residual=True,
    )
    append_ann_index(corpus.filter(F.col("vec_id") >= 30), inc_path)
    full_path = str(tmp_path / "full")
    write_ann_index(corpus, full_path, cents, codebooks=books, pq_residual=True)

    qlist = [(0, vecs[5].tolist()), (1, vecs[45].tolist())]
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])
    inc = ann_topk_from_index(spark, inc_path, qlist, k=5, n_probe=2, scoring="adc")
    full = ann_topk_from_index(spark, full_path, qlist, k=5, n_probe=2, scoring="adc")
    assert sorted(map(key, inc.collect())) == sorted(map(key, full.collect()))

    qdf = spark.createDataFrame(
        [(i, v) for i, v in qlist], "query_id long, query_vec array<double>"
    )
    st = ann_join(qdf, full_path, k=5, n_probe=2, scoring="adc")
    assert sorted(map(key, st.collect())) == sorted(map(key, full.collect()))

    # the trained one-call build records the convention in the sidecar
    tr_path = str(tmp_path / "trained")
    meta = build_ann_index(
        corpus, tr_path, n_cells=4, pq_m=4, pq_k=4, pq_sample=64,
        seed=11, pq_residual=True,
    )
    assert meta["pq_residual"] is True
    assert check_ann_index_params(tr_path)["pq_residual"] is True
    got = ann_topk_from_index(
        spark, tr_path, qlist, k=3, n_probe=4, scoring="adc"
    ).collect()
    assert len(got) == 6


def test_dedup_against_index(spark, tmp_path):
    """Crawl-vs-index admission gate: a re-offered indexed vector flags
    is_dup with its indexed id as dup_of; a genuinely novel vector
    passes; a vector whose probed cells hold NO candidates keeps a
    NULL neighbor and passes (nothing indexed looks like it)."""
    from sstable_migrator_spark.operators.simsearch import (
        dedup_against_index,
        write_ann_index,
    )

    # corpus lives in two tight clusters near e0 and e1; a third
    # centroid (e2) exists in the index geometry but owns no vectors
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))
    for i in range(10, 20):
        rows.append((i, [0.01 * (i - 10), 1.0, 0.0, 0.0]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
    ]
    path = str(tmp_path / "gate")
    write_ann_index(corpus, path, cents)

    new = spark.createDataFrame(
        [
            (100, [1.0, 0.05, 0.0, 0.0]),   # re-offer of vec 5 -> dup
            (101, [0.7, 0.7, 0.0, 0.0]),    # between clusters -> novel
            (102, [0.0, 0.0, 1.0, 0.0]),    # probes only empty cell 2
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["query_id"]: r
        for r in dedup_against_index(new, path, threshold=0.999, n_probe=1).collect()
    }
    assert got[100]["is_dup"] == 1 and got[100]["dup_of"] == 5
    assert got[101]["is_dup"] == 0 and got[101]["dup_of"] is not None
    assert got[102]["is_dup"] == 0 and got[102]["dup_of"] is None

    # wider probe closes the empty-cell miss: 102's nearest REAL
    # vector appears once a second cell is probed
    wide = {
        r["query_id"]: r
        for r in dedup_against_index(new, path, threshold=0.999, n_probe=2).collect()
    }
    assert wide[102]["dup_of"] is not None and wide[102]["is_dup"] == 0


def test_ann_index_health(spark, tmp_path):
    """The occupancy report: counts match a numpy replay of the
    assignment, a skew-planted append flags the hot cell, a cell no
    vector lands in surfaces as an (n_vecs=0, underloaded) row, and a
    sidecar-less directory is refused loudly."""
    import pytest

    from sstable_migrator_spark.operators.simsearch import (
        ann_index_health,
        append_ann_index,
        write_ann_index,
    )

    # four tight clusters on orthogonal axes e0..e3 (noise confined to
    # dims 0-3) plus a 5th centroid on e4: every vector's dot with e4
    # is exactly 0 while its own axis dot is ~1, so cell 4 is empty BY
    # GEOMETRY, not by a float tie (BLAS matmul breaks bitwise ties
    # unpredictably across batch shapes)
    rng = np.random.default_rng(5)
    eye = np.eye(8)
    vecs = np.array(
        [
            eye[i % 4] + np.pad(rng.normal(scale=0.05, size=4), (0, 4))
            for i in range(40)
        ]
    )
    corpus = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    cents = [(i, eye[i].tolist()) for i in range(5)]
    path = str(tmp_path / "annidx")
    write_ann_index(corpus, path, cents)

    # skew: 120 copies of vector 0 land in vector-0's cell
    hot = spark.createDataFrame(
        [(1000 + i, vecs[0].tolist()) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    append_ann_index(hot, path)

    rep = {r["cell"]: r for r in ann_index_health(spark, path).collect()}
    assert len(rep) == 5 and all(r["total"] == 160 for r in rep.values())
    assert sum(r["n_vecs"] for r in rep.values()) == 160

    # replay of the assignment rule with the kernel's EXACT arithmetic
    # (host-side per-element centroid normalization, query norm left
    # alone, ties -> first/lowest cell id) over corpus + append
    import math

    cmat = np.array(
        [
            [x / (math.sqrt(sum(y * y for y in cv)) or 1.0) for x in cv]
            for _, cv in sorted(cents)
        ],
        dtype="float64",
    ).T
    allv = np.vstack([vecs, np.tile(vecs[0], (120, 1))])
    want = np.bincount(np.argmax(allv @ cmat, axis=1), minlength=5)
    for c in range(5):
        assert rep[c]["n_vecs"] == int(want[c]), (c, dict(rep[c].asDict()))

    hot_cell = int(np.argmax(allv[0] @ cmat))
    assert rep[hot_cell]["overloaded"] == 1  # 5*n > 2*160 needs n > 64
    assert rep[4]["n_vecs"] == 0 and rep[4]["underloaded"] == 1
    assert rep[hot_cell]["underloaded"] == 0

    with pytest.raises(FileNotFoundError, match="_params.json"):
        ann_index_health(spark, str(tmp_path / "nothing"))


def test_ann_range_join_matches_threshold_filter(spark, tmp_path):
    """ann_range_join == ann_join(k=everything) filtered at the
    threshold, on the same index and probes: the radius form is the
    same candidate set and the same scoring, minus the top-k window."""
    from sstable_migrator_spark.operators.simsearch import (
        ann_join,
        ann_range_join,
        write_ann_index,
    )

    corpus, vecs = _corpus(spark, n=60, dim=8)
    cents = _centroids_from(vecs, [0, 10, 20, 30])
    path = str(tmp_path / "annrange")
    write_ann_index(corpus, path, cents)
    qdf = spark.createDataFrame(
        [(0, vecs[3].tolist()), (1, vecs[33].tolist())],
        "query_id long, query_vec array<double>",
    )
    thr = 0.25
    rng = ann_range_join(qdf, path, min_cosine=thr, n_probe=2)
    ref = (
        ann_join(qdf, path, k=10**6, n_probe=2, scoring="exact")
        .filter(F.col("cosine") >= thr)
        .select("query_id", "neighbor_id", "cosine")
    )
    key = lambda r: (r["query_id"], r["neighbor_id"], round(r["cosine"], 12))
    got, want = sorted(map(key, rng.collect())), sorted(map(key, ref.collect()))
    assert got == want and len(got) > 0
    # the serve plan has NO window/top-k shuffle: scoring + threshold
    # are map-side over the candidate join
    plan = rng._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "PartitionFilters" in plan


def test_ann_range_join_guards(spark, tmp_path):
    import pytest

    from sstable_migrator_spark.operators.simsearch import (
        ann_range_join,
        write_ann_index,
    )

    corpus, vecs = _corpus(spark, n=20, dim=8)
    cents = _centroids_from(vecs, [0, 10])
    path = str(tmp_path / "annrange2")
    write_ann_index(corpus, path, cents)
    qdf = spark.createDataFrame(
        [(0, vecs[3].tolist())], "query_id long, query_vec array<double>"
    )
    with pytest.raises(ValueError, match="min_cosine"):
        ann_range_join(qdf, path, min_cosine=1.5)
    with pytest.raises(ValueError, match="no ANN index"):
        ann_range_join(qdf, str(tmp_path / "nothing"), min_cosine=0.5)
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0])], "query_id long, query_vec array<double>"
    )
    with pytest.raises(ValueError, match="dim"):
        ann_range_join(bad, path, min_cosine=0.5)
