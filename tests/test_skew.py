"""Skew-mitigation toolkit: salted variants must be result-identical to
the plain operators they replace."""

from __future__ import annotations

from pyspark.sql import functions as F

from sstable_migrator_spark.operators.skew import (
    salted_count,
    salted_distinct_count,
    salted_join,
)


def _skewed(spark, n=2000):
    # 90% of rows share one hot key
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        F.col("id"),
        (F.col("id") % 50).alias("u"),
    )


def test_salted_count_equals_plain(spark):
    df = _skewed(spark)
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["n"] for r in salted_count(df, ["k"], ["id"], buckets=8).collect()}
    assert salted == plain


def test_salted_distinct_count_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("u").alias("n")).collect()
    }
    got = {r["k"]: r["n_distinct"] for r in salted_distinct_count(df, ["k"], "u").collect()}
    assert got == plain


def test_salted_join_equals_plain(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k0", "K0"), ("k3", "K3")], "k string, label string"
    )
    plain = sorted(
        (r["id"], r["label"]) for r in big.join(dim, "k").select("id", "label").collect()
    )
    got = sorted(
        (r["id"], r["label"])
        for r in salted_join(big, dim, "k", salt_cols=["id"], buckets=4)
        .select("id", "label")
        .collect()
    )
    assert got == plain


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark, n=100)
    dim = spark.createDataFrame([("hot", "HOT")], "k string, label string")
    out = salted_join(big, dim, "k", salt_cols=["id"], buckets=4, how="left")
    assert out.count() == 100
    assert out.filter(F.col("label").isNull()).count() == big.filter(F.col("k") != "hot").count()


def test_skew_report_detects_hot_key(spark):
    from sstable_migrator_spark.operators.skew import skew_report

    rows = [(0,)] * 500 + [(k,) for k in range(1, 101)]
    df = spark.createDataFrame(rows, "k long")
    rep = skew_report(df, ["k"], top=3)
    assert rep["total_rows"] == 600 and rep["distinct_keys"] == 101
    assert rep["max_rows_per_key"] == 500
    assert rep["hot_keys"][0] == {"key": (0,), "rows": 500, "share": 500 / 600}
    assert rep["recommendation"] == "salt"

    uniform = spark.createDataFrame([(k % 10,) for k in range(100)], "k long")
    assert skew_report(uniform, ["k"])["recommendation"] == "none"


def test_salted_join_rejects_small_side_outer(spark):
    import pytest

    from sstable_migrator_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a")], "k long, x string")
    small = spark.createDataFrame([(1, "d")], "k long, d string")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", ["x"], how="full")


def test_combine_recommendation_logic():
    """Salt only when threshold AND measurement agree; any flagged skew
    without measured salting benefit falls back to AQE; flat keys get
    nothing (the bench sidecar's explicit-recommendation contract)."""
    from sstable_migrator_spark.operators.skew import combine_recommendation

    assert combine_recommendation("salt", "salted") == "salt"
    assert combine_recommendation("salt", "unsalted") == "aqe"
    assert combine_recommendation("aqe", "salted") == "aqe"
    assert combine_recommendation("aqe", "unsalted") == "aqe"
    assert combine_recommendation("none", "salted") == "none"
    assert combine_recommendation("none", "unsalted") == "none"


def test_lsh_hot_band_cap_bounds_pairs_and_keeps_connectivity(spark):
    """Boilerplate skew: one template duplicated T times puts T rows
    in ONE (band, bucket) and the uncapped self-join emits C(T,2)
    pairs — quadratic OUTPUT. max_bucket caps hot buckets with star
    pairs: O(T) rows, same connected components downstream, genuine
    small-bucket near-dups still mined, and no duplicate pair rows in
    the union of the two paths."""
    from pyspark.sql import functions as F

    from sstable_migrator_spark.operators.dedup import minhash_lsh_pairs

    T = 800
    template = ("breaking news template header share subscribe follow "
                "the site for more updates daily weather traffic sports")
    near_a = ("completely different long article about rivers and "
              "mountain valleys with detailed maps and local history notes")
    near_b = near_a + " extra"
    rows = [(i, template) for i in range(T)]
    rows += [(100000, near_a), (100001, near_b)]
    import hashlib

    def _distinct(i: int) -> str:
        # md5-derived word soup: shares no shingles with anything
        # (the perceptual-fixture entropy lesson applies to text too)
        h = hashlib.md5(f"uniq-{i}".encode()).hexdigest() * 3
        return " ".join(h[j : j + 6] for j in range(0, len(h) - 5, 6))

    rows += [(200000 + i, _distinct(i)) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = minhash_lsh_pairs(docs, max_bucket=64).collect()
    # O(T), not C(T,2): the clique contributes exactly T-1 star pairs
    clique = [r for r in capped if r["id_a"] < 100000 and r["id_b"] < 100000]
    assert len(clique) == T - 1
    assert all(r["id_a"] == 0 and r["est_jaccard"] == 1.0 for r in clique)
    # no duplicate pair rows across the small/star paths
    keys = [(r["id_a"], r["id_b"]) for r in capped]
    assert len(keys) == len(set(keys))
    # connectivity: every template doc reaches doc 0
    reached = {0} | {r["id_b"] for r in clique}
    assert reached == set(range(T))
    # the genuine near-dup outside the clique still mined (small path)
    assert any(
        (r["id_a"], r["id_b"]) == (100000, 100001) for r in capped
    )
    # and the unique docs pair with nothing
    assert not any(r["id_a"] >= 200000 for r in capped)

    # uncapped control at a smaller T: the count really is C(T,2)
    small = spark.createDataFrame(
        [(i, template) for i in range(60)], "doc_id long, text string"
    )
    n_uncapped = minhash_lsh_pairs(small).count()
    assert n_uncapped == 60 * 59 // 2
