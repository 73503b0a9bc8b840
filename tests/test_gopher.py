"""Gopher quality rules (operators/gopher.py): each published rule
fires on exactly its planted violation; thresholds are integer-exact."""

from __future__ import annotations

from sstable_migrator_spark.operators.gopher import gopher_quality_flags


def _good():
    return " ".join(
        f"the quick brown fox number{i} jumps over that lazy dog with style and"
        for i in range(8)
    )


def test_each_rule_fires_on_its_violation(spark):
    good = _good()
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "too short to pass"),                                   # word count
            (3, good + " ###### " * 20),                                # symbols
            (4, good + "\n" + "\n".join(f"- b {i} x" for i in range(30))),  # bullets
            (5, good + "\n" + "\n".join(f"line {i} trails off..." for i in range(10))),  # ellipsis
            (6, " ".join("123456" for _ in range(60)) + " " + good),    # alpha ratio
            (7, " ".join(f"zz{i}" for i in range(60))),                 # stop words
            (8, " ".join("a" for _ in range(80))),                      # mean word len
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert got[1]["keep"] == 1
    assert got[2]["ok_word_count"] == 0
    assert got[3]["ok_symbol_ratio"] == 0
    assert got[4]["ok_bullet_lines"] == 0
    assert got[5]["ok_ellipsis_lines"] == 0
    assert got[6]["ok_alpha_words"] == 0
    assert got[7]["ok_stop_words"] == 0
    assert got[8]["ok_mean_word_len"] == 0
    for d in range(2, 9):
        assert got[d]["keep"] == 0, d


def test_flags_stable_under_partitioning(spark):
    docs = spark.createDataFrame(
        [(i, _good() + f" tail{i}") for i in range(20)],
        "doc_id long, text string",
    )
    a = sorted(tuple(r) for r in gopher_quality_flags(docs).collect())
    b = sorted(tuple(r) for r in gopher_quality_flags(docs.repartition(7)).collect())
    assert a == b


def test_gate_attribution_report_sole_blockers(spark):
    """The rollup's semantics, pinned on a hand-checkable grid: pass
    counts, SOLE-blocker counts (rejected by exactly that gate), and
    the all-gates admit count."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sstable_migrator_spark.operators.analytics import (
        gate_attribution_report,
    )

    rows = [
        # (apex, g1, g2, g3)
        ("a.com", 1, 1, 1),  # admitted
        ("a.com", 0, 1, 1),  # sole-blocked by g1
        ("a.com", 1, 0, 1),  # sole-blocked by g2
        ("a.com", 0, 0, 1),  # blocked by two gates -> sole for none
        ("b.com", 1, 1, 0),  # sole-blocked by g3
        ("b.com", 1, 1, 1),  # admitted
    ]
    df = spark.createDataFrame(
        rows, "apex string, g1 int, g2 int, g3 int"
    )
    got = {
        r["apex"]: r
        for r in gate_attribution_report(df, ["apex"], ["g1", "g2", "g3"]).collect()
    }
    a = got["a.com"]
    assert (a["n_docs"], a["n_admitted"]) == (4, 1)
    assert (a["n_pass_g1"], a["n_pass_g2"], a["n_pass_g3"]) == (2, 2, 4)
    assert (
        a["n_sole_block_g1"], a["n_sole_block_g2"], a["n_sole_block_g3"]
    ) == (1, 1, 0)
    b = got["b.com"]
    assert (b["n_docs"], b["n_admitted"], b["n_sole_block_g3"]) == (2, 1, 1)
    with _pytest.raises(ValueError, match="gate"):
        gate_attribution_report(df, ["apex"], [])


def test_gopher_keep_cols_passthrough(spark):
    from pyspark.sql import functions as F

    from sstable_migrator_spark.operators.gopher import gopher_quality_flags

    docs = spark.createDataFrame(
        [(1, "short text", "x.com")], "doc_id long, text string, apex string"
    )
    out = gopher_quality_flags(docs, keep_cols=["apex", "text"])
    assert {"apex", "text", "keep", "doc_id"} <= set(out.columns)
    assert out.first()["apex"] == "x.com"
