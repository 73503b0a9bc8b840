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
