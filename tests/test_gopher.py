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


def _rep_reference(text: str) -> dict:
    """Pure-Python reference for the MassiveText repetition metrics —
    the independent implementation the Spark operator must agree with
    exactly."""
    ws = text.split()
    c = sum(len(w) for w in ws)
    out = {"n_word_chars": c}
    for k in (2, 3, 4):
        grams: dict = {}
        for i in range(len(ws) - k + 1):
            g = "\x01".join(ws[i : i + k])
            grams[g] = grams.get(g, 0) + 1
        best = max(
            (
                (cnt, len(g) - (k - 1), g)
                for g, cnt in grams.items()
            ),
            default=(0, 0, ""),
        )
        out[f"top_{k}gram_chars"] = best[0] * best[1]
    for k in (5, 6, 7, 8, 9, 10):
        pos: dict = {}
        for i in range(len(ws) - k + 1):
            pos.setdefault(tuple(ws[i : i + k]), []).append(i)
        covered: set = set()
        for g, ps in pos.items():
            if len(ps) >= 2:
                for p in ps:
                    covered.update(range(p, p + k))
        out[f"dup_{k}gram_chars"] = sum(len(ws[j]) for j in covered)
    return out


def test_repetition_flags_match_python_reference(spark):
    """Every n-gram counter — the top-gram argmax and the
    interval-union coverage — agrees exactly with an independent
    Python implementation across crafted repetition shapes."""
    from sstable_migrator_spark.operators.gopher import repetition_flags

    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lam mu nu xi omicron pi rho sigma tau upsilon",
        2: "same line here\nsame line here\nsame line here\nunique tail words",
        3: "a1 b2 c3 d4 e5 a1 b2 c3 d4 e5 a1 b2 c3 d4 e5 f6 g7 h8 i9 j10",
        4: "x1 y2 x1 y2 x1 y2 x1 y2 x1 y2 z3 totally unique closing words",
        5: "one two three four five six seven eight nine ten one two three "
           "four five six seven eight nine ten middle one two three four "
           "five six seven eight nine ten",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_flags(docs).collect()}
    for i, text in texts.items():
        want = _rep_reference(text)
        for key, val in want.items():
            assert got[i][key] == val, (i, key, got[i][key], val)


def test_repetition_flags_line_para_rules(spark):
    from sstable_migrator_spark.operators.gopher import repetition_flags

    docs = spark.createDataFrame(
        [
            # 3 identical lines of 4 -> dup frac 2/4 = 0.5 > 0.3
            (1, "dup line\ndup line\ndup line\nunique content here"),
            # all-unique lines and paragraphs
            (2, "first line\nsecond line\n\nsecond paragraph text"),
            # duplicate PARAGRAPHS (\n\n-separated)
            (3, "para one body\n\npara one body\n\npara one body\n\nother"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_flags(docs).collect()}
    assert got[1]["ok_dup_line_frac"] == 0
    assert got[1]["ok_dup_line_chars"] == 0
    assert got[2]["ok_dup_line_frac"] == 1
    assert got[2]["ok_dup_para_frac"] == 1
    assert got[3]["ok_dup_para_frac"] == 0
    assert got[3]["ok_dup_para_chars"] == 0
    # its \n-split LINES repeat too ("para one body" x3 + "" x3)
    assert got[3]["ok_dup_line_frac"] == 0


def test_repetition_flags_stable_under_partitioning(spark):
    from pyspark.sql import functions as F

    from sstable_migrator_spark.operators.gopher import repetition_flags

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("w"), F.col("id").cast("string"),
            F.expr("repeat(' tok rep tok rep', CAST(id % 5 AS INT))"),
        ).alias("text"),
    )
    a = sorted(tuple(r) for r in repetition_flags(docs).collect())
    b = sorted(tuple(r) for r in repetition_flags(docs.repartition(7)).collect())
    assert a == b


def test_c4_clean_rules(spark):
    """C4 line rules: terminal punctuation, 5-word floor, javascript
    drop; page rules: 3-sentence floor, lorem ipsum, curly brace."""
    from sstable_migrator_spark.operators.gopher import c4_clean

    good3 = ("the first proper sentence has plenty of words today.\n"
             "the second proper sentence also carries enough words!\n"
             "does the third proper sentence carry enough words too?")
    docs = spark.createDataFrame(
        [
            (1, good3),                                          # keeps all
            (2, good3 + "\nno terminal punctuation on this line"),
            (3, good3 + "\nthis menu needs JavaScript to render properly."),
            (4, good3 + "\nLorem ipsum dolor sit amet consectetur elit."),
            (5, good3 + "\nthe code block { return x } appears right here."),
            (6, "one good sentence is simply not enough here."),  # < 3 sent
            (7, "tiny line.\nalso small.\nshort too."),           # < 5 words
            # page-level drops apply to the RAW page (C4 §2.2): the
            # offending line is itself removed by the line filter (no
            # terminal punctuation), but the page must still die
            (8, good3 + "\nlorem ipsum placeholder text with no period"),
            (9, good3 + "\ncode fragment { x } without punctuation"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    assert got[1]["keep"] == 1 and got[1]["n_lines_kept"] == 3
    assert got[1]["clean_text"] == good3
    # unpunctuated / javascript lines are dropped but the PAGE survives
    assert got[2]["keep"] == 1 and got[2]["n_lines_kept"] == 3
    assert "punctuation" not in got[2]["clean_text"]
    assert got[3]["keep"] == 1 and "JavaScript" not in got[3]["clean_text"]
    # lorem ipsum / curly brace kill the PAGE (the line itself is valid)
    assert got[4]["keep"] == 0 and got[4]["n_lines_kept"] == 4
    assert got[5]["keep"] == 0
    assert got[6]["keep"] == 0 and got[6]["n_sentences"] == 1
    assert got[7]["keep"] == 0 and got[7]["n_lines_kept"] == 0
    assert got[7]["clean_text"] == ""
    # raw-page drops: line filtered away, page dropped anyway
    assert got[8]["keep"] == 0 and got[8]["n_lines_kept"] == 3
    assert "lorem" not in got[8]["clean_text"]
    assert got[9]["keep"] == 0 and "{" not in got[9]["clean_text"]


def test_repetition_flags_randomized_against_reference(spark):
    """Seeded randomized sweep: 30 random small documents (mixed
    vocab sizes so duplicate n-grams actually occur) must agree with
    the pure-Python reference on every counter."""
    import random

    from sstable_migrator_spark.operators.gopher import repetition_flags

    rng = random.Random(41)
    texts = {}
    for i in range(30):
        vocab = [f"w{j}" for j in range(rng.randint(2, 12))]
        n = rng.randint(0, 60)
        texts[i] = " ".join(rng.choice(vocab) for _ in range(n))
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_flags(docs).collect()}
    for i, text in texts.items():
        if not text.split():
            assert i not in got or got[i]["n_word_chars"] == 0
            continue
        want = _rep_reference(text)
        for key, val in want.items():
            assert got[i][key] == val, (i, key, got[i][key], val, text)


def test_dedup_lines_first_occurrence_order(spark):
    from sstable_migrator_spark.operators.gopher import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "nav\nalpha body\nnav\nbeta body\nfooter\nfooter"),
            (2, "only one line"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    assert got[1]["clean_text"] == "nav\nalpha body\nbeta body\nfooter"
    assert (got[1]["n_lines"], got[1]["n_lines_kept"]) == (6, 4)
    assert got[2]["clean_text"] == "only one line"
    assert got[3]["clean_text"] == "" and got[3]["n_lines_kept"] == 1


def test_repetition_flags_strip_control_chars(spark):
    """\\x01 is not whitespace, so it can ride INSIDE a token of
    adversarial web text — and it is also the gram-join separator, so
    without stripping, distinct n-grams could merge counts. The fix:
    C0 controls are stripped before any metric, so a document with
    embedded control characters scores exactly like its cleaned twin
    (and the separator can never appear in a token)."""
    from sstable_migrator_spark.operators.gopher import repetition_flags

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank while birds watch quietly from tall trees ") * 3
    # controls inside tokens (incl. the separator \x01 and a collision
    # shape: 'a\x01b c' vs 'a b\x01c' must NOT merge as 2-grams)
    adv = base.replace("quick", "qu\x01ick").replace(
        "lazy", "la\x00zy"
    ) + " a\x01b c a b\x01c"
    clean = adv.replace("\x01", "").replace("\x00", "")
    docs = spark.createDataFrame(
        [(1, adv), (2, clean)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_flags(docs).collect()}
    a, b = got[1], got[2]
    a.pop("doc_id"), b.pop("doc_id")
    assert a == b
