"""Declarative data-contract validation: every rule kind, NULL
semantics, and the single-pass aggregation shape."""

from __future__ import annotations

import pytest

from sstable_migrator_spark.operators.expectations import validate


def test_all_rule_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10, "x@y.com"),
            (2, "b", 200, "bad"),
            (2, None, 5, None),       # dup id, null name
            (4, "zz", -1, "q@r.org"),
        ],
        "id long, name string, qty long, email string",
    )
    ref = spark.createDataFrame([(1,), (2,)], "id long")
    rules = [
        {"rule": "not_null", "col": "name"},
        {"rule": "unique", "cols": ["id"]},
        {"rule": "accepted_values", "col": "name", "values": ["a", "b", "c"]},
        {"rule": "in_range", "col": "qty", "lo": 0, "hi": 100},
        {"rule": "matches", "col": "email", "pattern": "^[^@]+@[^@]+$"},
        {"rule": "references", "col": "id", "ref": ref, "ref_col": "id"},
    ]
    got = {r["rule"]: r["violations"] for r in validate(df, rules).collect()}
    assert got == {
        "not_null_name": 1,
        "unique_id": 1,                 # id=2 appears twice -> 1 extra row
        "accepted_values_name": 1,      # 'zz' (NULL passes; pair with not_null)
        "in_range_qty": 2,              # 200 and -1
        "matches_email": 1,             # 'bad' (NULL email not a violation)
        "references_id": 1,             # id=4 has no parent
    }


def test_clean_table_all_zero(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    rules = [
        {"rule": "not_null", "col": "name"},
        {"rule": "unique", "cols": ["id"]},
    ]
    got = {r["rule"]: r["violations"] for r in validate(df, rules).collect()}
    assert got == {"not_null_name": 0, "unique_id": 0}


def test_unknown_rule_rejected(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        validate(df, [{"rule": "nope", "col": "id"}])


def test_duplicate_rules_get_suffixes(spark):
    df = spark.createDataFrame([(10,), (200,), (75,)], "qty long")
    rules = [
        {"rule": "in_range", "col": "qty", "lo": 0, "hi": 100},    # hard
        {"rule": "in_range", "col": "qty", "lo": 0, "hi": 50},     # warn
    ]
    got = {r["rule"]: r["violations"] for r in validate(df, rules).collect()}
    assert got == {"in_range_qty": 1, "in_range_qty_2": 2}


def test_empty_rule_set(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = validate(df, [])
    assert out.columns == ["rule", "violations"]
    assert out.count() == 0


def test_accepted_values_rejects_none_in_list(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with pytest.raises(ValueError, match="not contain None"):
        validate(df, [{"rule": "accepted_values", "col": "name",
                       "values": ["a", None]}])


# --- mixture drift between corpus snapshots ---------------------------------


def test_mixture_drift_shares_and_flags(spark):
    from sstable_migrator_spark.operators.expectations import (
        mixture_drift_report,
    )

    old = spark.createDataFrame(
        [("en", 100)] * 3 + [("de", 50)] * 3, "lang string, toks long"
    )
    new = spark.createDataFrame(
        [("en", 100)] * 5 + [("fr", 30)], "lang string, toks long"
    )
    rows = {r["grp"]: r for r in mixture_drift_report(
        old, new, "lang", "toks", tol_ppt=50).collect()}
    # de vanished: is_gone, and losing a 1/3 share IS drift
    assert rows["de"]["is_gone"] == 1 and rows["de"]["drifted"] == 1
    assert rows["de"]["new_docs"] == 0 and rows["de"]["new_w"] == 0
    # fr appeared with ~5.7% share: is_new, above the 5% tolerance
    assert rows["fr"]["is_new"] == 1 and rows["fr"]["drifted"] == 1
    # en moved 66.7% -> 94.3%
    assert rows["en"]["old_share_x1e6"] == 666666
    assert rows["en"]["new_share_x1e6"] == 943396
    assert rows["en"]["drifted"] == 1


def test_mixture_drift_within_tolerance(spark):
    from sstable_migrator_spark.operators.expectations import (
        mixture_drift_report,
    )

    old = spark.createDataFrame(
        [("en", 100)] * 10 + [("de", 100)] * 10, "lang string, toks long"
    )
    # one extra en doc: share moves 50% -> ~52.4%, inside 50 ppt
    new = spark.createDataFrame(
        [("en", 100)] * 11 + [("de", 100)] * 10, "lang string, toks long"
    )
    rows = {r["grp"]: r for r in mixture_drift_report(
        old, new, "lang", "toks", tol_ppt=50).collect()}
    assert rows["en"]["drifted"] == 0 and rows["de"]["drifted"] == 0
    # doc-count weighting (weight_col=None) agrees here by construction
    rows2 = {r["grp"]: r for r in mixture_drift_report(
        old, new, "lang", tol_ppt=50).collect()}
    assert rows2["en"]["drifted"] == 0
    assert rows2["en"]["new_docs"] == 11 and rows2["en"]["new_w"] == 11
