"""Pytest wrapper over the oracle harness: every catalog query must
hash-match its DuckDB oracle at sf0.001 (the full sf0.01 sweep runs via
``python -m tests.oracle_harness``)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare_one, duck_connection

SF = "/root/testdata/sf0.001"

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_match(spark, duck, name):
    res = compare_one(spark, duck, name, _QUERIES[name], _ORACLES.get(name), SF)
    assert res["ok"], res


# rows-only catalog entries, each with a reason and a dedicated test.
# EMPTY since round 8: q73 (the last holdout) now gates the q170 way —
# exact values hash-match, estimates proven within bound in-plan
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle_or_is_declared():
    missing = set(_QUERIES) - set(_ORACLES)
    assert missing == ROWS_ONLY, f"undeclared queries without oracle SQL: {missing - ROWS_ONLY}"


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["apexDomain", "cnt"]
