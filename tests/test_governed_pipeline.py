"""Governed ingest composition: contract gate -> curation -> versioned
snapshot -> run log -> notification."""

from __future__ import annotations

import json

import pytest

from sstable_migrator_spark.pipelines.governed import (
    ContractViolation,
    governed_ingest,
)
from sstable_migrator_spark.sinks.versioned import read_version


GOOD_TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm stove in the small kitchen of the old house and the "
    "dog dreams about a long walk in the quiet park after the warm rain"
)


def test_governed_ingest_commits_and_logs(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, GOOD_TEXT), (2, GOOD_TEXT), (3, GOOD_TEXT + " extra tail words")],
        "doc_id long, text string",
    )
    table = str(tmp_path / "corpus")
    log = str(tmp_path / "runlog")
    outbox = str(tmp_path / "outbox.jsonl")

    m = governed_ingest(docs, table, "r1", log, outbox_path=outbox)
    assert m["snapshot_version"] == 1
    assert m["curated_rows"] == 2          # docs 1,2 are exact dups -> one kept
    assert m["unique_doc_id"] == 0
    assert read_version(spark, table).count() == 2

    # second batch appends a new snapshot
    more = spark.createDataFrame(
        [(10, GOOD_TEXT + " another distinct document body")],
        "doc_id long, text string",
    )
    m2 = governed_ingest(more, table, "r2", log, outbox_path=outbox)
    assert m2["snapshot_version"] == 2
    assert read_version(spark, table).count() == 3
    assert read_version(spark, table, version=1).count() == 2

    logs = spark.read.parquet(log)
    assert logs.filter(logs.status == "ok").count() == 2
    lines = [json.loads(x) for x in open(outbox).read().splitlines()]
    assert [x["run_id"] for x in lines] == ["r1", "r2"]
    assert "curated_rows: 2" in lines[0]["message"]


def test_governed_ingest_rejects_bad_batch(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, GOOD_TEXT), (1, GOOD_TEXT), (2, None)],
        "doc_id long, text string",
    )
    table = str(tmp_path / "corpus")
    log = str(tmp_path / "runlog")
    with pytest.raises(ContractViolation):
        governed_ingest(docs, table, "bad1", log)
    # nothing committed; the rejection is on the record
    import os

    assert not os.path.isdir(f"{table}/_manifests")
    row = spark.read.parquet(log).collect()[0]
    assert row["status"] == "rejected"
    assert row["metrics"]["unique_doc_id"] == 1
    assert row["metrics"]["not_null_text"] == 1
