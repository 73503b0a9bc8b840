"""JSONL source/sink: training-export roundtrip, shard count control,
and PERMISSIVE corrupt-record capture (the reject-stream analog of the
reference cleaners, utils.go:95-109)."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sstable_migrator_spark.sinks import write_jsonl_shards
from sstable_migrator_spark.sources.readers import read_jsonl


def test_roundtrip_and_shards(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    out = str(tmp_path / "shards")
    write_jsonl_shards(docs, out, n_shards=4)
    files = glob.glob(f"{out}/part-*.json.gz")
    assert len(files) == 4
    back = read_jsonl(
        spark, out, "doc_id long, text string, lang string, source string"
    )
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_corrupt_records_survive(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        json.dumps({"doc_id": 1, "text": "ok"})
        + "\n{not json at all\n"
        + json.dumps({"doc_id": 2, "text": "also ok"})
        + "\n"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = read_jsonl(spark, str(p), schema)
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and r"{not json" in bad[0]["_corrupt_record"]
    assert {r["doc_id"] for r in rows if r["doc_id"] is not None} == {1, 2}
