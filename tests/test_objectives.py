"""Span corruption (operators/objectives.py): matches an independent
pure-Python md5 replay, reassembles exactly, and handles empty /
collided-cut documents."""

from __future__ import annotations

import hashlib
import re

from sstable_migrator_spark.operators.objectives import span_corruption


def _replay(doc_id: int, text: str, n_spans: int = 2, seed: int = 7):
    n = len(text)

    def cut(tag: str) -> int:
        h = hashlib.md5(f"{doc_id}:{seed}:{tag}".encode()).hexdigest()
        return int(h[:15], 16) % (n + 1)

    cuts = sorted(cut(f"c{i}") for i in range(2 * n_spans))
    inp, tgt = text[: cuts[0]], ""
    for k in range(n_spans):
        lo, hi = cuts[2 * k], cuts[2 * k + 1]
        inp += f"<extra_id_{k}>"
        tgt += f"<extra_id_{k}>" + text[lo:hi]
        nxt = cuts[2 * k + 2] if k + 1 < n_spans else n
        inp += text[hi:nxt]
    tgt += f"<extra_id_{n_spans}>"
    return inp, tgt


def _reassemble(inp: str, tgt: str, n_spans: int) -> str:
    segs = re.split(r"<extra_id_\d+>", inp)
    spans = re.split(r"<extra_id_\d+>", tgt)[1:-1]
    assert len(segs) == n_spans + 1 and len(spans) == n_spans
    out = segs[0]
    for seg, span in zip(segs[1:], spans):
        out += span + seg
    return out


def test_span_corruption_matches_replay_and_reassembles(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for n_spans in (1, 2, 3):
        rows = span_corruption(docs, n_spans=n_spans).collect()
        assert len(rows) == len(src)
        for r in rows:
            text = src[r["doc_id"]]
            inp, tgt = _replay(r["doc_id"], text, n_spans)
            assert r["input_text"] == inp and r["target_text"] == tgt
            assert _reassemble(inp, tgt, n_spans) == text


def test_span_corruption_edges(spark):
    import pytest

    docs = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, "héllo wörld")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in span_corruption(docs).collect()}
    # empty doc: all cuts 0 -> empty segments and spans, sentinels only
    assert got[1]["input_text"] == "<extra_id_0><extra_id_1>"
    assert got[1]["target_text"] == "<extra_id_0><extra_id_1><extra_id_2>"
    for d in (2, 3):
        text = {2: "ab", 3: "héllo wörld"}[d]
        inp, tgt = _replay(d, text)
        assert got[d]["input_text"] == inp and got[d]["target_text"] == tgt
        assert _reassemble(inp, tgt, 2) == text

    with pytest.raises(ValueError, match="n_spans"):
        span_corruption(docs, n_spans=0)


def test_span_corruption_map_only(spark):
    docs = spark.createDataFrame([(1, "xyz")], "doc_id long, text string")
    plan = (
        span_corruption(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
