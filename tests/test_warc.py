"""WARC/WET source (sources/warc.py): round-trip, multi-file
parallel scan, record-type filtering, gzip + plain, malformed-framing
errors, byte determinism."""

from __future__ import annotations

import gzip
import io

import pytest

from sstable_migrator_spark.sources.warc import (
    WarcFormatError,
    encode_wet,
    iter_warc_records,
    read_wet,
)


def _recs(a=0, n=3):
    return [
        {"url": f"http://example.com/{a + i}",
         "date": "2024-06-01T00:00:00Z",
         "text": f"document {a + i} body with some words\nand a second line"}
        for i in range(n)
    ]


def test_roundtrip_and_determinism(tmp_path):
    recs = _recs()
    blob = encode_wet(recs)
    assert blob == encode_wet(recs)  # byte-deterministic
    got = list(iter_warc_records(gzip.GzipFile(fileobj=io.BytesIO(blob))))
    assert len(got) == 3
    for r, (h, payload) in zip(recs, got):
        assert h["WARC-Type"] == "conversion"
        assert h["WARC-Target-URI"] == r["url"]
        assert payload.decode("utf-8") == r["text"]


def test_read_wet_multi_file_and_plain(spark, tmp_path):
    (tmp_path / "a.warc.wet.gz").write_bytes(encode_wet(_recs(0, 2)))
    (tmp_path / "b.warc.wet.gz").write_bytes(encode_wet(_recs(10, 3)))
    # uncompressed variant: the decompressed member stream
    raw = io.BytesIO()
    with gzip.GzipFile(fileobj=io.BytesIO(encode_wet(_recs(20, 1)))) as fh:
        raw.write(fh.read())
    (tmp_path / "c.warc.wet").write_bytes(raw.getvalue())

    df = read_wet(spark, str(tmp_path / "*.warc.wet*"))
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 6
    assert rows["http://example.com/11"]["file"] == "b.warc.wet.gz"
    assert rows["http://example.com/20"]["record_type"] == "conversion"
    assert "second line" in rows["http://example.com/0"]["text"]
    assert rows["http://example.com/0"]["length"] == len(
        _recs()[0]["text"].encode()
    )


def test_record_type_filter_and_missing(spark, tmp_path):
    (tmp_path / "a.warc.wet.gz").write_bytes(encode_wet(_recs(0, 2)))
    assert (
        read_wet(spark, str(tmp_path / "*.gz"), record_types=("response",)).count()
        == 0
    )
    with pytest.raises(ValueError, match="no WET files"):
        read_wet(spark, str(tmp_path / "nope-*.gz"))


def test_read_wet_chunked_yields_identical(spark, tmp_path):
    """Task memory is O(chunk): a chunk size of 1 must produce exactly
    the same rows as the default whole-file batching."""
    (tmp_path / "a.warc.wet.gz").write_bytes(encode_wet(_recs(0, 5)))
    base = sorted(tuple(r) for r in read_wet(spark, str(tmp_path / "*.gz")).collect())
    tiny = sorted(
        tuple(r)
        for r in read_wet(spark, str(tmp_path / "*.gz"), chunk_records=1).collect()
    )
    assert tiny == base and len(base) == 5
    with pytest.raises(ValueError, match="chunk_records"):
        read_wet(spark, str(tmp_path / "*.gz"), chunk_records=0)


def test_split_http_response_variants():
    from sstable_migrator_spark.sources.warc import split_http_response

    meta, body = split_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n"
        b"\r\n<p>caf\xe9</p>"
    )
    assert meta == {
        "status": 200, "content_type": "text/html", "charset": "iso-8859-1",
        "content_encoding": "",
    }
    assert body.decode(meta["charset"]) == "<p>café</p>"
    # bare-LF server, no charset param -> utf-8 default
    meta, body = split_http_response(
        b"HTTP/1.0 404 Not Found\nContent-Type: text/plain\n\nmissing"
    )
    assert meta["status"] == 404 and meta["charset"] == "utf-8"
    assert body == b"missing"
    # headerless payload: treated as body, never dropped
    meta, body = split_http_response(b"just bytes, no header block")
    assert meta["status"] == 0 and body == b"just bytes, no header block"


def test_read_warc_responses_end_to_end(spark, tmp_path):
    """Raw-WARC responses: header strip, charset decode, status and
    content-type surfaced, non-response records ignored."""
    from sstable_migrator_spark.sources.warc import (
        encode_warc_responses,
        read_warc_responses,
    )

    recs = [
        {"url": "http://a.com/1", "html": "<h1>Title &amp; one</h1>"},
        {
            "url": "http://a.com/latin",
            "html": "café page",
            "content_type": "text/html; charset=utf-8",
        },
        {"url": "http://a.com/gone", "html": "nope", "status": 404},
    ]
    blob = encode_warc_responses(recs)
    assert blob == encode_warc_responses(recs)  # byte-deterministic
    (tmp_path / "a.warc.gz").write_bytes(blob)
    # a WET conversion record in the same directory must be ignored
    (tmp_path / "b.warc.gz").write_bytes(encode_wet(_recs(50, 1)))

    rows = {
        r["url"]: r
        for r in read_warc_responses(spark, str(tmp_path / "*.warc.gz")).collect()
    }
    assert set(rows) == {"http://a.com/1", "http://a.com/latin", "http://a.com/gone"}
    assert rows["http://a.com/1"]["status"] == 200
    assert rows["http://a.com/1"]["content_type"] == "text/html"
    assert rows["http://a.com/1"]["html"] == "<h1>Title &amp; one</h1>"
    assert rows["http://a.com/1"]["length"] == len("<h1>Title &amp; one</h1>")
    assert rows["http://a.com/latin"]["html"] == "café page"
    assert rows["http://a.com/gone"]["status"] == 404


def test_warc_responses_to_documents(spark, tmp_path):
    """The pipeline shape: 2xx text responses survive, html is
    extracted to text, ids equal the WET path's hash-of-(url|date)."""
    from sstable_migrator_spark.pipelines.web_ingest import (
        warc_responses_to_documents,
        wet_to_documents,
    )
    from sstable_migrator_spark.sources.warc import (
        encode_warc_responses,
        read_warc_responses,
    )

    date = "2024-06-01T00:00:00Z"
    recs = [
        {"url": "http://a.com/keep", "date": date,
         "html": "<html><body><p>the words &amp; more words here</p></body></html>"},
        {"url": "http://a.com/404", "date": date, "html": "gone", "status": 404},
        {"url": "http://a.com/bin", "date": date, "html": "PK..",
         "content_type": "application/zip"},
    ]
    (tmp_path / "a.warc.gz").write_bytes(encode_warc_responses(recs))
    docs = warc_responses_to_documents(
        read_warc_responses(spark, str(tmp_path / "*.warc.gz"))
    ).collect()
    assert [d["url"] for d in docs] == ["http://a.com/keep"]
    assert docs[0]["text"] == "the words & more words here"
    # identical identity to the WET path: same (url, date) -> same id
    wet = wet_to_documents(
        spark.createDataFrame(
            [("http://a.com/keep", date, "whatever")], "url string, date string, text string"
        )
    ).first()
    assert docs[0]["doc_id"] == wet["doc_id"]


def test_malformed_framing_raises():
    bad = b"NOTWARC/1.0\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
    with pytest.raises(WarcFormatError, match="version line"):
        list(iter_warc_records(io.BytesIO(bad)))
    trunc = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 99\r\n\r\nshort"
    )
    with pytest.raises(WarcFormatError, match="truncated"):
        list(iter_warc_records(io.BytesIO(trunc)))
    noheader = b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\nx"
    with pytest.raises(WarcFormatError, match="Content-Length"):
        list(iter_warc_records(io.BytesIO(noheader)))


def test_writer_rejects_header_linebreaks():
    """A CR/LF inside a url/date would silently corrupt the framing of
    every record after it — both writers refuse at write time."""
    from sstable_migrator_spark.sources.warc import (
        encode_warc_responses,
        encode_wet,
    )

    with pytest.raises(ValueError, match="line break"):
        encode_wet([{"url": "http://x.com/a\r\nWARC-Type: evil", "text": "t"}])
    with pytest.raises(ValueError, match="line break"):
        encode_warc_responses([{"url": "http://x.com/a\nX: y", "html": "h"}])


def test_split_http_response_chunked_and_compressed():
    """Real CommonCrawl response payloads carry Transfer-Encoding:
    chunked and Content-Encoding: gzip/deflate — the body must be
    de-framed and decompressed, never fed to html_to_text as chunk
    lines or compressed bytes; undecodable codings are flagged in
    content_encoding instead of silently ingested."""
    import zlib

    from sstable_migrator_spark.sources.warc import split_http_response

    page = b"<html><p>" + b"hello chunked world " * 200 + b"</p></html>"

    # chunked framing, two chunks + trailer section
    chunked = (
        b"%x\r\n" % 100 + page[:100] + b"\r\n"
        + b"%x\r\n" % (len(page) - 100) + page[100:] + b"\r\n"
        + b"0\r\nX-Trailer: t\r\n\r\n"
    )
    meta, body = split_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + chunked
    )
    assert meta["content_encoding"] == "" and body == page

    # gzip content coding
    co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    gz = co.compress(page) + co.flush()
    meta, body = split_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + gz
    )
    assert meta["content_encoding"] == "" and body == page

    # deflate, both zlib-wrapped and raw forms
    for blob in (zlib.compress(page), zlib.compress(page)[2:-4]):
        meta, body = split_http_response(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + blob
        )
        assert meta["content_encoding"] == "" and body == page

    # chunked THEN gzip (wire order): de-chunk first, then decompress
    chunked_gz = b"%x\r\n" % len(gz) + gz + b"\r\n0\r\n\r\n"
    meta, body = split_http_response(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + chunked_gz
    )
    assert meta["content_encoding"] == "" and body == page

    # unsupported coding: flagged, body kept as-is
    meta, body = split_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nBRBYTES"
    )
    assert meta["content_encoding"] == "br" and body == b"BRBYTES"

    # corrupt gzip: flagged with '?', not a crash
    meta, body = split_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot gzip at all"
    )
    assert meta["content_encoding"] == "gzip?"

    # malformed chunk framing: flagged, raw bytes kept
    meta, body = split_http_response(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzzzz\r\nnope"
    )
    assert meta["content_encoding"] == "chunked?"


def test_warc_encoded_payload_round_trip(spark, tmp_path):
    """The writer twin now emits the encodings real shards carry:
    chunked/gzip/deflate payloads round-trip byte-exactly through
    read_warc_responses, and warc_responses_to_documents drops an
    undecodable record instead of ingesting garbage."""
    from pyspark.sql import functions as F

    from sstable_migrator_spark.pipelines.web_ingest import (
        warc_responses_to_documents,
    )
    from sstable_migrator_spark.sources.warc import (
        encode_warc_responses,
        read_warc_responses,
    )

    page = "<html><body><p>" + "words flow here " * 120 + "</p></body></html>"
    recs = [
        {"url": "http://e.com/plain", "html": page},
        {"url": "http://e.com/gz", "html": page, "content_encoding": "gzip"},
        {"url": "http://e.com/df", "html": page,
         "content_encoding": "deflate"},
        {"url": "http://e.com/ch", "html": page,
         "transfer_encoding": "chunked"},
        {"url": "http://e.com/chgz", "html": page,
         "content_encoding": "gzip", "transfer_encoding": "chunked"},
    ]
    blob = encode_warc_responses(recs)
    assert blob == encode_warc_responses(recs)  # still byte-deterministic
    (tmp_path / "enc.warc.gz").write_bytes(blob)
    rows = {
        r["url"]: r
        for r in read_warc_responses(
            spark, str(tmp_path / "*.warc.gz")
        ).collect()
    }
    assert len(rows) == 5
    for r in rows.values():
        assert r["content_encoding"] == "" and r["html"] == page

    # an undecodable record (flagged residual) is filtered by the
    # document shaper, not ingested as text
    docs = warc_responses_to_documents(
        read_warc_responses(spark, str(tmp_path / "*.warc.gz")).withColumn(
            "content_encoding",
            F.when(F.col("url") == "http://e.com/gz", "br").otherwise(
                F.col("content_encoding")
            ),
        )
    )
    kept = {r["url"] for r in docs.select("url").collect()}
    assert kept == {
        "http://e.com/plain", "http://e.com/df", "http://e.com/ch",
        "http://e.com/chgz",
    }
