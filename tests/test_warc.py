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
