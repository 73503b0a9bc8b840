"""WARC / WET source — CommonCrawl's actual corpus container.

The reference pipeline's CommonCrawl side consumes the INDEX shards
(S6, cdx/SURT lines — sources.readers.read_surt_lines); a training-data
pipeline consumes the CONTENT: WARC files (ISO 28500) and their WET
("conversion": extracted plain text) siblings. This module reads them
dependency-free:

- record grammar: a ``WARC/1.x`` version line, ``Name: value`` header
  lines to a blank line, exactly ``Content-Length`` payload bytes, then
  a blank-line record separator. CommonCrawl gzips MEMBER-PER-RECORD;
  stdlib gzip reads concatenated members transparently, so one
  sequential decompress-and-parse pass per file needs O(record) memory.
- ``read_wet``: one task PER FILE (CC shards are ~150 MB .gz each — the
  natural parallel unit; a 100 TB crawl is ~700k files, far more than
  any cluster's cores), same repartitionByRange pinning as the tar and
  sstable sources. Filters to the requested record types (default
  ``conversion`` — the WET text records; pass ``("response",)`` for raw
  WARC) and yields (file, url, date, record_type, length, text).
- ``encode_wet``: the byte-exact writer twin (fixtures, round-trip
  tests, and the catalog oracle entry), per-record gzip members like
  CommonCrawl's own layout.

Reference analog: utils/cc_download_convert (SURVEY §2.1 S6) walked the
index; this is the content half a corpus builder actually trains on.
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["encode_wet", "iter_warc_records", "read_wet"]

_CRLF = b"\r\n"


class WarcFormatError(ValueError):
    pass


def iter_warc_records(stream) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers: dict[str, str], payload: bytes)`` per record
    from a binary file-like of UNCOMPRESSED WARC bytes. O(record)
    memory; malformed framing raises loudly (a truncated crawl shard
    should fail the task, not silently shorten the corpus)."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line in (_CRLF, b"\n"):
            continue  # inter-record padding
        if not line.startswith(b"WARC/"):
            raise WarcFormatError(f"expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            hl = stream.readline()
            if not hl:
                raise WarcFormatError("EOF inside record headers")
            if hl in (_CRLF, b"\n"):
                break
            if b":" not in hl:
                raise WarcFormatError(f"bad header line {hl[:60]!r}")
            k, v = hl.split(b":", 1)
            headers[k.strip().decode("ascii")] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            n = int(headers["Content-Length"])
        except KeyError:
            raise WarcFormatError("record missing Content-Length") from None
        payload = stream.read(n)
        if len(payload) != n:
            raise WarcFormatError(
                f"truncated payload: wanted {n} bytes, got {len(payload)}"
            )
        yield headers, payload


def encode_wet(records: list[dict]) -> bytes:
    """Records ``{url, date, text}`` -> WET bytes, one gzip member per
    record (CommonCrawl's seekable layout). Deterministic output."""
    out = io.BytesIO()
    for r in records:
        payload = r["text"].encode("utf-8")
        head = (
            b"WARC/1.0\r\n"
            + b"WARC-Type: conversion\r\n"
            + b"WARC-Target-URI: " + r["url"].encode("utf-8") + b"\r\n"
            + b"WARC-Date: " + r.get("date", "2024-01-01T00:00:00Z").encode("ascii") + b"\r\n"
            + b"Content-Type: text/plain\r\n"
            + b"Content-Length: " + str(len(payload)).encode("ascii") + b"\r\n"
            + b"\r\n"
        )
        member = head + payload + b"\r\n\r\n"
        gz = io.BytesIO()
        # fixed mtime: byte-deterministic like every writer here
        with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as fh:
            fh.write(member)
        out.write(gz.getvalue())
    return out.getvalue()


def read_wet(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("conversion",),
) -> DataFrame:
    """Scan ``path`` (a glob of ``*.warc.wet(.gz)`` files) into one row
    per matching record: (file, url, date, record_type, length, text).
    One task per file; gzip is detected by magic per file."""
    import glob as _glob

    import pandas as pd

    files = sorted(_glob.glob(path))
    if not files:
        raise ValueError(f"no WET files match {path}")
    dirs_df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(files)], "i int, file string"
    ).repartitionByRange(len(files), "i")
    types = set(record_types)

    def _scan(batches):
        for pdf in batches:
            for fname in pdf["file"]:
                rows = []
                with open(fname, "rb") as raw:
                    magic = raw.read(2)
                    raw.seek(0)
                    stream = (
                        gzip.GzipFile(fileobj=raw) if magic == b"\x1f\x8b" else raw
                    )
                    for headers, payload in iter_warc_records(stream):
                        rt = headers.get("WARC-Type", "")
                        if rt not in types:
                            continue
                        rows.append(
                            {
                                "file": os.path.basename(fname),
                                "url": headers.get("WARC-Target-URI", ""),
                                "date": headers.get("WARC-Date", ""),
                                "record_type": rt,
                                "length": len(payload),
                                "text": payload.decode("utf-8", "replace"),
                            }
                        )
                if rows:
                    yield pd.DataFrame(rows)

    return dirs_df.mapInPandas(
        _scan,
        "file string, url string, date string, record_type string, "
        "length long, text string",
    )
