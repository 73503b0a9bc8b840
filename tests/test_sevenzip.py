"""7z extraction (SURVEY S5 — daily_certstream_download.sh:33-39).

Fixture archives come from tests/sevenzip_fixture.py (spec-conformant
writer) so the production extractor parses real container layouts:
LZMA1 and Copy coders, multi-member substreams, empty members, and
LZMA-compressed (encoded) headers.
"""

from __future__ import annotations

import pytest

from sstable_migrator_spark.sources.readers import stage_url
from sstable_migrator_spark.sources.sevenzip import SevenZipError, extract_7z, is_7z
from tests.sevenzip_fixture import build_7z

MEMBERS = {
    "certs_a.csv": b"dom1.example.com,1.2.3.4\ndom2.example.org,5.6.7.8\n",
    "certs_b.csv": b"dom3.example.net,9.9.9.9\n",
    "empty.txt": b"",
}


@pytest.mark.parametrize("coder", ["lzma1", "copy"])
@pytest.mark.parametrize("encoded_header", [False, True])
def test_roundtrip(coder, encoded_header):
    buf = build_7z(MEMBERS, coder=coder, encoded_header=encoded_header)
    assert is_7z(buf)
    assert extract_7z(buf) == MEMBERS


def test_large_member_compresses_and_roundtrips():
    big = {"big.csv": b"".join(b"row%d,payload\n" % i for i in range(50000))}
    buf = build_7z(big)
    assert len(buf) < len(big["big.csv"]) // 4  # actually compressed
    assert extract_7z(buf) == big


def test_malformed_rejected():
    with pytest.raises(SevenZipError):
        extract_7z(b"PK\x03\x04 definitely a zip not a 7z")
    truncated = build_7z(MEMBERS)[:40]
    with pytest.raises((SevenZipError, IndexError)):
        extract_7z(truncated)


def test_stage_url_extracts_7z_and_spark_reads_members(spark, tmp_path):
    """The S5 'done' criterion: a .7z payload stages through stage_url
    without external tooling and Spark reads the member directory."""
    archive = tmp_path / "dump.7z"
    archive.write_bytes(build_7z(MEMBERS))
    dest = tmp_path / "staged_dump"

    got = stage_url(f"file://{archive}", str(dest))
    assert got == str(dest)
    assert sorted(p.name for p in dest.iterdir()) == sorted(MEMBERS)

    df = spark.read.csv(f"{dest}/certs_*.csv")
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [
        ("dom1.example.com", "1.2.3.4"),
        ("dom2.example.org", "5.6.7.8"),
        ("dom3.example.net", "9.9.9.9"),
    ]


def test_stage_url_leaves_gz_untouched(tmp_path):
    import gzip

    src = tmp_path / "plain.gz"
    src.write_bytes(gzip.compress(b"a,b\n"))
    dest = tmp_path / "staged.gz"
    got = stage_url(f"file://{src}", str(dest))
    assert got == str(dest)
    assert dest.is_file()
    assert gzip.decompress(dest.read_bytes()) == b"a,b\n"
