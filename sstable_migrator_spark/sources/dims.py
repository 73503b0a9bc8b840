"""Dimension loaders (SURVEY S8/S9): TLD set and GeoIP range tables.

The reference loads TLD.txt into a HashMap (App.java:48-56) and opens
two MaxMind mmdb readers with a 262k-entry cache (App.java:254-266).
Spark-first equivalents:

- TLD set -> a driver-side list compiled into InSet expressions (see
  functions.domains) — the broadcast-variable analog;
- GeoIP -> two small range DataFrames ``(net_start, net_end, ...)``
  broadcast into range joins (operators.ingest.geoip_enrich). The mmdb
  files are absent from the reference repo (.MISSING_LARGE_BLOBS), so a
  deterministic synthetic dim stands in, mirroring FIXTURES.md: ranges
  with gaps so some IPs miss (miss -> empty/0 enrichment,
  App.java:377-380,423-425).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from sstable_migrator_spark import schemas
from sstable_migrator_spark.functions.domains import default_tld_set


def load_tld_set(path: str | None = None) -> list[str]:
    if path and os.path.exists(path):
        with open(path) as f:
            return sorted({ln.strip().lower() for ln in f if ln.strip()})
    return default_tld_set()


def geoip_city_rows(n_ranges: int = 64) -> list[tuple[int, int, str, str]]:
    """Deterministic /6-block ranges covering 3 of every 4 blocks
    (gaps exercise the left-join miss path). Shared by the Spark dim
    and the DuckDB oracle's VALUES literal so both sides agree."""
    rows = []
    countries = ["US", "DE", "FR", "IN", "BR", "JP", "GB", "AU"]
    for i in range(n_ranges):
        if i % 4 == 3:
            continue  # gap
        start = i * (1 << 26)
        rows.append((start, start + (1 << 26) - 1,
                     countries[i % len(countries)], f"city_{i:03d}"))
    return rows


def geoip_asn_rows(n_ranges: int = 64) -> list[tuple[int, int, int, str]]:
    rows = []
    for i in range(n_ranges):
        if i % 5 == 4:
            continue  # gap
        start = i * (1 << 26)
        rows.append((start, start + (1 << 26) - 1, 64500 + i, f"AS-ORG-{i:03d}"))
    return rows


def synthetic_geoip_city(spark: SparkSession, n_ranges: int = 64) -> DataFrame:
    return spark.createDataFrame(geoip_city_rows(n_ranges), schemas.GEOIP_CITY)


def synthetic_geoip_asn(spark: SparkSession, n_ranges: int = 64) -> DataFrame:
    return spark.createDataFrame(geoip_asn_rows(n_ranges), schemas.GEOIP_ASN)
