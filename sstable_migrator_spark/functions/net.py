"""IPv4 helpers as native expressions (SURVEY F6, J2/J3 support).

- ``ip_int``      — dotted-quad -> int64 (for range joins & masking).
- ``ip_block``    — /8 /16 /24 network address as dotted-quad
  (App.java:673-699: mask then re-format; equivalent to zeroing the
  trailing octets).
- ``is_valid_ipv4`` — P10 guard (App.java:395-400 drops unparseable IPs).

At 100 TB the GeoIP range join (ip_int BETWEEN net_start AND net_end)
must not be a BroadcastNestedLoopJoin over the whole fact table; see
``operators.ingest.geoip_enrich`` for the ip8-bucketed equi+range
pattern (SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

IPV4_RE = (
    "^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    "(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}$"
)


def is_valid_ipv4(col: Column) -> Column:
    """Strict dotted-quad validation — DELIBERATELY stricter than
    Java's InetAddress.getByName (App.java:395-400), which also accepts
    partial forms ('1.2.3' == 1.2.0.3) and leading-zero octets: in a
    DNS-observation feed those are junk rows, not addresses, so the
    gate keeps only canonical four-octet decimals. A migration
    comparing row counts against the reference should count rows the
    Java parser would have rescued via these quirks separately."""
    return col.rlike(IPV4_RE)


def _octet(col: Column, i: int) -> Column:
    # try_cast, not cast: ip_int is routinely computed BEFORE the
    # validity gate filters rows (parse_and_route), and Spark 4's
    # default ANSI mode turns cast('long') of a non-numeric octet into
    # a job-aborting CAST_INVALID_INPUT instead of NULL
    return F.get(F.split(col, "\\."), i - 1).try_cast("long")


def ip_int(col: Column) -> Column:
    """Dotted-quad -> 64-bit integer (unsigned 32-bit value range)."""
    return (
        _octet(col, 1) * 16777216
        + _octet(col, 2) * 65536
        + _octet(col, 3) * 256
        + _octet(col, 4)
    )


def ip_int_from_parts(parts: Column) -> Column:
    """ip_int over a pre-split octet array (hot paths stage the split
    once instead of re-splitting for each of ip8/ip16/ip24/ip_int)."""
    return (
        F.get(parts, 0).try_cast("long") * 16777216
        + F.get(parts, 1).try_cast("long") * 65536
        + F.get(parts, 2).try_cast("long") * 256
        + F.get(parts, 3).try_cast("long")
    )


def ip_block_from_parts(parts: Column, prefix: int) -> Column:
    """ip_block over a pre-split octet array (see ip_int_from_parts)."""
    if prefix not in (8, 16, 24):
        raise ValueError("byte-aligned prefixes only: 8, 16, 24")
    keep = prefix // 8
    kept = [F.get(parts, i) for i in range(keep)]
    zeros = [F.lit("0")] * (4 - keep)
    return F.concat_ws(".", *kept, *zeros)


def ip_block(col: Column, prefix: int) -> Column:
    """Network address for /8 /16 /24 as dotted-quad string.

    Masking an IPv4 at these byte-aligned prefixes == keeping the first
    prefix/8 octets and zeroing the rest (App.java:673-699 does the same
    via an int mask).
    """
    if prefix not in (8, 16, 24):
        raise ValueError("byte-aligned prefixes only: 8, 16, 24")
    keep = prefix // 8
    parts = F.split(col, "\\.")
    kept = [F.get(parts, i) for i in range(keep)]
    zeros = [F.lit("0")] * (4 - keep)
    return F.concat_ws(".", *kept, *zeros)


def int_to_ip(col: Column) -> Column:
    """int64 -> dotted-quad (inverse of ip_int; for dim-table tooling)."""
    return F.concat_ws(
        ".",
        ((col / 16777216).cast("long") % 256).cast("string"),
        ((col / 65536).cast("long") % 256).cast("string"),
        ((col / 256).cast("long") % 256).cast("string"),
        (col % 256).cast("string"),
    )
