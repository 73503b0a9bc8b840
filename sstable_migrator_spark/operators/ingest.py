"""The §3.1 ingest pipeline, Spark-first.

The reference's ``parseAndInsertCSV`` (App.java:341-478) is a hand-fused
row loop: arity check -> domain validate/cleanup -> getDomainParts ->
route on record type -> IP parse + /8 /16 /24 blocks -> GeoIP City/ASN
lookups -> guard empty apex -> write to cnames OR (rdnsv4 AND
subdomains). Here the whole thing is one declarative plan: Catalyst
fuses it (whole-stage codegen == the hand fusion), and the three sinks
share one cached parse via ``route``.

Bugs deliberately not copied (SURVEY §7.3): cleaned-domain drop
(App.java:364 — cleanup result ignored), file-abort-on-one-bad-row
(App.java:287 catch placement).

Scale notes:
- GeoIP is a *broadcast range join*. The naive BETWEEN predicate makes
  BroadcastNestedLoopJoin (fine for tiny dims); ``geoip_enrich`` uses
  the prefix-bucket trick — equi-join on the /8 octet first, then the
  range filter — so Catalyst plans a broadcast *hash* join keyed on the
  bucket: O(rows x ranges-per-bucket) instead of O(rows x ranges).
  Dim ranges spanning multiple /8s are exploded once on the tiny side.
- The multi-sink split caches the enriched parse ONCE (StorageLevel
  MEMORY_AND_DISK) and runs three narrow filters — the single-pass
  analog of App.java:442-477.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sstable_migrator_spark.functions.domains import (
    with_clean_domain,
    with_domain_parts,
)
from sstable_migrator_spark.functions.net import (
    ip_block_from_parts,
    ip_int_from_parts,
    is_valid_ipv4,
)
from sstable_migrator_spark.plans.explain import fence


def parse_and_route(
    dns_records: DataFrame,
    tld_set: Iterable[str] | None = None,
    source: str = "unknown",
) -> DataFrame:
    """massdns triples -> validated, decomposed, routed rows.

    Output columns: domain (cleaned), record_type, ip, is_cname,
    apexDomain, p1..p7, ip8/ip16/ip24/ip_int (A-records only), source,
    and a boolean ``keep``. Rows the reference would drop
    (P2/P3/P10/P11 in SURVEY §2.3) carry ``keep = false`` — cleanable
    domains are kept (Go-cleaner behavior, not the App.java:364 bug).
    Callers persist and ``filter("keep")`` (see note below).
    """
    # Cheap source-column null guard — this one SHOULD push to the scan.
    df = dns_records.filter(
        F.col("domain").isNotNull()
        & F.col("record_type").isNotNull()
        & F.col("ip").isNotNull()
    )
    # Heavy derivations, each staged so it is computed ONCE per row.
    # Row-validity is collected into one boolean instead of interleaved
    # filters: Catalyst would push each filter below the projections,
    # re-inlining the clean/parts CASE trees per filter and blowing the
    # fused stage past the 64KB codegen method limit.
    df = with_clean_domain(df, "domain", "domain_clean")
    df = with_domain_parts(df, "domain_clean", "_dp", tld_set)

    is_cname = F.col("record_type") != "A"
    # CNAME: field 3 is the target domain and becomes the apex
    # (App.java:389-393); A: apex from decomposition.
    apex = F.when(is_cname, F.col("ip")).otherwise(F.col("_dp.apex"))
    df = df.withColumn("is_cname", is_cname).withColumn("apexDomain", apex)

    sel = [
        F.col("domain_clean").alias("domain"),
        F.col("record_type"),
        F.col("ip"),
        F.col("is_cname"),
        F.col("apexDomain"),
        *[F.col(f"_dp.p{i}").alias(f"p{i}") for i in range(1, 8)],
        F.lit(source).alias("source"),
    ]
    # one split of the IP per row, shared by all four derived columns
    df = df.withColumn("_ipp", F.split(F.col("ip"), "\\."))
    a_cols = [
        F.when(~F.col("is_cname"), ip_block_from_parts(F.col("_ipp"), 8)).alias("ip8"),
        F.when(~F.col("is_cname"), ip_block_from_parts(F.col("_ipp"), 16)).alias("ip16"),
        F.when(~F.col("is_cname"), ip_block_from_parts(F.col("_ipp"), 24)).alias("ip24"),
        F.when(~F.col("is_cname"), ip_int_from_parts(F.col("_ipp"))).alias("ip_int"),
    ]
    # P3 (validity after cleanup), F5 success, P10 (unparseable A-record
    # IP), P11 (empty apex) — one combined keep-flag over attributes.
    #
    # Deliberately NOT filtered here: a filter on any derived column
    # gets pushed below the staged projections by Catalyst, re-inlining
    # the clean/parts CASE lineage once per conjunct and blowing the
    # fused stage past the 64KB codegen method limit. The contract is
    # the multi-sink pattern the reference needs anyway (App.java:442-477
    # parses once, writes three tables): callers persist the parsed
    # frame, then filter on the cached ``keep`` attribute — the cache
    # boundary keeps the predicate a plain column reference.
    ok = (
        F.col("domain_clean").isNotNull()
        & F.col("_dp.success")
        & (F.col("is_cname") | is_valid_ipv4(F.col("ip")))
        & F.col("apexDomain").isNotNull()
        & (F.col("apexDomain") != "")
    )
    # The fence stops Catalyst from pushing a caller's filter("keep")
    # below these projections: alias substitution re-inlines the whole
    # clean->parts->apex lineage into the pushed predicate, and because
    # each stage references the previous one several times the inlined
    # tree grows EXPONENTIALLY (~185 KB of join condition in the
    # flagship plan; seconds of optimizer + janino time per action).
    # Filtering above the staged projection is the plan we want — the
    # fence just keeps it there.
    return df.select(
        *sel, *a_cols, fence(F.coalesce(ok, F.lit(False))).alias("keep")
    )


def _explode_dim_to_buckets(dim: DataFrame) -> DataFrame:
    """Explode each (net_start, net_end) range into the /8 buckets it
    covers. Tiny side only — ranges spanning b buckets emit b rows."""
    b_start = (F.col("net_start") / (1 << 24)).cast("long")
    b_end = (F.col("net_end") / (1 << 24)).cast("long")
    return dim.withColumn("bucket", F.explode(F.sequence(b_start, b_end)))


def geoip_enrich(
    facts: DataFrame,
    city_dim: DataFrame,
    asn_dim: DataFrame,
    ip_int_col: str = "ip_int",
) -> DataFrame:
    """J2/J3 — left range-join enrichment with miss tolerance
    (App.java:406-425: lookup failure -> empty strings / asn 0).

    Bucketed broadcast equi+range join (see module docstring): the fact
    side computes its /8 bucket (no shuffle — broadcast join), the dim
    side is exploded per bucket and broadcast.
    """
    facts = facts.withColumn("_b", (F.col(ip_int_col) / (1 << 24)).cast("long"))

    city = _explode_dim_to_buckets(city_dim).select(
        F.col("bucket"), F.col("net_start").alias("_cs"), F.col("net_end").alias("_ce"),
        "country", "city",
    )
    asn = _explode_dim_to_buckets(asn_dim).select(
        F.col("bucket"), F.col("net_start").alias("_as"), F.col("net_end").alias("_ae"),
        "asn", "as_name",
    )

    out = facts.join(
        F.broadcast(city),
        (facts["_b"] == city["bucket"])
        & (F.col(ip_int_col) >= F.col("_cs"))
        & (F.col(ip_int_col) <= F.col("_ce")),
        "left",
    ).drop("bucket", "_cs", "_ce")

    out = out.join(
        F.broadcast(asn),
        (out["_b"] == asn["bucket"])
        & (F.col(ip_int_col) >= F.col("_as"))
        & (F.col(ip_int_col) <= F.col("_ae")),
        "left",
    ).drop("bucket", "_as", "_ae", "_b")

    # miss -> reference defaults (App.java:377-380)
    return (
        out.withColumn("country", F.coalesce(F.col("country"), F.lit("")))
        .withColumn("city", F.coalesce(F.col("city"), F.lit("")))
        .withColumn("asn", F.coalesce(F.col("asn"), F.lit(0)))
        .withColumn("as_name", F.coalesce(F.col("as_name"), F.lit("")))
    )


def route_tables(parsed: DataFrame, batch_ts=None) -> dict[str, DataFrame]:
    """P8/K1 — the three table projections from one cached parse.

    Returns {'rdnsv4': ..., 'subdomains': ..., 'cnames': ...}; caller
    persists ``parsed`` before materializing more than one. Timestamps
    are a pinned per-batch literal (deterministic, unlike the per-row
    ``toTimestamp(now())`` at App.java:154 — SURVEY §7.3 nondeterminism
    note).
    """
    ts = F.lit(batch_ts).cast("timestamp") if batch_ts else F.current_timestamp()
    stamps = [ts.alias("firstSeen"), ts.alias("lastSeen"), ts.alias("updatedAt")]
    p_cols = [F.col(f"p{i}") for i in range(1, 8)]

    kept = parsed.filter(F.col("keep")) if "keep" in parsed.columns else parsed
    a_rows = kept.filter(~F.col("is_cname"))
    cname_rows = kept.filter(F.col("is_cname"))

    # un-enriched input gets the reference's miss defaults
    # (App.java:377-380: country/city/as_name empty, asn 0)
    have = set(parsed.columns)
    enrich = [
        (F.col(c) if c in have else F.lit(d).alias(c))
        for c, d in [("country", ""), ("city", ""), ("asn", 0), ("as_name", "")]
    ]

    rdnsv4 = a_rows.select(
        "ip8", "ip16", "ip24", F.col("ip").alias("ipAddress"), *p_cols,
        *enrich,
        "source", F.col("record_type").alias("sourceRecordType"), *stamps,
    )
    subdomains = a_rows.select(
        *p_cols, "source", F.col("record_type").alias("sourceRecordType"), *stamps
    )
    cnames = cname_rows.select(
        F.col("ip").alias("target"), "apexDomain", "domain", "source", *stamps
    )
    return {"rdnsv4": rdnsv4, "subdomains": subdomains, "cnames": cnames}
