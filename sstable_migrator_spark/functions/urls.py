"""Canonical URL normalization — the key function of web-corpus URL
dedup (two crawls of the same page under cosmetically different URLs
must collapse to one key BEFORE content ever downloads).

Rules (the standard crawl-dedup set, each one a pure column step):

1. strip the fragment (``#...`` never reaches the server);
2. lowercase the scheme and the host (RFC 3986 §6.2.2.1 — path and
   query stay case-sensitive);
3. drop default ports (``http://h:80`` == ``http://h``,
   ``https://h:443`` == ``https://h``);
4. drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``) and SORT the surviving query params byte-wise — order
   variations collapse, semantics-preserving for the overwhelmingly
   common independent-param case (documented, not hidden);
5. drop an empty ``?`` and a lone trailing ``?``.

Both engines implement the SAME steps: Spark as whole-stage-codegen
expressions (``canonical_url``), DuckDB as a mirrored SQL builder
(``sql_canonical_url``) — parity is unit-pinned over the nasty cases
and hash-gated in the catalog (q202). Non-URL garbage passes through
lowercased-scheme-less and unharmed; this is a normalizer, not a
validator (pair it with the P3/P4 validity family).

Reference analog: SURVEY §2 F7/F8's SURT normalization — the same
"one canonical key per logical resource" idea, applied to full URLs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonical_url", "sql_canonical_url", "TRACKING_PARAM_RE"]

# anchored regex a query PARAM (k=v or bare k) must match to be dropped
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid)(=.*)?$"

_SPLIT_RE = r"^(?:([a-zA-Z][a-zA-Z0-9+.-]*)://)?([^/?#]*)(.*)$"


def canonical_url(col: Column) -> Column:
    u = F.regexp_replace(col, r"#.*$", "")  # 1. fragment
    scheme = F.lower(F.regexp_extract(u, _SPLIT_RE, 1))
    host = F.lower(F.regexp_extract(u, _SPLIT_RE, 2))
    rest = F.regexp_extract(u, _SPLIT_RE, 3)
    # 3. default ports (scheme-aware)
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.substring(host, 1, F.length(host) - 3),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.substring(host, 1, F.length(host) - 4),
    ).otherwise(host)
    path = F.regexp_replace(rest, r"\?.*$", "")
    query = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    prefix = F.when(scheme != "", F.concat(scheme, F.lit("://"))).otherwise(
        F.lit("")
    )
    return F.concat(
        prefix,
        host,
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )


def sql_canonical_url(expr: str) -> str:
    """DuckDB twin of ``canonical_url`` over an SQL expression string —
    the same five steps, mirrored function-for-function."""
    u = f"regexp_replace({expr}, '#.*$', '', 'g')"
    scheme = f"lower(regexp_extract({u}, '{_SPLIT_RE}', 1))"
    host0 = f"lower(regexp_extract({u}, '{_SPLIT_RE}', 2))"
    rest = f"regexp_extract({u}, '{_SPLIT_RE}', 3)"
    host = (
        f"(CASE WHEN {scheme} = 'http' AND {host0} LIKE '%:80' "
        f"THEN {host0}[1:-4] "
        f"WHEN {scheme} = 'https' AND {host0} LIKE '%:443' "
        f"THEN {host0}[1:-5] "
        f"ELSE {host0} END)"
    )
    path = f"regexp_replace({rest}, '\\?.*$', '', 'g')"
    query = (
        f"(CASE WHEN contains({rest}, '?') "
        f"THEN regexp_replace({rest}, '^[^?]*\\?', '', 'g') ELSE '' END)"
    )
    params = (
        f"list_filter(string_split({query}, '&'), "
        f"p -> length(p) > 0 AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))"
    )
    qnorm = f"array_to_string(list_sort({params}), '&')"
    prefix = f"(CASE WHEN {scheme} <> '' THEN {scheme} || '://' ELSE '' END)"
    return (
        f"({prefix} || {host} || {path} || "
        f"(CASE WHEN {qnorm} <> '' THEN '?' || {qnorm} ELSE '' END))"
    )
