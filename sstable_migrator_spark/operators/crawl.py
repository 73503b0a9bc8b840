"""Crawl planning: robots.txt evaluation and per-host politeness
scheduling — the acquisition end of the web-corpus story (frontier ->
robots gate -> polite fetch plan -> WET ingestion -> curation).

- ``parse_robots_body`` / ``parse_robots``: the robots.txt grammar
  (user-agent groups, allow/disallow directives, comments,
  case-insensitive keys; PREFIX rules only — the ``*``/``$`` pattern
  extension is intentionally out of scope and documented, not silently
  half-supported). Bodies are tiny and per-host, so parsing runs as an
  Arrow-batched mapInPandas; everything downstream of the parse is
  pure joins/expressions, which is where the billions-of-URLs scale
  actually lives.
- ``robots_allowed``: the longest-match verdict per DISTINCT url
  (Google's precedence: most specific rule wins, allow wins
  length ties, no match means allowed). One join on host + one
  aggregation taking ``max(struct(prefix_len, is_allow))`` — the
  struct ordering IS the precedence rule, so no window is needed.
- ``crawl_schedule``: per-host politeness slots — fetch_seq is the
  rank within the host (optionally capped), so slot * crawl_delay is
  the earliest fetch offset. The rank is the grouped two-phase prefix
  sum, NOT a per-host window: a zipfian mega-host spreads over many
  range-partition tasks instead of funneling into one.

Reference analog: SURVEY §2 P6/P7's blocklist/allowlist gating, moved
from DNS names to crawl targets.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "crawl_delays",
    "parse_sitemap_body",
    "parse_sitemaps",
    "crawl_schedule",
    "parse_robots",
    "parse_robots_body",
    "robots_allowed",
    "url_host_path",
]

_SPLIT_RE = r"^(?:([a-zA-Z][a-zA-Z0-9+.-]*)://)?([^/?#]*)(.*)$"


def parse_robots_body(body: str, host: str = "") -> list[dict]:
    """robots.txt text -> rule rows ``{host, agent, rule, prefix}``.
    Grammar: ``key: value`` lines; ``#`` comments; consecutive
    ``User-agent`` lines open ONE group that the following
    allow/disallow directives all belong to; keys case-insensitive;
    an EMPTY-prefix directive ("Disallow:" = allow everything) emits a
    sentinel ``allow ''`` row — matching every path at length 0, so it
    changes no verdict on its own, but it REGISTERS the group: a host
    whose specific-agent group is only "Disallow:" must still shadow
    the ``*`` group in ``robots_allowed`` (REP group selection — a
    group with no restrictive rules is a group, not an absence).
    PREFIX matching only (no ``*``/``$`` patterns — rows whose prefix
    contains them are emitted verbatim and simply won't prefix-match,
    which errs on the permissive side; run a stricter gate if your
    corpus needs the pattern extension)."""
    rules: list[dict] = []
    agents: list[str] = []
    group_open = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if group_open:
                agents = []
                group_open = False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            group_open = True
            for a in agents or ["*"]:
                rules.append(
                    {
                        "host": host,
                        "agent": a,
                        # empty value = "no restriction": a zero-length
                        # allow sentinel (ties lose to every real rule)
                        "rule": "allow" if not val else key,
                        "prefix": val,
                    }
                )
        elif key == "crawl-delay":
            # the de-facto extension (Bing/Yandex; Google ignores it):
            # seconds between fetches for this agent group. Emitted as
            # its own rule kind with the RAW value in the prefix slot
            # (one row schema for the cache); ``crawl_delays`` parses
            # and scopes it, ``robots_allowed`` ignores it. Registers
            # the group like allow/disallow — a group that only sets a
            # delay still shadows ``*`` for delay purposes.
            group_open = True
            for a in agents or ["*"]:
                rules.append(
                    {"host": host, "agent": a, "rule": "crawl-delay", "prefix": val}
                )
    return rules


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) -> exploded rule rows (host, agent, rule, prefix);
    Arrow-batched, map-only."""
    import pandas as pd

    def op(batches):
        for pdf in batches:
            out = []
            for h, b in zip(pdf[host_col], pdf[body_col]):
                out.extend(parse_robots_body(b or "", str(h)))
            if out:
                yield pd.DataFrame(out)

    return robots.mapInPandas(
        op, "host string, agent string, rule string, prefix string"
    )


def url_host_path(url: F.Column) -> tuple[F.Column, F.Column]:
    """(host, path) of a URL column — host lowercased and port-stripped
    (robots scope ignores the port), path defaulting to '/'."""
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _SPLIT_RE, 2)), r":\d+$", ""
    )
    rest = F.regexp_replace(F.regexp_extract(url, _SPLIT_RE, 3), r"\?.*$", "")
    path = F.when(rest == "", F.lit("/")).otherwise(rest)
    return host, path


def _select_agent_group(rules: DataFrame, agent_lc: str) -> DataFrame:
    """REP group selection shared by ``robots_allowed``/``crawl_delays``:
    when a host has a group for the specific agent that group applies
    ALONE (the ``*`` group is shadowed entirely, not merged); ``*``
    applies only on hosts with no specific group. One windowed pass
    over the candidate rule rows — the prior distinct + left_anti
    self-join paid two aggregations and a sort-merge join on the same
    host key for the same answer (round 10; a per-host window is
    bounded because robots files are parser-bounded, so no skew
    hazard). Row set identical to the union-of-filters form."""
    from pyspark.sql import Window

    cand = rules.filter(F.col("agent").isin(agent_lc, "*"))
    has_spec = F.max((F.col("agent") == agent_lc).cast("int")).over(
        Window.partitionBy("host")
    )
    return (
        cand.withColumn("_hs", has_spec)
        .filter((F.col("agent") == agent_lc) | (F.col("_hs") == 0))
        .drop("_hs")
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Longest-match robots verdict per DISTINCT url: returns
    ``(url, host, path, allowed)`` with allowed in {0, 1}. Precedence
    is encoded in one ``max(struct(prefix_len, is_allow))`` — longest
    prefix wins, allow wins a length tie, no matching rule (or no
    rules for the host at all) means allowed. GROUP SELECTION follows
    the spec: when a host has a group for the specific agent, that
    group applies ALONE (the ``*`` group is shadowed entirely, not
    merged); ``*`` applies only on hosts with no specific group."""
    host, path = url_host_path(F.col(url_col))
    u = urls.select(F.col(url_col).alias("url")).distinct().select(
        "url", host.alias("host"), path.alias("path")
    )
    a = agent.lower()
    # group selection uses EVERY rule kind (a group that only sets
    # Crawl-delay still shadows *); only allow/disallow rows score
    r = (
        _select_agent_group(rules, a)
        .filter(F.col("rule").isin("allow", "disallow"))
        .select(
            "host",
            "prefix",
            (F.col("rule") == "allow").cast("int").alias("is_allow"),
        )
    )
    j = u.join(r, "host", "left").withColumn(
        "_hit",
        F.when(
            F.col("prefix").isNotNull()
            & F.col("path").startswith(F.col("prefix")),
            F.struct(
                F.length("prefix").alias("l"), F.col("is_allow").alias("a")
            ),
        ),
    )
    best = j.groupBy("url", "host", "path").agg(F.max("_hit").alias("_best"))
    return best.select(
        "url",
        "host",
        "path",
        F.coalesce(F.col("_best.a"), F.lit(1)).cast("int").alias("allowed"),
    )


def crawl_delays(
    rules: DataFrame, agent: str = "*"
) -> DataFrame:
    """Per-host ``Crawl-delay`` directives from parsed rule rows:
    returns ``(host, crawl_delay_ms)`` for every host that DECLARES a
    delay for the selected agent group (hosts without one are simply
    absent — the caller's global delay applies). Group selection
    matches ``robots_allowed``: a host with any rule rows for the
    specific agent shadows its ``*`` group entirely. Values are
    seconds (integers or decimals, per the de-facto grammar); when a
    group states several, the MOST CONSERVATIVE (largest) wins.
    Malformed values are dropped — an unparsable directive must not
    zero out the host's politeness."""
    a = agent.lower()
    return (
        _select_agent_group(rules, a)
        .filter(
            (F.col("rule") == "crawl-delay")
            & F.col("prefix").rlike(r"^\d+(\.\d+)?$")
        )
        .groupBy("host")
        .agg(
            F.ceil(F.max(F.col("prefix").cast("double")) * 1000)
            .cast("long")
            .alias("crawl_delay_ms")
        )
    )


def crawl_schedule(
    urls: DataFrame,
    crawl_delay_ms: int = 1000,
    max_per_host: int | None = None,
    url_col: str = "url",
    host_delays: DataFrame | None = None,
) -> DataFrame:
    """Per-host politeness plan: rank each host's urls (deterministic:
    url order), optionally cap the frontier per host, and assign the
    earliest polite fetch offset ``fetch_seq * crawl_delay_ms``.

    NO ``Window.partitionBy(host)``: host frequency in a real frontier
    is zipfian, and a per-host window funnels a mega-host's entire URL
    set through one task's sort. The rank is
    ``analytics.grouped_prefix_sum`` over (host, url) — a range
    partition, so one huge host still spreads across many tasks and
    driver state stays O(partitions + hosts); the cap then filters on
    the closed-form rank. ``max_per_host=None`` (the default) is an
    explicitly UNCAPPED plan: every frontier URL of every host gets a
    slot — fine now that ranking itself is spread, but pass a cap if
    downstream fetch capacity is the constraint.

    ``host_delays`` — an optional ``(host, crawl_delay_ms)`` frame
    (``crawl_delays`` over parsed robots rules) — overrides the global
    ``crawl_delay_ms`` per host: a host that DECLARES its politeness
    budget gets exactly that spacing, everyone else the global
    default. Plain left join, never broadcast (hosts are millions on a
    real frontier; AQE picks the strategy per actual size). Returns
    ``(url, host, fetch_seq, fetch_offset_ms)``."""
    from sstable_migrator_spark.operators.analytics import grouped_prefix_sum

    host, _path = url_host_path(F.col(url_col))
    u = (
        urls.select(F.col(url_col).alias("url"))
        .distinct()
        .select("url", host.alias("host"), F.lit(1).cast("long").alias("_one"))
    )
    ranked, _totals = grouped_prefix_sum(
        u, ["host"], ["url"], "_one", out_col="_rk"
    )
    ranked = ranked.withColumn("fetch_seq", (F.col("_rk") - 1).cast("long")).drop(
        "_one", "_rk"
    )
    if max_per_host is not None:
        ranked = ranked.filter(F.col("fetch_seq") < max_per_host)
    delay = F.lit(int(crawl_delay_ms)).cast("long")
    if host_delays is not None:
        ranked = ranked.join(
            host_delays.select(
                "host", F.col("crawl_delay_ms").alias("_host_delay")
            ),
            "host",
            "left",
        )
        delay = F.coalesce(F.col("_host_delay"), delay)
    return ranked.withColumn(
        "fetch_offset_ms", (F.col("fetch_seq") * delay).cast("long")
    ).select("url", "host", "fetch_seq", "fetch_offset_ms")


# sitemaps.org protocol (public spec): a flat, fixed element set —
# <urlset><url><loc/lastmod/changefreq/priority></url></urlset> for
# page lists, <sitemapindex><sitemap><loc/lastmod></sitemap></...> for
# index files pointing at child sitemaps. Regex tag extraction is the
# right dependency-free tool for that grammar (no nesting, no
# attributes that matter); gzip transport (.xml.gz) is the FETCH
# layer's job (sources/readers handles gzip bodies), the parser sees
# text.
_SM_URL_BLOCK = re.compile(r"<url\s*>(.*?)</url\s*>", re.S)
_SM_IDX_BLOCK = re.compile(r"<sitemap\s*>(.*?)</sitemap\s*>", re.S)
_SM_FIELDS = {
    k: re.compile(rf"<{k}\s*>\s*(.*?)\s*</{k}\s*>", re.S)
    for k in ("loc", "lastmod", "changefreq", "priority")
}
_XML_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&apos;", "'"), ("&amp;", "&"),  # &amp; LAST: double-escapes stay
]


def _xml_unescape(s: str) -> str:
    for ent, ch in _XML_ENTITIES:
        s = s.replace(ent, ch)
    return s


def parse_sitemap_body(body: str, sitemap_url: str = "") -> list[dict]:
    """Sitemap XML text -> entry rows ``{sitemap_url, loc, lastmod,
    changefreq, priority, is_index}``. ``<urlset>`` page entries carry
    ``is_index=0`` and the four per-URL fields (priority parsed to
    float, None when absent/malformed — never a silent default);
    ``<sitemapindex>`` child-sitemap entries carry ``is_index=1``.
    ``loc`` is XML-entity-decoded (query URLs are `&amp;`-escaped per
    the spec); entries without a ``loc`` are protocol violations and
    drop. Both block kinds are extracted so a mixed/malformed file
    degrades to whatever well-formed entries it contains."""
    out: list[dict] = []
    for is_index, block_re in ((0, _SM_URL_BLOCK), (1, _SM_IDX_BLOCK)):
        for block in block_re.findall(body or ""):
            m = _SM_FIELDS["loc"].search(block)
            if not m or not m.group(1):
                continue
            row = {
                "sitemap_url": sitemap_url,
                "loc": _xml_unescape(m.group(1)),
                "lastmod": None,
                "changefreq": None,
                "priority": None,
                "is_index": is_index,
            }
            for k in ("lastmod", "changefreq"):
                fm = _SM_FIELDS[k].search(block)
                if fm and fm.group(1):
                    row[k] = fm.group(1)
            pm = _SM_FIELDS["priority"].search(block)
            if pm:
                try:
                    row["priority"] = float(pm.group(1))
                except ValueError:
                    pass
            out.append(row)
    return out


def parse_sitemaps(
    sitemaps: DataFrame, url_col: str = "sitemap_url", body_col: str = "body"
) -> DataFrame:
    """(sitemap_url, body) -> exploded sitemap entry rows; Arrow-
    batched, map-only (the parse_robots shape — bodies are per-host
    and bounded by the spec at 50k entries / 50 MB, so one body is
    one kernel call and the billions-of-URLs scale lives in the
    DataFrame downstream: dedup against the seen-set, robots gate,
    politeness schedule)."""
    import pandas as pd

    schema = (
        "sitemap_url string, loc string, lastmod string, "
        "changefreq string, priority double, is_index int"
    )

    def op(batches):
        for pdf in batches:
            out = []
            for u, b in zip(pdf[url_col], pdf[body_col]):
                out.extend(parse_sitemap_body(b or "", str(u)))
            if out:
                yield pd.DataFrame(out)

    return sitemaps.mapInPandas(op, schema)


def crawl_eta_report(
    urls: DataFrame,
    n_slots: int,
    crawl_delay_ms: int = 1000,
    url_col: str = "url",
    host_delays: DataFrame | None = None,
) -> DataFrame:
    """Capacity planner over a frontier — "how long will this crawl
    take, and which hosts dominate the tail": the question a crawl
    operator answers BEFORE spending fetch slots, from the same inputs
    ``crawl_schedule`` plans with (global politeness delay, per-host
    robots ``Crawl-delay`` overrides).

    Per host: ``n_urls`` and ``busy_ms = n_urls * delay`` — the wall
    time a fetch slot is pinned to that host under the one-task-owns-
    a-host execution model (``_fetch_pending_plan``). Every row also
    carries the fleet summary via a single-row broadcast cross (the
    scalar-cross discipline): ``total_urls``, ``lb_critical_ms``
    (slowest single host — no slot count fixes a serial host: the
    politeness chain IS the critical path), ``lb_work_ms``
    (``ceil(total busy / n_slots)`` by integral arithmetic — the
    work-conservation bound), and ``eta_lb_ms = greatest(both)`` — a
    LOWER bound by construction (host-to-slot packing can only add);
    ``is_critical`` flags the host(s) on the critical path. Plan: one
    keyed rollup to |hosts| rows, an optional bounded delay join, one
    single-row cross. All integers."""
    if int(n_slots) < 1:
        raise ValueError(f"n_slots must be >= 1, got {n_slots}")
    host, _path = url_host_path(F.col(url_col))
    per_host = (
        urls.select(F.col(url_col).alias("url"))
        .distinct()
        .select(host.alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    )
    delay = F.lit(int(crawl_delay_ms)).cast("long")
    if host_delays is not None:
        per_host = per_host.join(
            host_delays.select(
                "host", F.col("crawl_delay_ms").alias("_host_delay")
            ),
            "host",
            "left",
        )
        delay = F.coalesce(F.col("_host_delay"), delay)
    per_host = per_host.select(
        "host",
        "n_urls",
        (F.col("n_urls") * delay).cast("long").alias("busy_ms"),
    )
    totals = per_host.agg(
        F.sum("n_urls").cast("long").alias("total_urls"),
        F.max("busy_ms").cast("long").alias("lb_critical_ms"),
        F.sum("busy_ms").cast("long").alias("_work_ms"),
    )
    s = int(n_slots)
    return per_host.crossJoin(F.broadcast(totals)).selectExpr(
        "host",
        "n_urls",
        "busy_ms",
        "total_urls",
        "lb_critical_ms",
        f"CAST((_work_ms + {s} - 1) div {s} AS BIGINT) AS lb_work_ms",
        f"CAST(greatest(lb_critical_ms, (_work_ms + {s} - 1) div {s}) "
        "AS BIGINT) AS eta_lb_ms",
        "CAST(busy_ms = lb_critical_ms AS INT) AS is_critical",
    )
