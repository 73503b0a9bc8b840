"""Crawl planning (operators/crawl.py): robots grammar, group
selection, longest-match precedence, politeness scheduling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sstable_migrator_spark.operators.crawl import (
    crawl_schedule,
    parse_robots,
    parse_robots_body,
    robots_allowed,
)

ROBOTS = """\
# global rules
User-agent: *
Disallow: /private/
Allow: /private/press/
Disallow: /tmp

User-agent: trainbot
User-agent: otherbot
Disallow: /no-train/
Disallow:

User-agent: greedybot
Disallow: /
"""


def test_parse_robots_body_grammar():
    rules = parse_robots_body(ROBOTS, "example.com")
    tup = {(r["agent"], r["rule"], r["prefix"]) for r in rules}
    assert ("*", "disallow", "/private/") in tup
    assert ("*", "allow", "/private/press/") in tup
    assert ("*", "disallow", "/tmp") in tup
    # stacked user-agent lines share one group; empty Disallow emits a
    # zero-length ALLOW sentinel (registers the group, changes no verdict)
    assert ("trainbot", "disallow", "/no-train/") in tup
    assert ("otherbot", "disallow", "/no-train/") in tup
    assert ("trainbot", "allow", "") in tup
    assert ("otherbot", "allow", "") in tup
    assert not any(r["prefix"] == "" and r["rule"] == "disallow" for r in rules)
    assert ("greedybot", "disallow", "/") in tup
    # directives before any user-agent default to *
    assert parse_robots_body("Disallow: /x")[0]["agent"] == "*"
    assert parse_robots_body("") == []


def test_robots_allowed_precedence(spark):
    rules = parse_robots(
        spark.createDataFrame([("example.com", ROBOTS)], "host string, body string")
    )
    urls = spark.createDataFrame(
        [(u,) for u in [
            "http://example.com/public/page",        # no rule -> allowed
            "http://EXAMPLE.com:80/private/doc",     # disallow /private/
            "http://example.com/private/press/x",    # longest match: allow
            "http://example.com/tmpfile",            # prefix /tmp matches
            "http://other.com/private/doc",          # host without rules
        ]],
        "url string",
    )
    got = {r["url"]: r["allowed"]
           for r in robots_allowed(urls, rules, agent="*").collect()}
    assert got["http://example.com/public/page"] == 1
    assert got["http://EXAMPLE.com:80/private/doc"] == 0
    assert got["http://example.com/private/press/x"] == 1
    assert got["http://example.com/tmpfile"] == 0
    assert got["http://other.com/private/doc"] == 1

    # group selection: trainbot's group SHADOWS * entirely — /private/
    # is allowed for trainbot (its group has no such rule)
    got_tb = {r["url"]: r["allowed"]
              for r in robots_allowed(urls, rules, agent="trainbot").collect()}
    assert got_tb["http://EXAMPLE.com:80/private/doc"] == 1
    tb_urls = spark.createDataFrame(
        [("http://example.com/no-train/set",)], "url string"
    )
    assert robots_allowed(tb_urls, rules, agent="trainbot").first()["allowed"] == 0
    # greedybot: everything disallowed
    assert all(
        r["allowed"] == 0
        for r in robots_allowed(
            urls.filter(F.col("url").contains("example.com")), rules,
            agent="greedybot",
        ).collect()
    )


def test_empty_disallow_group_still_shadows_star(spark):
    """A specific-agent group containing ONLY "Disallow:" (allow
    everything for that agent) must still SHADOW the * group — the
    REP group-selection bug the zero-length sentinel row exists to
    prevent: without it the host looks like it has no specific group
    and the * rules wrongly apply."""
    body = "User-agent: *\nDisallow: /\n\nUser-agent: mybot\nDisallow:\n"
    rules = parse_robots(
        spark.createDataFrame([("example.com", body)], "host string, body string")
    )
    urls = spark.createDataFrame(
        [("http://example.com/anything/at/all",)], "url string"
    )
    # mybot's group is empty-Disallow -> everything allowed for mybot
    assert robots_allowed(urls, rules, agent="mybot").first()["allowed"] == 1
    # the * group still blocks everyone else
    assert robots_allowed(urls, rules, agent="elsebot").first()["allowed"] == 0


def test_crawl_schedule_no_per_host_window(spark):
    """The politeness rank must come from the grouped prefix sum, not
    Window.partitionBy(host) — a zipfian mega-host would funnel its
    whole frontier through one task's sort. Any window in the plan must
    be keyed by the range-partition id (the bounded in-partition sum),
    never by host alone."""
    import re

    urls = spark.createDataFrame(
        [(f"http://h{i % 3}.com/p{i}",) for i in range(12)], "url string"
    )
    plan = (
        crawl_schedule(urls)._jdf.queryExecution().executedPlan().toString()
    )
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        spec = m.group(1)
        assert "_pid" in spec, plan


def test_crawl_schedule_politeness(spark):
    urls = spark.createDataFrame(
        [(f"http://h{i % 3}.com/p{i}",) for i in range(12)], "url string"
    )
    plan = crawl_schedule(urls, crawl_delay_ms=500, max_per_host=3).collect()
    by_host: dict = {}
    for r in plan:
        by_host.setdefault(r["host"], []).append(r)
    assert set(by_host) == {"h0.com", "h1.com", "h2.com"}
    for host, rows in by_host.items():
        seqs = sorted(r["fetch_seq"] for r in rows)
        assert seqs == [0, 1, 2]  # capped at 3
        for r in rows:
            assert r["fetch_offset_ms"] == r["fetch_seq"] * 500
    # deterministic under partitioning
    again = sorted(
        tuple(r)
        for r in crawl_schedule(
            urls.repartition(7), crawl_delay_ms=500, max_per_host=3
        ).collect()
    )
    assert again == sorted(tuple(r) for r in plan)


CRAWL_DELAY_ROBOTS = """\
User-agent: *
Crawl-delay: 2
Disallow: /private/

User-agent: trainbot
Crawl-delay: 0.5

User-agent: rudebot
Crawl-delay: banana
"""


def test_parse_crawl_delay_directive():
    """Crawl-delay rows parse into the one rule-row schema (raw value
    in the prefix slot), register their group, and never leak into
    allow/disallow verdicts."""
    rules = parse_robots_body(CRAWL_DELAY_ROBOTS, "example.com")
    tup = {(r["agent"], r["rule"], r["prefix"]) for r in rules}
    assert ("*", "crawl-delay", "2") in tup
    assert ("trainbot", "crawl-delay", "0.5") in tup
    # malformed values are still parsed rows; crawl_delays drops them
    assert ("rudebot", "crawl-delay", "banana") in tup
    assert ("*", "disallow", "/private/") in tup
    # a group that only sets a delay is still a GROUP (shadows *)
    assert [r for r in rules if r["agent"] == "trainbot"] != []


def test_crawl_delays_selection_and_units(spark):
    """crawl_delays: seconds (int or decimal) -> ms; the specific
    agent's group shadows * entirely; several declared values take the
    most conservative; malformed values drop; undeclared hosts are
    absent (global default applies downstream)."""
    from sstable_migrator_spark.operators.crawl import crawl_delays

    rows = parse_robots_body(CRAWL_DELAY_ROBOTS, "example.com")
    rows += parse_robots_body(
        "User-agent: *\nCrawl-delay: 1\nCrawl-delay: 3\n", "slow.com"
    )
    rows += parse_robots_body("User-agent: *\nDisallow: /x\n", "plain.com")
    rules = spark.createDataFrame(
        [(r["host"], r["agent"], r["rule"], r["prefix"]) for r in rows],
        "host string, agent string, rule string, prefix string",
    )
    star = {r["host"]: r["crawl_delay_ms"] for r in crawl_delays(rules).collect()}
    assert star == {"example.com": 2000, "slow.com": 3000}
    spec = {
        r["host"]: r["crawl_delay_ms"]
        for r in crawl_delays(rules, agent="trainbot").collect()
    }
    assert spec["example.com"] == 500  # 0.5 s, specific group shadows *
    assert spec.get("slow.com") == 3000  # no trainbot group -> * applies
    # rudebot's only directive is malformed -> no row, NOT zero
    assert crawl_delays(rules, agent="rudebot").filter(
        F.col("host") == "example.com"
    ).count() == 0

    # and the verdict gate is unchanged by delay rows
    urls = spark.createDataFrame(
        [("http://example.com/private/x",), ("http://example.com/ok",)],
        "url string",
    )
    got = {r["url"]: r["allowed"] for r in robots_allowed(urls, rules).collect()}
    assert got == {
        "http://example.com/private/x": 0,
        "http://example.com/ok": 1,
    }


def test_crawl_schedule_host_delay_override(spark):
    """crawl_schedule(host_delays=): declared hosts space by their own
    delay, everyone else by the global default; schema unchanged."""
    from sstable_migrator_spark.operators.crawl import crawl_delays

    urls = spark.createDataFrame(
        [(f"http://slow.com/p{i}",) for i in range(3)]
        + [(f"http://fast.com/p{i}",) for i in range(3)],
        "url string",
    )
    delays = spark.createDataFrame(
        [("slow.com", 5000)], "host string, crawl_delay_ms long"
    )
    plan = crawl_schedule(urls, crawl_delay_ms=1000, host_delays=delays)
    assert plan.columns == ["url", "host", "fetch_seq", "fetch_offset_ms"]
    rows = {(r["host"], r["fetch_seq"]): r["fetch_offset_ms"] for r in plan.collect()}
    assert rows[("slow.com", 2)] == 10_000
    assert rows[("fast.com", 2)] == 2_000


SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://example.com/public/a?p=1&amp;q=2</loc>
    <lastmod>2024-03-04</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://example.com/private/doc</loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://example.com/b</loc><priority>broken</priority></url>
</urlset>"""

SITEMAP_INDEX = """<sitemapindex>
  <sitemap><loc>https://example.com/s1.xml.gz</loc>
           <lastmod>2024-02-03</lastmod></sitemap>
  <sitemap><loc>https://example.com/s2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_body_grammar():
    from sstable_migrator_spark.operators.crawl import parse_sitemap_body

    rows = parse_sitemap_body(SITEMAP, "https://example.com/sitemap.xml")
    assert len(rows) == 3  # the loc-less entry drops (protocol violation)
    assert rows[0]["loc"] == "https://example.com/public/a?p=1&q=2"  # decoded
    assert rows[0]["lastmod"] == "2024-03-04"
    assert rows[0]["changefreq"] == "daily"
    assert rows[0]["priority"] == 0.8
    assert rows[1] == {
        "sitemap_url": "https://example.com/sitemap.xml",
        "loc": "https://example.com/private/doc",
        "lastmod": None, "changefreq": None, "priority": None, "is_index": 0,
    }
    assert rows[2]["priority"] is None  # malformed float -> None, not 0

    idx = parse_sitemap_body(SITEMAP_INDEX, "root")
    assert [r["loc"] for r in idx] == [
        "https://example.com/s1.xml.gz", "https://example.com/s2.xml",
    ]
    assert all(r["is_index"] == 1 for r in idx)
    assert idx[0]["lastmod"] == "2024-02-03" and idx[1]["lastmod"] is None

    assert parse_sitemap_body("", "x") == []
    assert parse_sitemap_body("<html>not a sitemap</html>", "x") == []


def test_sitemap_to_fetch_plan_composition(spark):
    """The acquisition chain: sitemap XML -> parse_sitemaps ->
    robots_allowed gate -> crawl_schedule politeness slots. The
    disallowed URL never reaches the plan; the rest slot per host."""
    from sstable_migrator_spark.operators.crawl import (
        crawl_schedule,
        parse_sitemaps,
    )

    sm = spark.createDataFrame(
        [("https://example.com/sitemap.xml", SITEMAP)],
        "sitemap_url string, body string",
    )
    entries = parse_sitemaps(sm)
    assert entries.count() == 3

    rules = parse_robots(
        spark.createDataFrame(
            [("example.com", ROBOTS)], "host string, body string"
        )
    )
    candidates = entries.filter("is_index = 0").select(
        F.col("loc").alias("url")
    )
    allowed = robots_allowed(candidates, rules, agent="*").filter(
        "allowed = 1"
    )
    got = sorted(r["url"] for r in allowed.collect())
    assert got == [
        "https://example.com/b",
        "https://example.com/public/a?p=1&q=2",
    ]  # /private/doc gated out by robots

    plan = crawl_schedule(allowed.select("url"), crawl_delay_ms=500).collect()
    assert len(plan) == 2
    assert sorted(r["fetch_offset_ms"] for r in plan) == [0, 500]


# --- capacity planner -------------------------------------------------------


def test_crawl_eta_report_hand_computed(spark):
    """host a: 3 urls x 1000 ms = 3000 busy; host b: 1 url with a
    declared 5000 ms delay = 5000 busy. Two slots: critical path 5000
    beats work bound ceil(8000/2) = 4000, so b is the ETA and flags
    critical."""
    from sstable_migrator_spark.operators.crawl import crawl_eta_report

    urls = spark.createDataFrame(
        [("https://a.com/1",), ("https://a.com/2",), ("https://a.com/3",),
         ("https://b.com/1",), ("https://a.com/1",)],  # dup collapses
        "url string",
    )
    delays = spark.createDataFrame(
        [("b.com", 5000)], "host string, crawl_delay_ms long"
    )
    rows = {r["host"]: r for r in crawl_eta_report(
        urls, n_slots=2, crawl_delay_ms=1000, host_delays=delays).collect()}
    assert rows["a.com"]["n_urls"] == 3 and rows["a.com"]["busy_ms"] == 3000
    assert rows["b.com"]["busy_ms"] == 5000
    assert rows["a.com"]["total_urls"] == 4
    assert rows["a.com"]["lb_critical_ms"] == 5000
    assert rows["a.com"]["lb_work_ms"] == 4000
    assert rows["a.com"]["eta_lb_ms"] == 5000
    assert rows["b.com"]["is_critical"] == 1
    assert rows["a.com"]["is_critical"] == 0


def test_crawl_eta_report_slot_guard(spark):
    import pytest

    from sstable_migrator_spark.operators.crawl import crawl_eta_report

    urls = spark.createDataFrame([("https://a.com/1",)], "url string")
    with pytest.raises(ValueError, match="n_slots"):
        crawl_eta_report(urls, n_slots=0)
