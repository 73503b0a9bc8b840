"""Streaming URL frontier — crawl planning as MAINTAINED STATE.

The batch crawl arc (canonical_url -> robots_allowed -> crawl_schedule)
is stateless per call; a real crawler's frontier is incremental, like
the dedup state and the BM25 postings already are: URLs discovered
today must be judged against everything ever offered, WITHOUT
rescanning frontier history. This gate applies the reference's 25-day
domain-dedup discipline (J4/T2, daily_certstream_download.sh:75-93) to
URLs, under the same availableNow/foreachBatch ledger pattern as
streaming/corpus_ingest:

THE SEEN-SET (``<frontier>/_seen``): one parquet row per judged
canonical URL key — never the raw text stream. Each drain
canonicalizes its batch (``functions.urls.canonical_url``, so cosmetic
variants of one page collapse before any fetch), anti-joins the
seen-set, and appends the new keys. Drain cost is O(day's URLs) + one
key-only anti-join; re-offering yesterday's URLs schedules nothing and
reads no history text.

THE ROBOTS CACHE (``<frontier>/_robots``): parsed rule rows stamped
``fetched_at`` (ms). Drains pass freshly fetched rules in; the gate
appends them and judges against the LATEST fetch per host within
``robots_ttl_ms`` — an expired host's rules are ignored (REP default:
no known rules means allowed; the ledger's ``robots_fresh`` flag makes
stale-gated admissions attributable so a re-fetch can be driven off
it).

SEEN SEMANTICS: every judged-new canonical key enters the seen-set,
including robots-DISALLOWED ones — the frontier's job is "never judge
the same URL twice", mirroring the domain window. The seen-set is
DAY-PARTITIONED (``day=<epoch-day>/``), so retention is a directory
delete: expire a day and its URLs become judgeable again — the same
operational lever as the 25-day window's retention (a robots change
re-admits URLs once their seen entries age out).

THE LEDGER (``<frontier>/_ledger``): per-URL decisions append
executor-side as JSON, batch-stamped; the fetch plans land under
``<frontier>/plans`` (url, host, fetch_seq, fetch_offset_ms, batch) —
polite per-host slots via the grouped-prefix-sum rank (never a
per-host window). The ledger commits LAST, so a ledger row implies
every store write for that drain completed. Only 3 scalar counts ever
reach the driver.

HOST CURSORS (``<frontier>/_host_cursors``): politeness is CROSS-
DRAIN — fetch_seq continues after every slot a host was ever
scheduled, via per-host (host, n_scheduled) delta appends summed at
read (O(drains x hosts) rows; joined plainly, never broadcast — a
real frontier has millions of hosts). Without it, two quick drains
would both start a host at slot 0.

RETENTION: ``expire_frontier_days`` deletes ``_seen`` day partitions
older than the window — the expired URLs become judgeable again.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["expire_frontier_days", "schedule_frontier_available_now"]


def _has_parquet(path: str) -> bool:
    # walk: the seen-set is day-partitioned, so its files live under
    # day=<n>/ subdirectories
    if not os.path.isdir(path):
        return False
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def expire_frontier_days(
    frontier_path: str, keep_days: int, now_ms: int | None = None
) -> list[int]:
    """The retention lever the seen-set's day partitioning exists for:
    delete every ``_seen/day=<d>/`` older than ``keep_days`` — the
    expired days' URLs become judgeable (and thus refreshable) again,
    exactly the reference's 25-day-window expiry applied to URLs. A
    directory delete, no Spark job. Returns the expired day numbers."""
    import shutil
    import time as _time

    if keep_days < 1:
        raise ValueError(f"keep_days must be >= 1, got {keep_days}")
    now = int(_time.time() * 1000) if now_ms is None else int(now_ms)
    cutoff = now // 86_400_000 - keep_days
    seen = os.path.join(frontier_path, "_seen")
    expired: list[int] = []
    if not os.path.isdir(seen):
        return expired
    for entry in sorted(os.listdir(seen)):
        if not entry.startswith("day="):
            continue
        try:
            day = int(entry.split("=", 1)[1])
        except ValueError:
            continue
        if day < cutoff:
            shutil.rmtree(os.path.join(seen, entry))
            expired.append(day)
    return expired


def schedule_frontier_available_now(
    spark: SparkSession,
    in_path: str,
    frontier_path: str,
    checkpoint: str,
    robots_rules: DataFrame | None = None,
    agent: str = "*",
    crawl_delay_ms: int = 1000,
    max_per_host: int | None = None,
    robots_ttl_ms: int = 86_400_000,
    now_ms: int | None = None,
    schema: str = "url string",
) -> dict:
    """One frontier drain: judge every newly discovered URL (JSONL
    ``{url}`` files under ``in_path``) against the persisted seen-set,
    gate the new ones through the robots cache, write their polite
    fetch plan, extend the state, and ledger every decision. Pass
    ``robots_rules`` — parsed rule rows (host, agent, rule, prefix)
    with or without a ``fetched_at`` column (stamped with ``now_ms``
    when absent) — to refresh the cache this drain. Returns
    ``{offered, new, scheduled}``."""
    seen_path = os.path.join(frontier_path, "_seen")
    robots_path = os.path.join(frontier_path, "_robots")
    ledger_path = os.path.join(frontier_path, "_ledger")
    plans_path = os.path.join(frontier_path, "plans")
    cursors_path = os.path.join(frontier_path, "_host_cursors")
    now = int(time.time() * 1000) if now_ms is None else int(now_ms)

    from sstable_migrator_spark.functions.urls import canonical_url
    from sstable_migrator_spark.operators.crawl import (
        crawl_schedule,
        robots_allowed,
    )

    # refresh the robots cache ONCE per drain, driver-side, before the
    # stream starts (rules are per-host and tiny; the cache append must
    # not repeat per micro-batch)
    if robots_rules is not None:
        rules = robots_rules
        if "fetched_at" not in rules.columns:
            rules = rules.withColumn("fetched_at", F.lit(now).cast("long"))
        rules.select(
            "host", "agent", "rule", "prefix", F.col("fetched_at").cast("long")
        ).write.mode("append").parquet(robots_path)

    stream = spark.readStream.schema(schema).json(in_path)
    stats = {"offered": 0, "new": 0, "scheduled": 0}

    def _gate(batch_df, bid: int) -> None:
        batch_df = batch_df.localCheckpoint()
        if batch_df.isEmpty():
            return
        cand = (
            batch_df.select(
                F.col("url"), canonical_url(F.col("url")).alias("canonical")
            )
            .groupBy("canonical")
            # deterministic representative: dropDuplicates keeps an
            # arbitrary partition's row; min(url) is a pure function of
            # the batch, so plans and ledgers replay identically
            .agg(F.min("url").alias("url"))
            .localCheckpoint()
        )
        if _has_parquet(seen_path):
            new = cand.join(
                spark.read.parquet(seen_path), "canonical", "left_anti"
            ).localCheckpoint()
        else:
            new = cand
        if _has_parquet(robots_path):
            fresh = (
                spark.read.parquet(robots_path)
                .filter(F.col("fetched_at") > now - robots_ttl_ms)
            )
            # latest fetch per host wins: keep rows of the max
            # fetched_at per host. Plain joins, NOT broadcast — the
            # per-host relations are O(hosts), millions on a real
            # frontier; AQE picks the strategy per actual size
            latest = fresh.groupBy("host").agg(
                F.max("fetched_at").alias("fetched_at")
            )
            rules_now = fresh.join(latest, ["host", "fetched_at"])
            # robots_fresh is PER URL: 1 when its host has in-TTL rules,
            # 0 when the verdict fell through to the REP default
            # (unknown host or expired cache -> allowed, attributably)
            verdicts = (
                robots_allowed(new.select("url"), rules_now, agent=agent)
                .join(
                    latest.select("host").withColumn("_rf", F.lit(1)),
                    "host",
                    "left",
                )
                .select(
                    "url",
                    "allowed",
                    F.coalesce("_rf", F.lit(0)).cast("int").alias("robots_fresh"),
                )
            )
        else:
            verdicts = new.select(
                "url",
                F.lit(1).alias("allowed"),
                F.lit(0).cast("int").alias("robots_fresh"),
            )
        gated = new.join(verdicts, "url").localCheckpoint()
        plan = crawl_schedule(
            gated.filter(F.col("allowed") == 1).select("url"),
            crawl_delay_ms=crawl_delay_ms,
            max_per_host=max_per_host,
        )
        # CROSS-DRAIN politeness: fetch_seq continues after every slot
        # this host was EVER scheduled (per-host cursors persisted as
        # (host, delta) appends — O(drains x hosts) rows, summed per
        # read; without this, two quick drains would both start at
        # slot 0 and hammer the host)
        if _has_parquet(cursors_path):
            prior = (
                spark.read.parquet(cursors_path)
                .groupBy("host")
                .agg(F.sum("n_scheduled").alias("_prior"))
            )
            # plain join, NOT broadcast: a real frontier has millions
            # of hosts — let AQE pick the strategy per actual size
            plan = (
                plan.join(prior, "host", "left")
                .withColumn(
                    "fetch_seq",
                    (F.col("fetch_seq") + F.coalesce("_prior", F.lit(0))).cast(
                        "long"
                    ),
                )
                .withColumn(
                    "fetch_offset_ms",
                    (F.col("fetch_seq") * F.lit(int(crawl_delay_ms))).cast(
                        "long"
                    ),
                )
                .drop("_prior")
            )
        plan = plan.localCheckpoint()
        plan.withColumn("batch", F.lit(bid)).write.mode("append").parquet(
            plans_path
        )
        plan.groupBy("host").agg(
            F.count(F.lit(1)).cast("long").alias("n_scheduled")
        ).write.mode("append").parquet(cursors_path)
        # day-partitioned so retention is a directory delete — the
        # operational lever the reference's 25-day window uses (expire
        # old days and their URLs become judgeable again)
        new.select(
            "canonical", F.lit(now // 86_400_000).cast("long").alias("day")
        ).write.mode("append").partitionBy("day").parquet(seen_path)
        decisions = (
            cand.join(
                gated.select("canonical", "allowed", "robots_fresh").withColumn(
                    "_new", F.lit(1)
                ),
                "canonical",
                "left",
            )
            .join(
                plan.select("url").withColumn("_sched", F.lit(1)), "url", "left"
            )
            .select(
                "url",
                "canonical",
                F.coalesce("_new", F.lit(0)).cast("int").alias("new_url"),
                F.coalesce("allowed", F.lit(0)).cast("int").alias("allowed"),
                F.coalesce("_sched", F.lit(0)).cast("int").alias("scheduled"),
                F.coalesce("robots_fresh", F.lit(0)).cast("int").alias(
                    "robots_fresh"
                ),
                F.lit(bid).alias("batch"),
            )
            .localCheckpoint()
        )
        # ledger commits LAST (the drain's completion record)
        decisions.write.mode("append").json(ledger_path)
        o, n, s = decisions.agg(
            F.count(F.lit(1)), F.sum("new_url"), F.sum("scheduled")
        ).first()
        stats["offered"] += int(o)
        stats["new"] += int(n or 0)
        stats["scheduled"] += int(s or 0)

    q = (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
