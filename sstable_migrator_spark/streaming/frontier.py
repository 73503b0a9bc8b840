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

THE LEDGER (``<frontier>/_ledger``): per-URL decisions land
executor-side as batch-partitioned JSON; the fetch plans land under
``<frontier>/plans`` (url, host, fetch_seq, fetch_offset_ms,
batch=...) — polite per-host slots via the grouped-prefix-sum rank
(never a per-host window). The ledger commits LAST, so a ledger row
implies every store write for that drain completed. Only 3 scalar
counts ever reach the driver.

HOST CURSORS (``<frontier>/_host_cursors``): politeness is CROSS-
DRAIN — fetch_seq continues after every slot a host was ever
scheduled, via per-host (host, n_scheduled) delta rows summed at
read (O(drains x hosts) rows; joined plainly, never broadcast — a
real frontier has millions of hosts). Without it, two quick drains
would both start a host at slot 0.

AT-LEAST-ONCE SAFETY: foreachBatch may RETRY a batch id (a drain that
fails mid-batch re-runs with the same ``bid`` and the same rows), so
every store write is keyed by batch and idempotent: plans, cursors,
the seen-set, and the ledger are all partitioned by ``batch`` and
written with DYNAMIC partition overwrite — a retry overwrites its own
partition instead of double-appending, and the reads that feed the
retry's recomputation SELF-EXCLUDE the current batch id, so a retry
recomputes from exactly the pre-batch state and lands byte-identical
rows. (Plain ``mode("append")`` here would duplicate plan rows and
double-count host cursors on every retried batch.)

Consequence: a frontier directory is BOUND to its streaming
checkpoint — batch ids are the idempotence keys, and they are only
unique per checkpoint. The drain verifies this (the checkpoint's
stream id is recorded at ``<frontier>/_stream_id`` and must match);
to rebuild from scratch, delete the frontier directory and the
checkpoint together.

RETENTION: ``expire_frontier_days`` deletes ``_seen`` day partitions
older than the window — the expired URLs become judgeable again.
"""

from __future__ import annotations

import json
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


def _check_stream_binding(state_path: str, checkpoint: str) -> None:
    """Batch ids are the idempotence keys and they are unique only per
    checkpoint: refuse to mix a state directory (frontier or corpus —
    streaming/corpus_ingest shares this guard) with a DIFFERENT
    checkpoint's batch numbering (e.g. a deleted-and-recreated
    checkpoint restarting at batch 0 would silently collide with — and
    under dynamic overwrite, REPLACE — the stored batch-0 partitions).
    Loud error, not silent corruption."""
    meta = os.path.join(checkpoint, "metadata")
    if not os.path.exists(meta):  # defensive: layout change upstream
        return
    with open(meta) as fh:
        sid = json.load(fh).get("id", "")
    if not sid:
        return
    marker = os.path.join(state_path, "_stream_id")
    if os.path.exists(marker):
        with open(marker) as fh:
            bound = fh.read().strip()
        if bound != sid:
            raise ValueError(
                f"state at {state_path} is bound to streaming "
                f"checkpoint id {bound}, but this drain runs under {sid}. "
                "Batch ids key this store's idempotent writes, so a new "
                "checkpoint's numbering would collide with stored batches. "
                "Delete the state directory and checkpoint together to "
                "rebuild, or restore the original checkpoint."
            )
    else:
        os.makedirs(state_path, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write(sid)


def _drain_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    bid: int,
    frontier_path: str,
    *,
    agent: str = "*",
    crawl_delay_ms: int = 1000,
    max_per_host: int | None = None,
    robots_ttl_ms: int = 86_400_000,
    now: int = 0,
) -> tuple[int, int, int]:
    """One batch's drain, IDEMPOTENT under foreachBatch's at-least-once
    retries: every store write is keyed by ``bid`` and lands via
    dynamic partition overwrite, and every state read excludes
    ``batch == bid`` (a failed attempt's partial writes), so a retry
    recomputes from the pre-batch state and overwrites its own
    partitions with identical rows. Module-level (not a closure) so
    the retry property is directly testable. Returns
    ``(offered, new, scheduled)``."""
    from sstable_migrator_spark.functions.urls import canonical_url
    from sstable_migrator_spark.operators.crawl import (
        crawl_delays,
        crawl_schedule,
        robots_allowed,
    )

    seen_path = os.path.join(frontier_path, "_seen")
    robots_path = os.path.join(frontier_path, "_robots")
    ledger_path = os.path.join(frontier_path, "_ledger")
    plans_path = os.path.join(frontier_path, "plans")
    cursors_path = os.path.join(frontier_path, "_host_cursors")

    def _overwrite_batch(df, path, partition_cols, fmt="parquet"):
        # the idempotence primitive: a retried batch replaces exactly
        # its own partition(s); an empty frame touches nothing
        w = (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
        )
        getattr(w, fmt)(path)

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
        # self-exclude this batch id: a failed attempt may have already
        # written seen rows for bid; the retry must judge against the
        # PRE-batch state to recompute (and re-land) identical rows
        new = cand.join(
            spark.read.parquet(seen_path).filter(F.col("batch") != bid),
            "canonical",
            "left_anti",
        ).localCheckpoint()
    else:
        new = cand
    host_delays = None
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
        # a host's DECLARED Crawl-delay (from the same in-TTL latest
        # rules the verdicts use) overrides the drain's global spacing;
        # hosts without one keep the default. O(hosts) rows
        host_delays = crawl_delays(rules_now, agent=agent).localCheckpoint()
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
        host_delays=host_delays,
    )
    # CROSS-DRAIN politeness: fetch_seq continues after every slot
    # this host was EVER scheduled (per-host cursors persisted as
    # (host, delta) rows — O(drains x hosts), summed per read;
    # without this, two quick drains would both start at slot 0 and
    # hammer the host). Self-exclude bid: retry must not count the
    # failed attempt's own delta
    if _has_parquet(cursors_path):
        prior = (
            spark.read.parquet(cursors_path)
            .filter(F.col("batch") != bid)
            .groupBy("host")
            .agg(F.sum("n_scheduled").alias("_prior"))
        )
        # plain join, NOT broadcast: a real frontier has millions
        # of hosts — let AQE pick the strategy per actual size
        delay = F.lit(int(crawl_delay_ms)).cast("long")
        if host_delays is not None:
            # the shifted slots must respect the same per-host declared
            # delay the original plan used
            prior = prior.join(
                host_delays.select(
                    "host", F.col("crawl_delay_ms").alias("_hd")
                ),
                "host",
                "full",
            )
            delay = F.coalesce(F.col("_hd"), delay)
        plan = (
            plan.join(prior, "host", "left")
            .withColumn(
                "fetch_seq",
                (F.col("fetch_seq") + F.coalesce("_prior", F.lit(0))).cast(
                    "long"
                ),
            )
            .withColumn("fetch_offset_ms", (F.col("fetch_seq") * delay).cast("long"))
            .drop("_prior", "_hd")
        )
    plan = plan.localCheckpoint()
    _overwrite_batch(
        plan.withColumn("batch", F.lit(bid)), plans_path, ["batch"]
    )
    _overwrite_batch(
        plan.groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_scheduled"))
        .withColumn("batch", F.lit(bid)),
        cursors_path,
        ["batch"],
    )
    # day-partitioned so retention is a directory delete — the
    # operational lever the reference's 25-day window uses (expire
    # old days and their URLs become judgeable again); batch-keyed
    # inside the day so a retry overwrites instead of duplicating
    _overwrite_batch(
        new.select(
            "canonical",
            F.lit(now // 86_400_000).cast("long").alias("day"),
            F.lit(bid).alias("batch"),
        ),
        seen_path,
        ["day", "batch"],
    )
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
    _overwrite_batch(decisions, ledger_path, ["batch"], fmt="json")
    o, n, s = decisions.agg(
        F.count(F.lit(1)), F.sum("new_url"), F.sum("scheduled")
    ).first()
    return int(o), int(n or 0), int(s or 0)


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
    robots_path = os.path.join(frontier_path, "_robots")
    now = int(time.time() * 1000) if now_ms is None else int(now_ms)

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
        _check_stream_binding(frontier_path, checkpoint)
        o, n, s = _drain_batch(
            spark,
            batch_df,
            bid,
            frontier_path,
            agent=agent,
            crawl_delay_ms=crawl_delay_ms,
            max_per_host=max_per_host,
            robots_ttl_ms=robots_ttl_ms,
            now=now,
        )
        stats["offered"] += o
        stats["new"] += n
        stats["scheduled"] += s

    q = (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
