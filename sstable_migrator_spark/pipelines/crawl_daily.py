"""The daily CRAWL job — the web-corpus twin of ``pipelines/daily.py``
(the reference's two-job DNS DAG, SURVEY §3.3): one cron tick that
advances every piece of crawl state exactly once.

    robots refetch (expired hosts' robots.txt through the injected
           transport — the cache never silently decays to the REP
           default)
        -> frontier drain (seen-set + robots cache + politeness cursors)
        -> fetch (INJECTED transport; the T4 resolver pattern —
           operators/resolve.py:50 — applied to HTTP: production plugs
           a real fetcher, tests a deterministic fake; this module
           never talks to a network itself)
        -> raw-WARC responses on disk (the crawler's durable artifact,
           replayable through sources/warc.py forever)
        -> header strip + html_to_text -> document inbox (JSONL)
        -> streaming admission gate (dedup state, quality/LM/decon
           gates, BM25 postings, attributable ledger)

Every stage is individually oracle/test-evidenced; this module is the
composition a user actually crons, and its value is the STATE
DISCIPLINE: a re-run of the same tick re-offers the same URLs,
schedules nothing, fetches nothing, admits nothing — idempotence from
the frontier's seen-set, the fetch plan's batch stamp, and the
admission gate's checkpoint, not from luck.

Scale shape — document text NEVER flows through driver memory:
- the fetch runs EXECUTOR-SIDE in ``mapInPandas`` over the plan hash-
  partitioned by host, so one task owns a host's full polite schedule
  (``fetch_seq`` order within the task; ``fetch_offset_ms`` is the
  task's own sleep schedule) and tasks fetch different hosts in
  parallel — politeness per host, throughput across hosts;
- each fetch task writes its own raw-WARC shard
  (``tick-<batch>-p<partition>.warc.gz``) via the byte-deterministic
  ``encode_warc_responses``; only (shard name, record count) rows
  return to the driver — O(partitions), no text;
- extraction replays the shards through the distributed
  ``read_warc_responses`` -> ``warc_responses_to_documents`` path (one
  task per shard) and the documents land in the gate's inbox via a
  DISTRIBUTED ``write.json``, renamed to deterministic per-tick names
  (an O(partitions) driver rename of file NAMES, not content).
``work_dir`` must be a filesystem every executor can reach (shared FS
or object store on a real cluster — the same contract every state
store in this repo already has).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["daily_crawl_job", "fake_fetcher"]


def fake_fetcher(rows: list[dict]) -> list[dict]:
    """Deterministic offline fetch transport: one synthetic HTML page
    per planned URL — the crawl twin of ``operators/resolve.
    fake_resolver``. Production swaps in a real HTTP client that
    honors each row's ``fetch_offset_ms``. Page bodies are
    md5-derived per URL so distinct pages are genuinely distinct
    (near-dup-safe fixtures — the perceptual-fixture entropy lesson
    applies to text too)."""
    import hashlib

    out = []
    for r in rows:
        url = r["url"]
        h = hashlib.md5(url.encode("utf-8")).hexdigest()
        body_words = " ".join(h[i : i + 4] for i in range(0, 32, 4))
        page = (
            "<html><body><h1>Fetched</h1><p>the page at "
            + url.rsplit("/", 1)[-1]
            + " carries "
            + body_words
            + " for the readers</p></body></html>"
        )
        out.append(
            {"url": url, "date": "2024-06-01T00:00:00Z", "html": page,
             "status": 200}
        )
    return out


def _fetch_pending_plan(
    spark: SparkSession,
    plan: DataFrame,
    fetcher: Callable[[list[dict]], list[dict]],
    warc_dir: str,
    tag: str,
    fetch_partitions: int,
    max_fetch_per_task: int | None = None,
) -> tuple[int, int]:
    """Run ``fetcher`` executor-side over the pending plan, one
    invocation per host-hash partition (a host never splits across
    tasks, so its ``fetch_seq`` order — and therefore its politeness
    schedule — is a single task's sequential loop). Each task writes
    one deterministic raw-WARC shard (``<tag>-p<pid>.warc.gz``); only
    (shard, counts) rows reach the driver.

    PER-TASK BOUNDS — a hung or enormous host must not hold its
    partition's task forever:

    - ``max_fetch_per_task`` caps the URLs a task hands the fetcher
      this run; the remainder (the over-budget tail in per-host slot
      order) is DEFERRED, not dropped.
    - the fetcher contract allows PARTIAL returns: a production
      fetcher that hits its own wall-clock budget (or skips a hung
      host) simply returns fewer records, and every planned URL with
      no returned record is deferred too.

    Deferred rows land executor-side as ``defer-<tag>-p<pid>.parquet``
    (url/host/fetch_seq/fetch_offset_ms — plan rows, never text); the
    next ``daily_crawl_job`` tick re-queues them through its retry
    pass. Returns ``(fetched_records, deferred_rows)``."""
    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import functions as F

    from sstable_migrator_spark.sources.warc import encode_warc_responses

    # stale shards/deferrals from a crashed attempt (possibly written
    # under a different partition count) would double-feed extraction
    # or the retry pass: clear this tag's names before rewriting them
    # — O(files) name ops
    prefix = f"{tag}-p"
    dprefix = f"defer-{tag}-p"
    for f in os.listdir(warc_dir):
        if (f.startswith(prefix) and f.endswith(".warc.gz")) or (
            f.startswith(dprefix) and f.endswith(".parquet")
        ):
            os.remove(os.path.join(warc_dir, f))

    def _fetch(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pid = TaskContext.get().partitionId()
        rows: list[dict] = []
        for pdf in batches:
            rows.extend(pdf.to_dict("records"))
        if not rows:
            return
        # plan order within the task: per-host slot order
        rows.sort(key=lambda r: (r["host"], r["fetch_seq"]))
        capped = rows
        deferred: list[dict] = []
        if max_fetch_per_task is not None and len(rows) > max_fetch_per_task:
            capped = rows[:max_fetch_per_task]
            deferred = rows[max_fetch_per_task:]
        records = fetcher(capped) if capped else []
        # partial-return contract: planned-but-unreturned URLs re-queue
        got = {r["url"] for r in records}
        deferred = [r for r in capped if r["url"] not in got] + deferred
        shard = None
        if records:
            shard = os.path.join(warc_dir, f"{prefix}{pid:05d}.warc.gz")
            tmp = shard + f".inprogress-{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(encode_warc_responses(records))
            os.replace(tmp, shard)  # atomic: readers never see partials
        if deferred:
            dpath = os.path.join(warc_dir, f"{dprefix}{pid:05d}.parquet")
            schema = pa.schema(
                [
                    ("url", pa.string()),
                    ("host", pa.string()),
                    ("fetch_seq", pa.int64()),
                    ("fetch_offset_ms", pa.int64()),
                ]
            )
            tbl = pa.Table.from_pylist(
                [
                    {
                        "url": str(r["url"]),
                        "host": str(r["host"]),
                        "fetch_seq": int(r["fetch_seq"]),
                        "fetch_offset_ms": int(r["fetch_offset_ms"]),
                    }
                    for r in deferred
                ],
                schema=schema,
            )
            tmp = dpath + f".inprogress-{os.getpid()}"
            pq.write_table(tbl, tmp)
            os.replace(tmp, dpath)
        if records or deferred:
            yield pd.DataFrame(
                [
                    {
                        "file": os.path.basename(shard) if shard else None,
                        "n_records": len(records),
                        "n_deferred": len(deferred),
                    }
                ]
            )

    written = (
        plan.repartition(fetch_partitions, "host")
        .mapInPandas(_fetch, "file string, n_records long, n_deferred long")
        .collect()  # O(partitions): shard names + counts, never text
    )
    return (
        int(sum(r["n_records"] for r in written)),
        int(sum(r["n_deferred"] for r in written)),
    )


def _refetch_expired_robots(
    spark: SparkSession,
    frontier: str,
    fetcher: Callable[[list[dict]], list[dict]],
    now: int,
    robots_ttl_ms: int,
    fetch_partitions: int,
) -> DataFrame | None:
    """Hosts whose cached robots rules have EXPIRED (latest fetch
    older than the TTL) get their robots.txt re-fetched through the
    SAME injected transport, executor-side per host partition — the
    branch that keeps the frontier's robots cache ALIVE instead of
    letting expired hosts run on the REP default forever.

    Scheme: HTTPS-FIRST with HTTP fallback — the real-frontier
    contract. A host whose ``https://<host>/robots.txt`` probe yields
    NO record at all (transport-level failure: no TLS, refused
    connection — the fetcher answers by not answering) is re-probed
    once over plain ``http://``; a host that RESPONDED over https
    (any status) is never downgraded. Verdicts on whichever scheme
    answered: 2xx bodies parse through ``parse_robots_body``; 4xx
    means "no robots" and registers an explicit allow-all sentinel
    (freshness with no restriction — the REP default, but attributably
    fresh); 5xx yields nothing, so the host stays stale and retries
    next tick. Returns parsed rule rows (host, agent, rule, prefix)
    or None when nothing is expired."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sstable_migrator_spark.operators.crawl import parse_robots_body
    from sstable_migrator_spark.streaming.frontier import _has_parquet

    robots_path = os.path.join(frontier, "_robots")
    if not _has_parquet(robots_path):
        return None
    expired = (
        spark.read.parquet(robots_path)
        .groupBy("host")
        .agg(F.max("fetched_at").alias("_fa"))
        .filter(F.col("_fa") <= now - robots_ttl_ms)
        .select("host")
    )
    if expired.isEmpty():
        return None

    def _fetch(batches):
        hosts: list[str] = []
        for pdf in batches:
            hosts.extend(pdf["host"])
        if not hosts:
            return

        def _plan(scheme: str, hs: list[str]) -> list[dict]:
            return [
                {
                    "url": f"{scheme}://{h}/robots.txt",
                    "host": h,
                    "fetch_seq": 0,  # one URL per host: slot 0
                    "fetch_offset_ms": 0,
                }
                for h in sorted(hs)
            ]

        out: list[dict] = []
        answered: set[str] = set()

        def _judge(rec: dict) -> None:
            host = rec["url"].split("/")[2]
            answered.add(host)
            status = int(rec.get("status", 200))
            if 200 <= status < 300:
                out.extend(parse_robots_body(rec.get("html", ""), host))
            elif 400 <= status < 500:
                out.append(
                    {"host": host, "agent": "*", "rule": "allow",
                     "prefix": ""}
                )
            # 5xx: answered but unusable — stays stale, retries next
            # tick over https again (no downgrade for a live server)

        for rec in fetcher(_plan("https", hosts)):
            _judge(rec)
        silent = [h for h in hosts if h not in answered]
        if silent:
            # transport-level https failure only: fall back to http
            for rec in fetcher(_plan("http", silent)):
                _judge(rec)
        if out:
            yield pd.DataFrame(out)[["host", "agent", "rule", "prefix"]]

    return (
        expired.repartition(fetch_partitions, "host")
        .mapInPandas(
            _fetch, "host string, agent string, rule string, prefix string"
        )
        .localCheckpoint()  # fetch exactly once; reused by the drain
    )


def _extract_to_inbox(
    spark: SparkSession,
    warc_dir: str,
    tag: str,
    doc_inbox: str,
    work_dir: str,
) -> None:
    """Replay ``<tag>-p*.warc.gz`` through the distributed WARC ->
    document path and land the documents in the gate's JSONL inbox
    under deterministic per-tag names (an O(partitions) driver rename
    of file NAMES, not content) — crash-re-runs rewrite the same files
    and the gate's checkpoint skips already-consumed ones."""
    import shutil

    from sstable_migrator_spark.pipelines.web_ingest import (
        warc_responses_to_documents,
    )
    from sstable_migrator_spark.sources.warc import read_warc_responses

    docs = warc_responses_to_documents(
        read_warc_responses(
            spark, os.path.join(warc_dir, f"{tag}-p*.warc.gz")
        )
    ).select("doc_id", "text")
    staging = os.path.join(work_dir, f"_doc_staging-{tag}")
    docs.write.mode("overwrite").json(staging)
    parts = sorted(
        f
        for f in os.listdir(staging)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    for i, p in enumerate(parts):
        os.replace(
            os.path.join(staging, p),
            os.path.join(doc_inbox, f"{tag}-{i:05d}.jsonl"),
        )
    shutil.rmtree(staging)


def daily_crawl_job(
    spark: SparkSession,
    url_inbox: str,
    work_dir: str,
    fetcher: Callable[[list[dict]], list[dict]] = fake_fetcher,
    robots_rules: DataFrame | None = None,
    crawl_delay_ms: int = 1000,
    max_per_host: int | None = None,
    robots_ttl_ms: int = 86_400_000,
    now_ms: int | None = None,
    fetch_partitions: int = 8,
    max_fetch_per_task: int | None = None,
    **gate_kwargs,
) -> dict:
    """One cron tick. ``url_inbox`` holds discovered-URL JSONL files
    (``{"url": ...}``); ``work_dir`` owns all state::

        work_dir/frontier/   seen-set, robots cache, cursors, plans
        work_dir/warc/       fetched raw-WARC response shards (per tick)
        work_dir/doc_inbox/  extracted documents awaiting admission
        work_dir/corpus/     the admitted corpus + dedup state + ledger
        work_dir/ckpt_*/     the two streaming checkpoints

    ``fetcher(rows) -> records`` runs ON THE EXECUTORS, once per
    host-partition of the tick's fetch plan: it receives that
    partition's (url/host/fetch_seq/fetch_offset_ms) dicts in per-host
    slot order and returns ``{url, date, html, status?}`` records. A
    production fetcher sleeps each host's ``fetch_offset_ms`` schedule
    inside its task — hosts are never split across tasks, so
    politeness is task-local. ``fetch_partitions`` bounds the fetch
    fan-out (and the tick's shard count). ``gate_kwargs`` forward to
    ``admit_documents_available_now`` (quality weights, LM, eval
    decontamination, repetition, postings_path...). Returns
    ``{scheduled, fetched, judged, admitted, tick}``.

    CRASH ORDERING (same ledger discipline as every pipeline here):
    the WARC shards and the doc inbox write BEFORE the fetch cursor
    advances, and the gate drains last. A crash before the cursor
    update re-runs the fetch for the pending batches next tick — even
    from an EMPTY frontier drain (the pending-batch check is
    unconditional, test-pinned). Shards and inbox files are rewritten
    BY NAME with identical deterministic content (stale same-tick
    shards are cleared first, so even a changed partition count can't
    double-feed extraction); the gate's file checkpoint simply skips
    an already-consumed inbox file (nothing is re-judged), and a
    genuinely unconsumed one drains normally. A crash after the cursor
    but before the drain is recovered by the NEXT tick's drain (the
    inbox file is still unconsumed in the checkpoint's eyes). No
    window loses documents; the worst case re-fetches one tick.

    PER-TASK FETCH BOUNDS: ``max_fetch_per_task`` caps the URLs one
    fetch task hands the fetcher, and the fetcher may itself return
    PARTIAL results (its own wall-clock budget, a hung host). Either
    way the remainder is DEFERRED — written executor-side as
    ``defer-*`` plan shards — and RE-QUEUED by the next tick's retry
    pass (``retry-<n>`` namespace with its own cursor), so an
    over-budget host delays its own tail by one tick instead of
    holding a task forever or silently losing URLs. Crash between the
    retry cursor and the deferred-file cleanup re-fetches those URLs
    once more under a fresh retry id; the admission gate rejects the
    re-arrivals as exact duplicates — the documented worst case stays
    "re-fetches one tick", never a lost or double-admitted document."""
    from pyspark.sql import functions as F

    from sstable_migrator_spark.streaming.corpus_ingest import (
        admit_documents_available_now,
    )
    from sstable_migrator_spark.streaming.frontier import (
        schedule_frontier_available_now,
    )

    if fetch_partitions < 1:
        raise ValueError(
            f"fetch_partitions must be >= 1, got {fetch_partitions}"
        )
    frontier = os.path.join(work_dir, "frontier")
    warc_dir = os.path.join(work_dir, "warc")
    doc_inbox = os.path.join(work_dir, "doc_inbox")
    corpus = os.path.join(work_dir, "corpus")
    os.makedirs(warc_dir, exist_ok=True)
    os.makedirs(doc_inbox, exist_ok=True)

    # robots refetch FIRST: expired hosts' robots.txt re-fetch through
    # the same injected transport, so the drain below judges against
    # fresh rules instead of the REP default forever
    import time as _time

    now = int(_time.time() * 1000) if now_ms is None else int(now_ms)
    refreshed = _refetch_expired_robots(
        spark, frontier, fetcher, now, robots_ttl_ms, fetch_partitions
    )
    if refreshed is not None:
        if robots_rules is None:
            robots_rules = refreshed
        else:
            cols = ["host", "agent", "rule", "prefix"]
            extra = robots_rules
            if "fetched_at" in extra.columns:
                extra = extra.drop("fetched_at")  # both stamp `now`
            robots_rules = extra.select(*cols).unionByName(refreshed)

    fstats = schedule_frontier_available_now(
        spark,
        url_inbox,
        frontier,
        os.path.join(work_dir, "ckpt_frontier"),
        robots_rules=robots_rules,
        crawl_delay_ms=crawl_delay_ms,
        max_per_host=max_per_host,
        robots_ttl_ms=robots_ttl_ms,
        now_ms=now,
    )

    # RETRY PASS FIRST: deferred plan rows from earlier ticks (per-task
    # caps, partial fetcher returns) re-queue under their own retry
    # namespace and cursor — independent of the plan-batch cursor, so a
    # deferred remainder drains even on a tick with no new batches.
    # The consumed snapshot is taken BEFORE this tick's fetches, so a
    # deferral written below waits exactly one tick.
    import glob as _glob

    retry_file = os.path.join(work_dir, "_last_retry")
    rlast = 0
    if os.path.exists(retry_file):
        with open(retry_file) as fh:
            rlast = int(fh.read().strip() or 0)
    rtag = f"retry-{rlast + 1:06d}"
    consumed = sorted(
        f
        for f in _glob.glob(os.path.join(warc_dir, "defer-*.parquet"))
        # a crashed prior attempt of THIS retry id left its own output
        # behind; _fetch_pending_plan stale-clears and rewrites it —
        # it must not be re-planned as input
        if not os.path.basename(f).startswith(f"defer-{rtag}-")
    )
    refetched = redeferred = 0
    if consumed:
        refetched, redeferred = _fetch_pending_plan(
            spark,
            spark.read.parquet(*consumed),
            fetcher,
            warc_dir,
            rtag,
            fetch_partitions,
            max_fetch_per_task,
        )
        if refetched:
            _extract_to_inbox(spark, warc_dir, rtag, doc_inbox, work_dir)
        with open(retry_file, "w") as fh:
            fh.write(str(rlast + 1))
        for f in consumed:
            os.remove(f)

    # which tick is this? plans are batch-stamped; fetch ONLY the new
    # batches (a re-run drains zero batches and fetches nothing)
    plans_path = os.path.join(frontier, "plans")
    tick_file = os.path.join(work_dir, "_last_fetched_batch")
    last = -1
    if os.path.exists(tick_file):
        with open(tick_file) as fh:
            last = int(fh.read().strip() or -1)
    fetched = 0
    deferred = 0
    max_batch = last
    # check for pending batches UNCONDITIONALLY (not only when this
    # drain scheduled something): a crash between a previous tick's
    # plan write and its cursor update leaves batches > last that this
    # tick must fetch even from an empty frontier drain
    if os.path.isdir(plans_path):
        plan = spark.read.parquet(plans_path).filter(F.col("batch") > last)
        mb = plan.agg(F.max("batch")).first()[0]
        if mb is not None:
            max_batch = int(mb)
            fetched, deferred = _fetch_pending_plan(
                spark,
                plan,
                fetcher,
                warc_dir,
                f"tick-{max_batch:06d}",
                fetch_partitions,
                max_fetch_per_task,
            )
        if fetched:
            # offer to the gate through its JSONL inbox contract — a
            # DISTRIBUTED write (one part per shard task, content
            # deterministic per part), renamed to the tick's
            # deterministic inbox names so a crash-re-run rewrites the
            # same files and the gate's checkpoint skips them
            _extract_to_inbox(
                spark, warc_dir, f"tick-{max_batch:06d}", doc_inbox, work_dir
            )
    if max_batch != last:
        with open(tick_file, "w") as fh:
            fh.write(str(max_batch))

    gstats = admit_documents_available_now(
        spark,
        doc_inbox,
        corpus,
        os.path.join(work_dir, "ckpt_gate"),
        **gate_kwargs,
    )
    return {
        "scheduled": fstats["scheduled"],
        "fetched": fetched + refetched,
        "deferred": deferred + redeferred,
        "refetched": refetched,
        "judged": gstats["judged"],
        "admitted": gstats["admitted"],
        "tick": max_batch,
    }
