"""The daily CRAWL job — the web-corpus twin of ``pipelines/daily.py``
(the reference's two-job DNS DAG, SURVEY §3.3): one cron tick that
advances every piece of crawl state exactly once.

    frontier drain (seen-set + robots cache + politeness cursors)
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

Scale shape: the fetch plan is the only driver-side collect, bounded
by the tick's scheduled URLs x politeness budget (a fetcher consumes
the plan as rows anyway); everything else is the underlying modules'
documented shapes.
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


def daily_crawl_job(
    spark: SparkSession,
    url_inbox: str,
    work_dir: str,
    fetcher: Callable[[list[dict]], list[dict]] = fake_fetcher,
    robots_rules: DataFrame | None = None,
    crawl_delay_ms: int = 1000,
    max_per_host: int | None = None,
    now_ms: int | None = None,
    **gate_kwargs,
) -> dict:
    """One cron tick. ``url_inbox`` holds discovered-URL JSONL files
    (``{"url": ...}``); ``work_dir`` owns all state::

        work_dir/frontier/   seen-set, robots cache, cursors, plans
        work_dir/warc/       fetched raw-WARC response shards (per tick)
        work_dir/doc_inbox/  extracted documents awaiting admission
        work_dir/corpus/     the admitted corpus + dedup state + ledger
        work_dir/ckpt_*/     the two streaming checkpoints

    ``fetcher(rows) -> records`` receives the tick's fetch plan
    (url/host/fetch_seq/fetch_offset_ms dicts, plan order) and returns
    ``{url, date, html, status?}`` records; they are written as ONE
    raw-WARC response shard per tick (a durable, replayable artifact),
    read back distributed, extracted, and offered to the admission
    gate. ``gate_kwargs`` forward to ``admit_documents_available_now``
    (quality weights, LM, eval decontamination, repetition,
    postings_path...). Returns
    ``{scheduled, fetched, judged, admitted, tick}``.

    CRASH ORDERING (same ledger discipline as every pipeline here):
    the WARC shard and the doc inbox write BEFORE the fetch cursor
    advances, and the gate drains last. A crash before the cursor
    update re-runs the fetch for the pending batches next tick — even
    from an EMPTY frontier drain (the pending-batch check is
    unconditional, test-pinned). The shard and inbox files are
    rewritten BY NAME with identical deterministic content, so the
    gate's file checkpoint simply skips an already-consumed inbox file
    (nothing is re-judged), and a genuinely unconsumed one drains
    normally. A crash after the cursor but before
    the drain is recovered by the NEXT tick's drain (the inbox file is
    still unconsumed in the checkpoint's eyes). No window loses
    documents; the worst case re-fetches one tick."""
    import json as _json

    from pyspark.sql import functions as F

    from sstable_migrator_spark.pipelines.web_ingest import (
        warc_responses_to_documents,
    )
    from sstable_migrator_spark.sources.warc import (
        encode_warc_responses,
        read_warc_responses,
    )
    from sstable_migrator_spark.streaming.corpus_ingest import (
        admit_documents_available_now,
    )
    from sstable_migrator_spark.streaming.frontier import (
        schedule_frontier_available_now,
    )

    frontier = os.path.join(work_dir, "frontier")
    warc_dir = os.path.join(work_dir, "warc")
    doc_inbox = os.path.join(work_dir, "doc_inbox")
    corpus = os.path.join(work_dir, "corpus")
    os.makedirs(warc_dir, exist_ok=True)
    os.makedirs(doc_inbox, exist_ok=True)

    fstats = schedule_frontier_available_now(
        spark,
        url_inbox,
        frontier,
        os.path.join(work_dir, "ckpt_frontier"),
        robots_rules=robots_rules,
        crawl_delay_ms=crawl_delay_ms,
        max_per_host=max_per_host,
        now_ms=now_ms,
    )

    # which tick is this? plans are batch-stamped; fetch ONLY the new
    # batches (a re-run drains zero batches and fetches nothing)
    plans_path = os.path.join(frontier, "plans")
    tick_file = os.path.join(work_dir, "_last_fetched_batch")
    last = -1
    if os.path.exists(tick_file):
        with open(tick_file) as fh:
            last = int(fh.read().strip() or -1)
    fetched = 0
    max_batch = last
    # check for pending batches UNCONDITIONALLY (not only when this
    # drain scheduled something): a crash between a previous tick's
    # plan write and its cursor update leaves batches > last that this
    # tick must fetch even from an empty frontier drain
    if os.path.isdir(plans_path):
        plan = (
            spark.read.parquet(plans_path)
            .filter(F.col("batch") > last)
            .orderBy("batch", "host", "fetch_seq")
        )
        rows = [r.asDict() for r in plan.collect()]
        if rows:
            max_batch = max(r["batch"] for r in rows)
            records = fetcher(rows)
            fetched = len(records)
            shard = os.path.join(warc_dir, f"tick-{max_batch:06d}.warc.gz")
            with open(shard, "wb") as fh:
                fh.write(encode_warc_responses(records))
            docs = warc_responses_to_documents(
                read_warc_responses(spark, shard)
            ).select(
                "doc_id", F.col("text"), "url", "lang"
            )
            # offer to the gate through its JSONL inbox contract
            out = os.path.join(doc_inbox, f"tick-{max_batch:06d}.jsonl")
            with open(out, "w") as fh:
                for d in docs.collect():
                    fh.write(
                        _json.dumps({"doc_id": d["doc_id"], "text": d["text"]})
                        + "\n"
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
        "fetched": fetched,
        "judged": gstats["judged"],
        "admitted": gstats["admitted"],
        "tick": max_batch,
    }
