"""Streaming corpus admission (the incremental-dedup gate on the
arrival path).

The batch decision (operators/dedup.incremental_dedup: exact
fingerprint set + cross-corpus LSH against everything already
ingested) applied per availableNow drain: a file stream of newly
landed documents is gated inside ``foreachBatch`` — each micro-batch
is a plain DataFrame, so the batch operator runs UNCHANGED against the
static existing corpus, admitted rows append to the corpus store, and
the source checkpoint guarantees a document is judged exactly once.
This is the same ledger discipline streaming/sstable_ingest uses for
sstable waves, applied to corpus curation: a quiet day costs one empty
drain.

Note the admission reference is the corpus AS OF the drain start
(micro-batches within one drain don't see each other's admissions —
same-day duplicates are caught by the NEXT drain or an in-batch
self-dedup upstream). That matches the daily-cadence semantics of the
reference pipeline (J4/T2's 25-day window), where "today" is one
batch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["admit_documents_available_now"]


def admit_documents_available_now(
    spark: SparkSession,
    in_path: str,
    corpus_path: str,
    checkpoint: str,
    schema: str = "doc_id long, text string",
    jaccard_threshold: float = 0.5,
) -> dict:
    """One drain: judge every newly landed JSONL document against the
    parquet corpus at ``corpus_path`` (exact + near-dup), append the
    admitted ones, and record the drain's decisions at
    ``corpus_path/_admissions.jsonl``. Returns the drain summary
    ``{judged, admitted}``."""
    from sstable_migrator_spark.operators.dedup import incremental_dedup

    stream = spark.readStream.schema(schema).json(in_path)
    stats = {"judged": 0, "admitted": 0}

    def _gate(batch_df, bid: int) -> None:
        batch_df = batch_df.localCheckpoint()
        if batch_df.isEmpty():
            return
        if os.path.isdir(corpus_path) and any(
            f.endswith(".parquet") for f in os.listdir(corpus_path)
        ):
            old = spark.read.parquet(corpus_path)
            decisions = incremental_dedup(
                batch_df, old, jaccard_threshold=jaccard_threshold
            ).localCheckpoint()
        else:
            decisions = batch_df.selectExpr(
                "doc_id",
                "CAST(0 AS INT) AS exact_dup",
                "CAST(0 AS BIGINT) AS n_near_dups",
                "CAST(1 AS INT) AS admitted",
            ).localCheckpoint()
        admitted = batch_df.join(
            decisions.filter("admitted = 1").select("doc_id"), "doc_id"
        )
        admitted.write.mode("append").parquet(corpus_path)
        rows = decisions.collect()
        stats["judged"] += len(rows)
        stats["admitted"] += sum(r["admitted"] for r in rows)
        with open(os.path.join(corpus_path, "_admissions.jsonl"), "a") as fh:
            for r in rows:
                fh.write(json.dumps({"batch": bid, **r.asDict()}) + "\n")

    q = (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
