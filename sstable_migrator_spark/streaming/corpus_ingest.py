"""Streaming corpus admission (the incremental-dedup gate on the
arrival path).

The batch decision (operators/dedup.incremental_dedup: exact
fingerprint set + cross-corpus LSH against everything already
ingested) applied per availableNow drain: a file stream of newly
landed documents is gated inside ``foreachBatch`` — each micro-batch
is a plain DataFrame, so the batch operator runs UNCHANGED, admitted
rows append to the corpus store, and the source checkpoint guarantees
a document is judged exactly once. This is the same ledger discipline
streaming/sstable_ingest uses for sstable waves, applied to corpus
curation: a quiet day costs one empty drain.

THE STATE STORE (what makes a drain O(day), not O(corpus)): the gate
maintains ``<corpus>/_dedup_state`` — a parquet table of
``build_dedup_state`` rows (fingerprint + banded MinHash signature,
``bands`` rows per admitted document). Each drain builds the BATCH's
state once, judges it against the persisted table (band-bucket join +
fingerprint join — the corpus TEXT is never read), and appends the
admitted documents' state rows. A pre-existing corpus without a state
table is migrated once (one corpus pass) on the first drain that needs
it. Underscore-prefixed, so corpus readers (``spark.read.parquet`` on
the corpus dir) never see it.

THE LEDGER is distributed: per-document decisions append as JSON under
``<corpus>/_admissions/`` straight from the executors; only the
two-scalar drain summary (judged/admitted counts) ever reaches the
driver — no O(batch) collect anywhere on the arrival path.

QUALITY GATES compose: pass frozen quality-model weights and/or a
trained+frozen n-gram LM and the drain admits only documents that
clear dedup AND the quality logit AND the perplexity threshold — all
three are projections/broadcast joins, stream-compatible by
construction. Gate columns ride in the ledger (``quality_keep``,
``ppl_keep``) so rejections are attributable.

Crash note (same as every ledger here): corpus append, state append,
postings append, and ledger append are separate writes; a crash
between them can leave a drain partially recorded, and the checkpoint
will NOT replay it. The LEDGER COMMITS LAST by construction, so a
decision row in ``_admissions`` means every store write for that drain
completed — audit is ``_admissions`` vs corpus ids. Repairs, all
corpus-pass-free or pure functions: re-seed the dedup state from the
corpus text (``build_dedup_state`` — the state is a pure function of
the corpus); rebuild the BM25 corpus constants from the postings
parquet (``retrieval.rebuild_postings_stats`` — the index is
self-describing, one column-pruned scan). The state store records its
LSH parameters in ``_dedup_state/_params.json``; every drain asserts
they match before judging (a state consumed with different banding
would silently mis-estimate Jaccard).

Note the admission reference is the corpus AS OF the drain start
(micro-batches within one drain don't see each other's admissions —
same-day duplicates are caught by the NEXT drain or an in-batch
self-dedup upstream). That matches the daily-cadence semantics of the
reference pipeline (J4/T2's 25-day window), where "today" is one
batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["admit_documents_available_now"]


def _has_parquet(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def admit_documents_available_now(
    spark: SparkSession,
    in_path: str,
    corpus_path: str,
    checkpoint: str,
    schema: str = "doc_id long, text string",
    jaccard_threshold: float = 0.5,
    quality_weights: list[int] | None = None,
    quality_bias: int = 0,
    lm: DataFrame | None = None,
    lm_threshold_q16: int | None = None,
    lm_vocab: int = 256,
    eval_docs: DataFrame | None = None,
    eval_shingle_k: int = 5,
    postings_path: str | None = None,
    repetition: bool = False,
) -> dict:
    """One drain: judge every newly landed JSONL document against the
    persisted dedup state of the corpus at ``corpus_path`` (exact +
    near-dup; plus the frozen quality model when ``quality_weights``
    is given, plus the perplexity filter when ``lm`` — a frozen
    ``train_bigram_lm`` table — is given, plus benchmark
    decontamination when ``eval_docs`` — the held-out eval set — is
    given: any arriving document sharing a word shingle with it is
    rejected at the door, so eval text can never enter the corpus;
    plus the MassiveText repetition rules when ``repetition=True`` —
    ``operators.gopher.repetition_flags``, ledger column
    ``rep_keep``), append the admitted ones, extend the state store,
    and record every decision under ``corpus_path/_admissions/``. With
    ``postings_path`` the gate ALSO maintains the BM25 serving index
    (``retrieval.write_postings_index`` layout): admitted documents'
    postings append per drain, so retrieval freshness costs O(day)
    exactly like the dedup state. Returns the drain summary
    ``{judged, admitted}``."""
    from sstable_migrator_spark.operators.dedup import (
        build_dedup_state,
        check_dedup_state_params,
        incremental_dedup,
        write_dedup_state_params,
    )

    state_path = os.path.join(corpus_path, "_dedup_state")
    ledger_path = os.path.join(corpus_path, "_admissions")
    # Freeze the LM table driver-side once per drain: foreachBatch may
    # run it in several micro-batches and the model must not drift.
    lm_frozen = lm.localCheckpoint() if lm is not None else None
    eval_frozen = (
        eval_docs.localCheckpoint() if eval_docs is not None else None
    )

    stream = spark.readStream.schema(schema).json(in_path)
    stats = {"judged": 0, "admitted": 0}

    def _gate(batch_df, bid: int) -> None:
        batch_df = batch_df.localCheckpoint()
        if batch_df.isEmpty():
            return
        new_state = build_dedup_state(batch_df).localCheckpoint()
        if _has_parquet(state_path):
            # refuse a state built with different LSH parameters —
            # it would silently mis-estimate Jaccard (sidecar absent
            # = pre-sidecar state; stamp it with the defaults it was
            # necessarily built with, this gate's only form)
            if check_dedup_state_params(state_path) is None:
                write_dedup_state_params(state_path)
            old_state = spark.read.parquet(state_path)
        elif _has_parquet(corpus_path):
            # one-time migration: corpus predates the state store —
            # build and persist it now so every LATER drain is O(day)
            spark.read.parquet(corpus_path).transform(
                build_dedup_state
            ).write.mode("overwrite").parquet(state_path)
            write_dedup_state_params(state_path)
            old_state = spark.read.parquet(state_path)
        else:
            old_state = None
        if old_state is not None:
            decisions = incremental_dedup(
                batch_df,
                jaccard_threshold=jaccard_threshold,
                old_state=old_state,
                new_state=new_state,
            )
        else:
            decisions = batch_df.selectExpr(
                "doc_id",
                "CAST(0 AS INT) AS exact_dup",
                "CAST(0 AS BIGINT) AS n_near_dups",
                "CAST(1 AS INT) AS admitted",
            )
        # compose the quality gates: stateless projections / broadcast
        # joins, so they run unchanged inside the stream
        if quality_weights is not None:
            from sstable_migrator_spark.operators.quality_model import (
                score_quality_frozen,
            )

            qk = score_quality_frozen(
                batch_df, quality_weights, quality_bias
            ).select("doc_id", F.col("keep").alias("quality_keep"))
            decisions = decisions.join(qk, "doc_id", "left")
        else:
            decisions = decisions.withColumn("quality_keep", F.lit(1))
        if lm_frozen is not None:
            from sstable_migrator_spark.operators.lm import perplexity_score

            pk = perplexity_score(
                batch_df,
                lm_frozen,
                vocab=lm_vocab,
                threshold_q16=lm_threshold_q16,
            ).select("doc_id", F.col("keep").alias("ppl_keep"))
            decisions = decisions.join(pk, "doc_id", "left")
        else:
            decisions = decisions.withColumn("ppl_keep", F.lit(1))
        if eval_frozen is not None:
            from sstable_migrator_spark.operators.dedup import (
                contamination_flags,
            )

            ck = contamination_flags(
                batch_df, eval_frozen, shingle_k=eval_shingle_k
            ).select(
                "doc_id",
                (~F.col("contaminated")).cast("int").alias("decon_keep"),
            )
            decisions = decisions.join(ck, "doc_id", "left")
        else:
            decisions = decisions.withColumn("decon_keep", F.lit(1))
        if repetition:
            from sstable_migrator_spark.operators.gopher import (
                repetition_flags,
            )

            rk = repetition_flags(batch_df).select(
                "doc_id", F.col("keep").alias("rep_keep")
            )
            decisions = decisions.join(rk, "doc_id", "left")
        else:
            decisions = decisions.withColumn("rep_keep", F.lit(1))
        decisions = decisions.select(
            "doc_id",
            "exact_dup",
            "n_near_dups",
            F.coalesce("quality_keep", F.lit(0)).cast("int").alias("quality_keep"),
            F.coalesce("ppl_keep", F.lit(0)).cast("int").alias("ppl_keep"),
            # absent from the contamination rollup = produced no
            # shingles at all = cannot be contaminated -> keep
            F.coalesce("decon_keep", F.lit(1)).cast("int").alias("decon_keep"),
            F.coalesce("rep_keep", F.lit(0)).cast("int").alias("rep_keep"),
            (
                (F.col("admitted") == 1)
                & (F.coalesce("quality_keep", F.lit(0)) == 1)
                & (F.coalesce("ppl_keep", F.lit(0)) == 1)
                & (F.coalesce("decon_keep", F.lit(1)) == 1)
                & (F.coalesce("rep_keep", F.lit(0)) == 1)
            ).cast("int").alias("admitted"),
        ).localCheckpoint()

        admitted_ids = decisions.filter("admitted = 1").select("doc_id")
        admitted_docs = batch_df.join(admitted_ids, "doc_id").localCheckpoint()
        admitted_docs.write.mode("append").parquet(corpus_path)
        # extend the state store with the admitted documents' rows —
        # next drain judges against corpus + this wave, still text-free
        new_state.join(admitted_ids, "doc_id").write.mode("append").parquet(
            state_path
        )
        if check_dedup_state_params(state_path) is None:
            write_dedup_state_params(state_path)  # first drain created it
        if postings_path is not None and not admitted_docs.isEmpty():
            from sstable_migrator_spark.operators.retrieval import (
                append_postings_index,
                write_postings_index,
            )

            if _has_parquet(os.path.join(postings_path, "_corpus_stats")):
                append_postings_index(admitted_docs, postings_path)
            else:
                write_postings_index(admitted_docs, postings_path)
        # distributed ledger append; ONLY the 2-scalar summary is
        # collected (one row), never the per-document decisions
        decisions.withColumn("batch", F.lit(bid)).write.mode("append").json(
            ledger_path
        )
        j, a = decisions.agg(
            F.count(F.lit(1)), F.sum("admitted")
        ).first()
        stats["judged"] += int(j)
        stats["admitted"] += int(a or 0)

    q = (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
