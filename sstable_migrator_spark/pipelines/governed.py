"""Governed ingest: the composition the round-2 pieces exist for.

    contract gate -> curation -> versioned snapshot commit ->
    plan-metrics run log -> notification

One batch of raw documents is admitted only if its data contract holds
(operators/expectations — one conditional-agg pass); admitted data runs
the standard curation (quality floor + exact dedup, both oracle-pinned
elsewhere) and commits as a NEW SNAPSHOT of a manifest-versioned table
(sinks/versioned — readers never see a partial batch, and a bad batch
is one `rollback` away from undone). The run log row carries BOTH the
contract verdicts and the executed plan's shuffle metrics
(plans/metrics), and the notification renders the same counters the
reference's Telegram message carries (K7/K8).

Scale shape: the contract pass and curation are the only data-sized
work (one scan + one dedup shuffle); everything else — manifests,
verdicts, metrics, notify — is O(rules + operators) driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sstable_migrator_spark.operators import dedup
from sstable_migrator_spark.operators.expectations import validate
from sstable_migrator_spark.pipelines.corpus import quality_score
from sstable_migrator_spark.plans.metrics import shuffle_summary
from sstable_migrator_spark.sinks.ops import append_run_log, notify
from sstable_migrator_spark.sinks.versioned import versioned_write

__all__ = ["governed_ingest", "DEFAULT_CONTRACT"]

DEFAULT_CONTRACT: list[dict] = [
    {"rule": "not_null", "col": "doc_id"},
    {"rule": "not_null", "col": "text"},
    {"rule": "unique", "cols": ["doc_id"]},
]


class ContractViolation(RuntimeError):
    """The batch failed its data contract; nothing was committed."""


def governed_ingest(
    docs: DataFrame,
    table_path: str,
    run_id: str,
    log_path: str,
    outbox_path: str | None = None,
    rules: list[dict] | None = None,
    quality_min: float = 0.3,
) -> dict:
    """Admit one batch into the governed corpus table. Returns the run
    summary (contract verdicts + row counts + shuffle metrics). Raises
    ContractViolation — BEFORE any commit — if any rule is violated;
    the failed verdicts still land in the run log (status='rejected')
    so the operator sees why."""
    from pyspark.sql import Observation

    spark = docs.sparkSession
    vdf = validate(docs, rules or DEFAULT_CONTRACT)
    verdicts = {r["rule"]: int(r["violations"]) for r in vdf.collect()}
    if any(v > 0 for v in verdicts.values()):
        append_run_log(
            spark, log_path, run_id, "contract", verdicts, status="rejected"
        )
        raise ContractViolation(f"run {run_id}: {verdicts}")

    curated = dedup.exact_dedup(
        docs.filter(quality_score(F.col("text")) >= quality_min)
    ).drop("fingerprint")
    # row count rides the write (Observation — no second pass), and the
    # shuffle metrics come from the contract pass we just executed
    # (plan_metrics needs an action on the SAME DataFrame)
    obs = Observation(f"governed-{run_id}")
    curated = curated.observe(obs, F.count(F.lit(1)).alias("rows"))
    version = versioned_write(curated, table_path, mode="append")
    metrics = {
        **verdicts,
        "curated_rows": int(obs.get["rows"]),
        "snapshot_version": version,
        **{f"contract_{k}": v for k, v in shuffle_summary(vdf).items()},
    }
    append_run_log(spark, log_path, run_id, "ingest", metrics)
    if outbox_path is not None:
        notify(run_id, metrics, outbox_path=outbox_path)
    return metrics
