"""Streaming / incremental operators (SURVEY §2.9, T1-T3).

The reference's "streaming" is daily cron micro-batches over files
(daily_upload.cron, daily_certstream_download.cron). Spark-first:
Structured Streaming file source + ``trigger(availableNow=True)`` —
each invocation drains what has arrived, exactly the cron semantics,
with checkpointed exactly-once sinks. The 25-day dedup window (T2)
becomes watermarked ``dropDuplicates``; the batch twin lives in
operators.dedup.anti_join_history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sstable_migrator_spark import schemas


def read_domain_stream(spark: SparkSession, path: str) -> DataFrame:
    """T1 — file-arrival micro-batch source of dns_records CSV."""
    return (
        spark.readStream.schema(schemas.DNS_RECORDS)
        .option("maxFilesPerTrigger", 64)
        .csv(path)
    )


def watermark_dedup(
    stream: DataFrame,
    key: str = "domain",
    ts_col: str = "seen_ts",
    window: str = "25 days",
) -> DataFrame:
    """T2 — the 25-day dedup window as streaming state: duplicates of a
    key are suppressed while the key's event time is within the
    watermark; state for older keys is evicted automatically
    (daily_certstream_download.sh:75-93's rolling snapshots, minus the
    25-pass comm loop)."""
    return stream.withWatermark(ts_col, window).dropDuplicates([key])


def write_bronze(
    stream: DataFrame, path: str, checkpoint: str, batch_date_col: str = "batch_date"
) -> "object":
    """T3 — date-partitioned incremental append with provenance
    (daily_all_upload.sh:16-19's dated archive dirs)."""
    out = stream.withColumn(batch_date_col, F.current_date())
    return (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(batch_date_col)
        .trigger(availableNow=True)
        .start()
    )


def run_available_now(
    spark: SparkSession, in_path: str, out_path: str, checkpoint: str
) -> None:
    """One daily 'cron tick': drain currently-available files through
    validate->dedup into the bronze table, then stop."""
    stream = read_domain_stream(spark, in_path)
    stream = stream.withColumn("seen_ts", F.current_timestamp())
    deduped = watermark_dedup(stream, key="domain", ts_col="seen_ts")
    q = write_bronze(deduped, out_path, checkpoint)
    q.awaitTermination()
