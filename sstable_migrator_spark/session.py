"""SparkSession factory.

Local test mode runs ``local[N]`` in one JVM; the confs below are chosen
so the same code scales to a real multi-executor cluster at ~100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast);
- shuffle partitions sized to cores locally — on a cluster this should be
  ~2-3x total cores or left to AQE's coalescing from a high initial value;
- Arrow enabled so the few pandas-UDF operators batch efficiently;
- UTC session timezone so results are oracle-comparable (DuckDB is
  UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sstable_migrator_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``SPARK_GRAFT_CPUS`` (driver contract) sets local parallelism.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # 128 MB row groups / scan splits — matches the reference's parquet
        # layout (utils/parquet_converter/main.go:35-36) and is the right
        # split size for 100 TB scans.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.hadoop.parquet.block.size", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Per-call Python stack inspection + a JVM origin roundtrip on
        # EVERY DataFrame API call — measured ~0.6 s per large query
        # construction. Error call-sites are a debugging nicety; off in
        # an engine.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
