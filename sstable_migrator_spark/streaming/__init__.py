from sstable_migrator_spark.streaming import daily  # noqa: F401
