from sstable_migrator_spark.sources import dims, readers  # noqa: F401
