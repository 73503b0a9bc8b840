from sstable_migrator_spark.sources import dims, readers, warc  # noqa: F401
