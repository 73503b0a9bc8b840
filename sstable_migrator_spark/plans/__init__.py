from sstable_migrator_spark.plans import explain  # noqa: F401
