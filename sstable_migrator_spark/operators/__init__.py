from sstable_migrator_spark.operators import (  # noqa: F401
    analytics,
    clean,
    dedup,
    ingest,
    multimodal,
    simsearch,
)
