from sstable_migrator_spark.pipelines.daily import (  # noqa: F401
    daily_prepare_job,
    daily_upload_job,
)
from sstable_migrator_spark.pipelines import corpus, web_ingest  # noqa: E402,F401
