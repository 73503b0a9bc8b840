from __future__ import annotations

import pytest

from sstable_migrator_spark.session import get_spark
from sstable_migrator_spark.streaming.protoshim import ensure_protobuf

# BEFORE any SparkSession exists: python workers inherit PYTHONPATH from
# the JVM's launch environment, and the transformWithState worker needs
# google.protobuf (real if installed, vendored shim otherwise)
ensure_protobuf()

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
