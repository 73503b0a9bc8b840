"""ORC source/sink + partitioned-layout pruning.

Format breadth: the engine's columnar contract (pushdown, pruning,
roundtrip fidelity) must hold in ORC exactly as tests/test_plans.py
proves for parquet, and a Hive-partitioned layout must prune
directories at planning time (the file-layout twin of the reference's
partition-key routing, README.md:40).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sstable_migrator_spark.plans import explain
from sstable_migrator_spark.sinks import orc_export, partitioned_export
from sstable_migrator_spark.sources.readers import read_orc


def test_orc_roundtrip_exact(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_orc")
    orc_export(src, out)
    back = read_orc(spark, out)
    assert back.schema == src.schema
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_orc_filter_pushdown_reaches_scan(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_orc")
    orc_export(spark.read.parquet(f"{sf_dir}/orders.parquet"), out)
    df = (
        read_orc(spark, out)
        .filter(F.col("o_orderkey") > 1000)
        .select("o_orderkey", "o_totalprice")
    )
    plan = explain._plan(df)
    assert "PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,1000)]" in plan
    cols = explain.read_schema_columns(df)
    assert set(cols) == {"o_orderkey", "o_totalprice"}, cols


def test_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    partitioned_export(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), out, ["lang"]
    )
    one = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = explain._plan(one)
    # pruning happens at the scan's PartitionFilters, not a post-filter
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    # and the pruned read returns exactly the partition's rows
    n_en = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("lang") == "en")
        .count()
    )
    assert one.count() == n_en
