"""SQL front door: the whole engine surface via plain ``spark.sql``.

The catalog is DataFrame-first (Catalyst sees the same plan either
way), but a reference user coming from the documented ClickHouse/CQL
query surface (misc/clickhouse_queries.md, KB.md) types SQL. This
registers the engine's tables as temp views so every query in those
docs — and any ad-hoc exploration — runs as-is through the identical
optimizer path the DataFrame catalog uses; tests assert the two fronts
produce identical results and identical physical plans.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_tables(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every fixture table as ``<prefix><name>`` temp views
    (events goes through the same nanos-as-long timestamp conversion
    the DataFrame path uses — queries._t — so SQL sees identical
    values). Returns the registered view names."""
    from sstable_migrator_spark.queries import _t

    names = []
    for t in TABLES:
        _t(spark, sf_dir, t).createOrReplaceTempView(prefix + t)
        names.append(prefix + t)
    return names
