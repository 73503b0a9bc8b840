"""Query-side operators (SURVEY §2.6-§2.8): the analytics surface the
reference documents against ClickHouse/Cassandra (misc/
clickhouse_queries.md, KB.md) plus generic relational helpers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_count_topk(
    df: DataFrame, group_cols: list[str], k: int = 100, count_alias: str = "cnt"
) -> DataFrame:
    """A2/O3 — ``GROUP BY x ORDER BY count(*) DESC LIMIT k``
    (clickhouse_queries.md:35-43). Partial+final hash agg then
    TakeOrderedAndProject — no global sort materializes. Tie-break on
    the group key for deterministic, oracle-comparable output."""
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .orderBy(F.col(count_alias).desc(), *[F.col(c).asc() for c in group_cols])
        .limit(k)
    )


def per_partition_limit(
    df: DataFrame, partition_cols: list[str], order_cols: list[Column], n: int = 1
) -> DataFrame:
    """Q1 — CQL ``PER PARTITION LIMIT n`` (KB.md:1-4): first n rows per
    partition key in clustering order. Window row_number; AQE handles
    skewed partitions."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def keyset_page(
    df: DataFrame, key_col: str, after, page_size: int
) -> DataFrame:
    """Q2 — keyset pagination (KB.md:7-11): no OFFSET scan; resume
    strictly after the last seen key. O(page) via
    TakeOrderedAndProject + pushed-down range filter."""
    out = df
    if after is not None:
        out = out.filter(F.col(key_col) > F.lit(after))
    return out.orderBy(F.col(key_col).asc()).limit(page_size)


def backfill_column(df: DataFrame, name: str, expr: Column) -> DataFrame:
    """Q3 — derived-column backfill (``ALTER TABLE UPDATE ... WHERE 1=1``,
    clickhouse_queries.md:21-33) == withColumn + overwrite of the
    columnar copy; the transform itself is this projection."""
    return df.withColumn(name, expr)


def prefix_lookup(df: DataFrame, **equals) -> DataFrame:
    """Q4 — point/prefix lookup on partition columns; over storage
    partitioned by those columns this is partition-pruned to O(result)."""
    out = df
    for c, v in equals.items():
        out = out.filter(F.col(c) == F.lit(v))
    return out
