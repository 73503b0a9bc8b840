"""SQL front door (sstable_migrator_spark/sql.py): plain spark.sql over
the registered views must match the DataFrame catalog in values AND in
physical plan (same Catalyst path either way)."""

from __future__ import annotations

from sstable_migrator_spark import queries as Q
from sstable_migrator_spark.sql import register_tables


def test_register_and_query(spark, sf_dir):
    names = register_tables(spark, sf_dir)
    assert len(names) == 10
    got = spark.sql(
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ).collect()
    assert sum(r["n"] for r in got) == spark.table("orders").count()
    # events registered through the nanos conversion: ts is usable
    row = spark.sql("SELECT min(ts) AS lo, max(ts) AS hi FROM events").collect()[0]
    assert row["lo"] <= row["hi"]


def test_sql_matches_dataframe_catalog(spark, sf_dir):
    """The flagship top-k through SQL == the DataFrame catalog entry,
    and the SQL join plan broadcasts exactly like the DataFrame one."""
    register_tables(spark, sf_dir)
    sql_df = spark.sql(
        "SELECT c.c_nationkey, count(*) AS n "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_nationkey ORDER BY n DESC, c_nationkey LIMIT 5"
    )
    from pyspark.sql import functions as F

    df = (
        Q._t(spark, sf_dir, "orders")
        .join(
            Q._t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "c_nationkey")
        .limit(5)
    )
    assert [tuple(r) for r in sql_df.collect()] == [tuple(r) for r in df.collect()]
    plan = sql_df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
