"""Plan-quality assertions: the physical plans we WANT, not just plans
that pass — pushdown reaches the parquet scan, small dims broadcast,
top-k avoids global sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from sstable_migrator_spark import queries as Q
from sstable_migrator_spark.plans import explain


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") > 1000)
        .select("o_orderkey", "o_totalprice")
    )
    plan = explain._plan(df)
    assert "PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,1000)]" in plan
    cols = explain.read_schema_columns(df)
    assert set(cols) == {"o_orderkey", "o_totalprice"}, cols


def test_dimension_joins_broadcast(spark, sf_dir):
    df = Q.q_join_enrich_region(spark, sf_dir)
    assert explain.has_broadcast_hash_join(df)
    plan = explain._plan(df)
    assert "SortMergeJoin" not in plan


def test_geoip_bucketed_join_is_broadcast_hash(spark, sf_dir):
    """The range join must plan as BroadcastHASHJoin on the /8 bucket
    (equi key), not BroadcastNestedLoopJoin over every range."""
    df = Q.q_geoip_enrich(spark, sf_dir)
    plan = explain._plan(df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    df = Q.q_group_topk(spark, sf_dir)
    plan = explain._plan(df)
    assert "TakeOrderedAndProject" in plan


def test_flagship_compiles_whole_stage(spark, sf_dir):
    """The ingest pipeline must stay inside whole-stage codegen (no 64KB
    fallback) — guarded here because it regressed during development.
    AQE hides codegen spans before execution, so execute first and
    assert on the final adaptive plan."""
    df = Q.flagship_ingest(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark operators inside a compiled whole-stage span
    assert "*(1)" in plan and "*(2)" in plan, plan[:2000]


def test_ivf_assign_is_shuffle_free(spark, sf_dir):
    """IVF cell assignment must stay a map-only expression: no Exchange,
    no Window in the plan (the whole point of literal broadcast
    centroids)."""
    from sstable_migrator_spark.operators.simsearch import ivf_assign
    from sstable_migrator_spark.plans.explain import _plan
    from sstable_migrator_spark.queries import _t

    emb = _t(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter("vec_id < 4").collect()
    ]
    plan = _plan(ivf_assign(emb, cents))
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan


def test_ivf_probe_join_is_broadcast(spark, sf_dir):
    """The probe-to-cell join must broadcast the probe table — the
    corpus never shuffles before scoring."""
    from sstable_migrator_spark.operators.simsearch import ivf_topk
    from sstable_migrator_spark.plans.explain import has_broadcast_hash_join
    from sstable_migrator_spark.queries import _t
    from pyspark.sql import functions as F

    emb = _t(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter("vec_id < 4").collect()
    ]
    queries = emb.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assert has_broadcast_hash_join(ivf_topk(emb, queries, cents, k=3, n_probe=2))


def test_cluster_conf_scales_with_fleet():
    """cluster_conf is the documented 100 TB deployment contract:
    partition counts track the fleet size, split/broadcast sizing is
    fixed at the engine's layout constants."""
    from sstable_migrator_spark.session import cluster_conf

    c = cluster_conf(executors=1000, cores_per_executor=4)
    assert c["spark.sql.shuffle.partitions"] == str(2 * 1000 * 4)
    assert c["spark.sql.files.maxPartitionBytes"] == "134217728"
    assert c["spark.sql.adaptive.enabled"] == "true"
    small = cluster_conf(executors=10, cores_per_executor=8)
    assert small["spark.sql.shuffle.partitions"] == str(2 * 10 * 8)
    # every value must be a string (spark-submit --conf form)
    assert all(isinstance(v, str) for v in c.values())


def test_q6_shape_pushdown_and_no_shuffle(spark, sf_dir):
    """TPC-H Q6 (q114): all three predicates must reach the parquet
    scan and the plan must contain NO hash-partitioned exchange — a
    pure scan + partial/final agg pipeline."""
    df = Q.q_forecast_revenue(spark, sf_dir)
    plan = explain._plan(df)
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:400]
    assert "Exchange hashpartitioning" not in plan


def test_q19_or_block_stays_broadcast_hash(spark, sf_dir):
    """TPC-H Q19 (q124): the OR-of-ANDs must ride as a residual on the
    partkey BroadcastHashJoin, never degrade to a nested-loop or
    cartesian plan."""
    df = Q.q_or_predicate_revenue(spark, sf_dir)
    plan = explain._plan(df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q13_exchange_budget(spark, sf_dir):
    """TPC-H Q13 (q120): per-customer count + histogram + ordered output
    must cost at most 3 exchanges in the FINAL (AQE) plan — the
    per-customer aggregation must never add an exchange beyond the join
    partitioning."""
    from sstable_migrator_spark.plans.report import plan_stats

    stats = plan_stats(Q.q_customer_distribution(spark, sf_dir))
    assert stats["shuffles"] <= 3, stats


def test_plan_audit_roundrobin_and_single_partition_allowlist():
    """Audit guard over PLANS.md (regenerated per round): a keyless
    round-robin exchange is allowed ONLY in queries that stage the
    documents scan through the documented `_dense` local-bench fan-out
    (queries.py), and an unpartitioned ordered Window (whole input
    through one task) ONLY in the queries whose window input is
    a bounded rollup (per-day / per-source aggregates). Any other
    occurrence is a scale regression, not a style issue. Also fails if
    PLANS.md is stale (missing a catalog query)."""
    import inspect
    import os
    import re

    plans_md = os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    rows = {}
    with open(plans_md) as f:
        for ln in f:
            m = re.match(r"\| (q\w+) \| (\d+) \| (\d+) \| (\d+) \| (\d+) \|", ln)
            if m:
                rows[m.group(1)] = {
                    "shuffles": int(m.group(2)),
                    "roundrobin": int(m.group(3)),
                    "single": int(m.group(4)),
                    "unpart_windows": int(m.group(5)),
                }
    assert len(rows) > 100, "PLANS.md missing or truncated"

    missing = [n for n in Q.QUERIES if n not in rows]
    assert not missing, f"PLANS.md is stale — regenerate (missing {missing[:5]})"

    # the bounded scalar windows: per-day rolling revenue, the
    # Hamilton-quota ranking over per-source totals, median+MAD over the
    # per-day rollup (2 medians ride the same bounded input), the drift
    # monitor's grand total over the days x types cell relation, and the
    # quantile sketch's cumulative walk over its <= ~1k-bucket state
    uw_allow = {
        "q96_rolling_revenue",
        "q149_budget_allocation",
        "q152_robust_outliers",
        "q176_distribution_drift",
        "q185_quantile_sketch",
        # the perplexity-gate calibration sweep: cumulative over the
        # ~dozens-row surprisal-bucket rollup
        "q231_ppl_threshold_sweep",
        # the near-dup threshold sweep: cumulative docs_touched over
        # the <= 11-row Jaccard-band rollup (100/band_pct + 1 bands)
        "q251_dedup_threshold_sweep",
    }
    bad_uw = {n: r["unpart_windows"] for n, r in rows.items()
              if r["unpart_windows"] and n not in uw_allow}
    assert not bad_uw, f"non-allowlisted unpartitioned windows: {bad_uw}"

    for name, r in rows.items():
        if not r["roundrobin"]:
            continue
        fn = Q.QUERIES.get(name)
        assert fn is not None and "_dense(" in inspect.getsource(fn), (
            f"{name}: round-robin exchange outside the _dense allowlist"
        )


def test_collect_table_stats_feeds_cbo(spark, tmp_path):
    """ANALYZE helper records table + column statistics the CBO reads
    (row counts visible in DESCRIBE EXTENDED; NDV on the analyzed
    column)."""
    from sstable_migrator_spark.session import collect_table_stats

    spark.sql("DROP TABLE IF EXISTS stats_t")
    spark.range(500).selectExpr("id", "id % 7 AS k").write.saveAsTable("stats_t")
    try:
        collect_table_stats(spark, ["stats_t"], columns={"stats_t": ["k"]})
        ext = {r["col_name"]: r["data_type"]
               for r in spark.sql("DESCRIBE EXTENDED stats_t").collect()}
        assert "500 rows" in ext["Statistics"]
        colstats = {r["info_name"]: r["info_value"]
                    for r in spark.sql("DESCRIBE EXTENDED stats_t k").collect()}
        assert colstats.get("distinct_count") == "7"
    finally:
        spark.sql("DROP TABLE stats_t")
