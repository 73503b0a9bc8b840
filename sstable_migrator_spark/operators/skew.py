"""Skew-mitigation operators (100 TB scale path).

A hot key (one domain, one user, one LSH bucket holding 1% of 100 TB)
turns a shuffle into a single straggler task. AQE's skew-join split
handles sort-merge joins at runtime; these helpers cover the cases AQE
does not: hot-key *aggregation* fan-in and broadcast-ineligible joins
where one side must be salted explicitly. All salts are HASH-derived
(deterministic) so results stay oracle-checkable — never rand().

Reference relevance: the reference's hottest keys are apex domains
(millions of subdomains under one apex, SURVEY A2) and /8 ip blocks
(one partition key per /8, SURVEY §1.1) — both are exactly the
hot-aggregation shape handled here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_expr(cols: list[str | Column], buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of distinguishing
    columns (NOT the group key — salt must vary within a group)."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int")


def salted_count(
    df: DataFrame, keys: list[str], salt_cols: list[str], buckets: int = 16
) -> DataFrame:
    """Two-stage count: groupBy(keys + salt) partial, then combine on
    keys. Result identical to ``groupBy(keys).count()``; the first
    shuffle spreads each hot key over ``buckets`` reducers so no task
    receives a whole hot key. (For plain counts Spark's map-side partial
    aggregation usually suffices — reach for this when the partial agg
    is defeated, e.g. high group cardinality per mapper.)"""
    part = (
        df.withColumn("_salt", salt_expr(salt_cols, buckets))
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return part.groupBy(*keys).agg(F.sum("_c").alias("n"))


def salted_distinct_count(
    df: DataFrame, keys: list[str], distinct_col: str
) -> DataFrame:
    """Exact COUNT(DISTINCT x) per key without funneling a hot key's
    whole value set through one reducer: dedup on (key, x) first — that
    shuffle is spread by x — then count per key. The classic two-phase
    expansion of count-distinct."""
    return (
        df.select(*keys, distinct_col)
        .dropDuplicates([*keys, distinct_col])
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_cols: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys and ``small`` is too large
    to broadcast: big rows get a deterministic salt, small rows are
    replicated once per bucket (explode of a literal range), and the
    join key becomes (key, salt) — a hot key now lands on ``buckets``
    tasks instead of one. Output equals ``big.join(small, key, how)``
    for 1:N joins (small unique on key).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full outer is WRONG under replication: every unmatched
        # small-side replica would emit once PER BUCKET
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError("input already has a _salt column")
    b = big.withColumn("_salt", salt_expr(salt_cols, buckets))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def combine_recommendation(preflight: str, measured_faster: str) -> str:
    """Fold a ``skew_report`` threshold recommendation together with a
    measured salted-vs-unsalted A/B: salt ONLY when the hot-ratio
    threshold says salt AND the measurement confirms salting didn't
    lose (on many skews AQE's runtime skew-join split already absorbs
    the hot key, making the salting round-trip pure overhead — the
    round-5 bench measured exactly that). Otherwise fall back to 'aqe'
    when any skew was flagged, 'none' when the keys are flat."""
    if preflight == "salt" and measured_faster == "salted":
        return "salt"
    if preflight in ("salt", "aqe"):
        return "aqe"
    return "none"


def skew_report(df: DataFrame, cols: list[str], top: int = 5) -> dict:
    """Key-skew diagnostic for a planned groupBy/join key: one per-key
    rollup (map-side partial aggregation, a single shuffle of key +
    count), then a tiny second agg + top-N — the measurement that
    decides BETWEEN the tools in this module before any expensive job
    runs. Returns total rows, distinct keys, max/mean key share, the
    ``top`` hottest keys, and the recommendation the numbers imply:

    - hot key > 20x the mean -> 'salt' (a single key dominates; AQE
      splits partitions, not keys — salted_count/salted_join apply);
    - > 4x -> 'aqe' (partition-level skew; AQE's skew-join split and
      coalescing absorb it);
    - else 'none'.

    Driver-side result is O(top) — safe at any scale."""
    # persist the rollup: the stats agg and the top-N are two actions,
    # and without the pin the second would re-run the full upstream
    # scan + shuffle — the opposite of a cheap pre-flight measurement
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n")).persist()
    try:
        stats = counts.agg(
            F.sum("n").alias("total"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").alias("max_n"),
        ).collect()[0]
        total = int(stats["total"] or 0)
        n_keys = int(stats["n_keys"] or 0)
        max_n = int(stats["max_n"] or 0)
        mean = total / n_keys if n_keys else 0.0
        hot = [
            {"key": tuple(r[c] for c in cols), "rows": int(r["n"]),
             "share": int(r["n"]) / total if total else 0.0}
            for r in counts.orderBy(F.desc("n"), *cols).limit(top).collect()
        ]
    finally:
        counts.unpersist()
    ratio = max_n / mean if mean else 0.0
    rec = "salt" if ratio > 20 else ("aqe" if ratio > 4 else "none")
    return {
        "total_rows": total,
        "distinct_keys": n_keys,
        "mean_rows_per_key": mean,
        "max_rows_per_key": max_n,
        "hot_ratio": ratio,
        "hot_keys": hot,
        "recommendation": rec,
    }
