"""Iterative graph algorithms as driver-looped DataFrame jobs.

North-star extension (the reference has no graph surface; its nearest
analog is the apex-popularity rollup, misc/clickhouse_queries.md:35-43).
Connected components (min-label propagation with pointer jumping) lives
in ``operators.dedup.duplicate_clusters``; this module adds PageRank,
the canonical "iterative algorithm on Spark" shape: each iteration is a
pure DataFrame job (join + aggregate = two key-shuffles), the loop runs
on the driver, and lineage is cut with localCheckpoint so plan depth
stays O(1) across iterations instead of O(iters).

Scale notes (100 TB graphs):
- The edge list is the only big table; it is checkpointed ONCE with its
  out-degrees attached, so every iteration shuffles (src-keyed join +
  dst-keyed agg) but never recomputes degrees.
- Rank state is |V| rows (node, rank) — tiny next to |E|. AQE handles
  skewed high-degree dst nodes; for pathological hubs pre-split dst by
  salting the aggregation (sum is algebraic, so partial sums compose).
- Convergence checks (`tol`) cost one extra action per iteration; leave
  tol=None for fixed-iteration production runs (the common choice) and
  the loop runs exactly ``iters`` jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    tol: float | None = None,
) -> DataFrame:
    """Unnormalized PageRank: rank(v) = (1-d) + d * sum_{u->v} rank(u)/deg(u).

    ``edges`` is a directed edge list; duplicate edges are collapsed.
    Returns (node, rank) for every node that appears as a source or a
    destination. Nodes with no in-links keep rank = 1-d. If ``tol`` is
    given, stops early when the summed absolute rank change drops below
    it (costs one count-style action per iteration).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # one checkpointed (src, dst, od) table: every iteration reuses it
    ed = e.join(deg, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))

    for _ in range(iters):
        contribs = (
            ed.join(ranks, ed.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("od")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("mass"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        if tol is not None:
            delta = (
                new_ranks.alias("n")
                .join(ranks.alias("o"), "node")
                .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
                .first()["d"]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks
