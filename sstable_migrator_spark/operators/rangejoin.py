"""Generic point-in-interval join for the case the broadcast trick can't
cover: the range table is too large to broadcast.

The naive formulation — ``points JOIN ranges ON p BETWEEN lo AND hi`` —
has no equi-key, so Spark plans a (Broadcast)NestedLoopJoin: O(|P|x|R|)
comparisons, catastrophic at scale. The standard fix is bucketing BOTH
sides on a shared grid:

- every point lands in bucket ``floor(p / width)``;
- every range is exploded to the buckets it overlaps (factor
  ``span/width + 1`` rows, on the RANGE side only);
- the join becomes equi on the bucket + a residual BETWEEN filter, so
  Catalyst plans a shuffled hash / sort-merge join co-partitioned on the
  bucket — both sides shuffle once, no broadcast needed.

Pick ``bucket_width`` near the median range span: too small multiplies
the range side, too large multiplies residual comparisons per bucket.
This generalizes the /8-bucketed GeoIP join (operators.ingest) to
arbitrary numeric intervals and non-broadcastable range tables
(ingest's version keeps the broadcast because GeoIP dims are tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every range row with
    ``start_col <= point_col <= end_col`` (inclusive bounds).

    ``how`` supports 'inner' and 'left' (left keeps pointless points
    with NULL range columns). Output: all point columns + all range
    columns (minus the helper bucket).
    """
    if how not in ("inner", "left"):
        raise ValueError("interval_join supports how='inner'|'left'")
    bw = float(bucket_width)
    if not bw > 0:
        # 0 would floor x/0.0 = Inf into one universal bucket — the
        # per-key cross join this operator exists to avoid
        raise ValueError(f"bucket_width must be > 0, got {bucket_width!r}")
    p = points.withColumn("_ib", F.floor(F.col(point_col) / bw))
    r = ranges.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bw), F.floor(F.col(end_col) / bw)
            )
        ),
    )
    cond = (
        (p["_ib"] == r["_ib"])
        & (p[point_col] >= r[start_col])
        & (p[point_col] <= r[end_col])
    )
    return p.join(r, cond, how).drop("_ib")
