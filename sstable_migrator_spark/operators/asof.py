"""As-of (point-in-time) join — a time-series operator Spark lacks as a
built-in, expressed as the canonical union-window composition.

For each left row, attach the columns of the LAST right row with the
same key and ``right_ts <= left_ts`` (backward as-of, exact matches
allowed). The naive formulation — non-equi theta join + per-left top-1 —
explodes to O(|L| x |R|) per key before pruning; this implementation
never joins at all:

1. union the two (tagged) streams on (key, ts),
2. one window per key ordered by (ts, side, tie), running
   ``last(value, ignorenulls=True)`` carries the most recent right-side
   values forward,
3. keep the left rows.

Cost = ONE shuffle on the key (the same shuffle any per-key operator
pays) + a sort within partitions; no join blow-up, no skew amplification
beyond the key's own row count. This is the 100 TB shape: at scale the
sort rides the shuffle (Spark sorts shuffle partitions anyway for the
window), and AQE handles moderate key skew.

Determinism: right rows that share a timestamp are resolved by
``tie_col`` (ascending — the LAST one wins), so results are stable and
oracle-checkable against a LATERAL ``ORDER BY ts DESC, tie DESC LIMIT
1`` subquery.

The reference has no as-of join (SURVEY §2.5 notes J2/J3 are its only
non-trivial joins); this operator is part of the training-data-pipeline
extension surface (event-stream enrichment: attach the most recent
profile snapshot / model score / session state to each event).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tie_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (exact timestamp matches allowed), both directions.

    ``backward`` (default): every ``left`` row gets ``value_cols`` from
    the LATEST right row at or before its timestamp. ``forward``: from
    the EARLIEST right row at or after it. NULLs when none exists.
    ``tie_col`` (a right-side column, default the first value col)
    breaks right-side timestamp ties: the greatest value wins.

    Single-shuffle in either direction — the union-window trick sorts
    once per key; direction only flips the timestamp ordering.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    if not value_cols:
        raise ValueError(
            "right side carries no value columns beyond the key and "
            "timestamp; pass value_cols (or tie_col) explicitly"
        )
    tie = tie_col or value_cols[0]

    # the right row rides as ONE struct so all carried columns come from
    # the SAME right row even when some of its value columns are NULL
    l_tag = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tie].dataType).alias("_tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols)
            + ">"
        )
        .alias("_r"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tie).alias("_tie"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )

    # rights sort before lefts at equal ts (exact match allowed); among
    # equal-ts rights the greatest tie_col lands closest to the left row.
    # forward = the same scan over a reversed timestamp order: the "last
    # preceding" right in descending-ts order IS the earliest at-or-after.
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_side").asc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = l_tag.unionByName(r_tag).select(
        "*", F.last(F.col("_r"), ignorenulls=True).over(w).alias("_c")
    )

    out_left = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    # SQL equality never matches NULL keys, but Window.partitionBy
    # groups NULLs into one partition — mask the carried struct so a
    # NULL-key left row yields NULLs like the LATERAL-subquery oracle
    carried = F.when(F.col(on).isNotNull(), F.col("_c"))
    out_right = [carried.getField(c).alias(f"right_{c}") for c in value_cols]
    return tagged.filter(F.col("_side") == 1).select(*out_left, *out_right)
