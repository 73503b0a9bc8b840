"""Stream-stream joins with event-time constraints.

Structured Streaming can join two unbounded streams only when the
engine can bound its buffered state; that bound comes from (a) a
watermark on both sides and (b) an event-time constraint in the join
condition. With those, each side's state store keeps only rows young
enough to still find a partner, and rows age out exactly when the
watermark passes ``ts + max_delay``.

The reference has no stream joins (its pipelines are daily file
batches), so this is extension surface: the canonical use is
click-to-conversion attribution — join each purchase to the click that
preceded it within an attribution window, while both arrive as live
streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
    right_watermark: str | None = None,
) -> DataFrame:
    """Join streaming ``right`` rows to streaming ``left`` rows with the
    same key(s) where ``left_ts <= right_ts <= left_ts + max_delay``.

    Both inputs must be streaming DataFrames. State per side is bounded
    by its watermark + ``max_delay`` — the time-range condition is what
    lets Spark derive each side's state-eviction predicate; an
    equality-only stream-stream join has no such bound and its state
    grows forever. ``on`` may be one key or a composite key list;
    ``right_watermark`` overrides the right side's lateness bound when
    the two streams have different delivery delays. The output carries
    all columns of both sides minus the right-side key duplicates (the
    caller projects). ``how`` may be 'inner' or 'leftOuter' (outer
    rows emit once their side's watermark proves no partner can
    arrive).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("on must name at least one join column")
    if how not in ("inner", "leftOuter"):
        raise ValueError("how must be inner|leftOuter")
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must be distinct names: a condition "
            "join keeps both sides' columns and the caller could not "
            "disambiguate two identical timestamp names"
        )
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both sides; "
            "rename them before joining (ambiguous output)"
        )
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = right.withWatermark(right_ts, right_watermark or watermark)
    cond = None
    for k in keys:
        c = l_wm[k] == r_wm[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (r_wm[right_ts] >= l_wm[left_ts])
        & (r_wm[right_ts] <= l_wm[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    # keep ONE copy of each key column: a condition join would emit both
    # sides' keys under the same names and make every select ambiguous
    out = l_wm.join(r_wm, cond, how)
    for k in keys:
        out = out.drop(r_wm[k])
    return out


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a stream against a batch dimension
    (the streaming twin of the GeoIP/TLD broadcast joins, SURVEY
    J1-J3). The static side is re-planned each micro-batch, so a
    slowly-changing dim picks up updates between batches WITHOUT
    restarting the query — the standard pattern for dimension freshness
    in long-running pipelines. Stateless (no watermark needed): each
    batch row joins and leaves, nothing accumulates."""
    return stream.join(F.broadcast(dim), on, how)
