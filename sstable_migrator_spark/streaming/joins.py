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
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join streaming ``right`` rows to streaming ``left`` rows with the
    same key where ``left_ts <= right_ts <= left_ts + max_delay``.

    Both inputs must be streaming DataFrames. State per side is bounded
    by ``watermark`` + ``max_delay``; the output carries all columns of
    both sides (the caller projects). ``how`` may be 'inner' or
    'leftOuter' (outer rows emit once their side's watermark proves no
    partner can arrive).
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must be distinct names: a condition "
            "join keeps both sides' columns and the caller could not "
            "disambiguate two identical timestamp names"
        )
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = right.withWatermark(right_ts, watermark)
    cond = (
        (l_wm[on] == r_wm[on])
        & (r_wm[right_ts] >= l_wm[left_ts])
        & (r_wm[right_ts] <= l_wm[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    # keep ONE key column: a condition join would emit both sides' `on`
    # under the same name and make every downstream select ambiguous
    return l_wm.join(r_wm, cond, how).drop(r_wm[on])


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
