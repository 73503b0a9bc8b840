"""Mergeable quantile sketch with integer log bucketing (the fourth
member of the mergeable-sketch family: HLL approximates distinct-count,
bitmap makes it exact, Count-Min approximates frequency — this
approximates QUANTILES, the percentile readout every data-profiling
pass wants).

DDSketch (Masson et al. 2019) buckets values by ceil(log_gamma(v)) —
a float log. This engine's variant keeps the same
bounded-relative-error contract with NO floating point: a non-negative
integer value v >= 1 lands in bucket ``16*msb(v) + mantissa4(v) + 1``
(binary-string msb + the four bits after it — the identical integer
log2-with-4-bit-mantissa the perplexity filter and BM25 idf use), and
v = 0 gets the reserved bucket 0. Properties:

- **bounded relative error**: bucket width is 2^(msb-4), so a bucket's
  lower bound is within 1/16 = 6.25% (one mantissa step) of any member;
  values below 16 are EXACT (every small integer gets its own bucket).
- **bounded state**: longs occupy at most ~16*63+17 ~ 1025 buckets, so
  the sketch is a tiny (bucket, count) table at ANY data size —
  map-side combined, shuffled as O(1k) rows per partition, mergeable by
  adding counts (union across days/sources/streams like the other
  sketches).
- **deterministic**: no sampling, no randomness — identical input sets
  give identical sketches on any partitioning, and a SQL oracle
  reproduces every bucket bit-for-bit (unlike KLL/t-digest, whose
  compactions randomize).

Quantile extraction walks the cumulative counts over the BOUNDED
bucket relation (an unpartitioned window over <= ~1k rows — the same
allowlisted bounded-scalar-window shape the drift monitor uses) and
reports each requested percentile's bucket lower bound: a guaranteed
UNDER-estimate within one mantissa step of the true quantile, the
deterministic analog of DDSketch's accuracy statement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["log_bucket", "bucket_lower_bound", "quantile_sketch", "sketch_quantiles"]


def log_bucket(v: Column) -> Column:
    """Integer log bucket of a non-negative long: 0 for v = 0, else
    16*msb + 4-bit-left-aligned mantissa + 1. Same binary-string form
    in Spark and DuckDB."""
    b = F.bin(v.cast("long"))
    msb = (F.length(b) - 1).cast("long")

    def bit(i: int) -> Column:
        return (F.substring(b, i, 1) == "1").cast("long")

    frac = bit(2) * 8 + bit(3) * 4 + bit(4) * 2 + bit(5)
    return F.when(v <= 0, F.lit(0)).otherwise(msb * 16 + frac + 1).cast("long")


def bucket_lower_bound(bucket: Column) -> Column:
    """Smallest value in a bucket (exact inverse for v < 16; the
    6.25%-wide bucket floor above). Pure integer bit shifts — a double
    pow-of-two intermediate would lose exactness past 2^53."""
    b = (bucket - 1).cast("long")
    msb = F.floor(b / 16).cast("long")
    frac = F.pmod(b, F.lit(16))
    base = (F.lit(16) + frac).cast("long")
    up = F.call_function("shiftleft", base, (msb - 4).cast("int"))
    down = F.call_function("shiftright", base, (F.lit(4) - msb).cast("int"))
    return F.when(bucket <= 0, F.lit(0)).otherwise(
        F.when(msb >= 4, up).otherwise(down).cast("long")
    )


def quantile_sketch(df: DataFrame, col: str) -> DataFrame:
    """The mergeable sketch state: (bucket, cnt) for a non-negative
    integer column. One hash aggregation with map-side combine; the
    shuffle is O(buckets) per partition regardless of row count."""
    return (
        df.select(log_bucket(F.col(col)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def sketch_quantiles(state: DataFrame, percentiles: list[int]) -> DataFrame:
    """Answer integer percentiles (e.g. [50, 90, 99]) from a sketch
    state: the smallest bucket whose cumulative count reaches
    ceil(pct*n/100), by integer cross-multiply (cum*100 >= pct*n).
    Returns (pct, bucket, est_lo, n) — est_lo is the bucket's lower
    bound, a deterministic under-estimate within one mantissa step.
    The window is over the bounded bucket relation (~1k rows max)."""
    for p in percentiles:
        if not 0 < int(p) <= 100:
            raise ValueError(f"percentile {p} out of (0, 100]")
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = state.select(
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    pcts = state.sparkSession.createDataFrame(
        [(int(p),) for p in sorted(set(int(p) for p in percentiles))], "pct int"
    )
    hit = (
        cum.join(F.broadcast(pcts))
        .filter(F.col("cum") * 100 >= F.col("pct") * F.col("n"))
        .groupBy("pct")
        .agg(F.min("bucket").alias("bucket"), F.max("n").alias("n"))
    )
    return hit.select(
        "pct",
        "bucket",
        bucket_lower_bound(F.col("bucket")).alias("est_lo"),
        F.col("n").cast("long").alias("n"),
    )
