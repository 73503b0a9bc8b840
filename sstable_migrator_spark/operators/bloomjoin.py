"""Bloom-filter semi-join prefiltering (runtime row-level filtering).

The shuffle-reduction move for a semi join whose key set is too big to
broadcast as a hash table but whose MEMBERSHIP fits in megabytes: build
a bloom filter over the small side's keys (distributed — the bit array
is assembled with a bit_or aggregation, the driver only ever sees
O(m/64) words), probe it map-side on the big side BEFORE the shuffle,
and let the exact semi join run on the survivors. False positives just
ride to the exact join (which removes them); false negatives cannot
happen, so the composition is EXACTLY a semi join — that is what the
q171 oracle pins.

Execution shape: the k hash positions are computed JVM-side
(``xxhash64`` columns, whole-stage codegen); the bit probe is a
closure-broadcast numpy array indexed in an Arrow-batched pandas UDF
(the simsearch ADC-LUT pattern — vectorized fancy-indexing, not
per-row Python). At 100 TB: 100M keys at 1% fpp is a ~120 MB bit
array — the same ballpark Spark's own InjectRuntimeFilter caps at —
and the probe drops the big side's shuffle volume by the key-set
selectivity, which is the entire point: rows that cannot match never
enter the exchange.

Spark 3.3+ injects bloom runtime filters for some join shapes on its
own; this operator is the explicit, composable form — usable on
streams, before applyInPandas stages, or with a persisted filter
reused across jobs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["build_bloom", "bloom_might_contain", "bloom_semi_join"]


def _params(n: int, fpp: float) -> tuple[int, int]:
    if not 0 < fpp < 1:
        raise ValueError("fpp must be in (0, 1)")
    n = max(n, 1)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _positions(col: Column, m: int, k: int) -> Column:
    """k bloom positions per key, computed JVM-side: pmod(xxhash64(key,
    seed), m). array<long>."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(s)), F.lit(m)) for s in range(k)]
    )


def build_bloom(
    small: DataFrame, key: str, fpp: float = 0.01, n_keys: int | None = None
) -> dict:
    """Distributed bloom build over ``small[key]``: explode the k
    positions, fold them into 64-bit words with ``bit_or`` (one
    shuffle of at most m/64 rows), collect the words. Returns
    ``{"bits": np.uint64[m/64], "m": m, "k": k, "n_keys": n}``.
    NULL keys are ignored (a semi join never matches NULL anyway)."""
    keys = (
        small.select(F.col(key).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .distinct()  # one pass feeds BOTH the count and the bit build —
        # hashing duplicate keys would just re-set the same bits while
        # exploding k positions per duplicate into the shuffle
    )
    n = n_keys if n_keys is not None else keys.count()
    m, k = _params(n, fpp)
    words = (
        keys.select(F.explode(_positions(F.col("_k"), m, k)).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            # F.shiftleft takes only a literal shift; the SQL form shifts
            # by a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    bits = np.zeros((m + 63) // 64, dtype=np.uint64)
    for r in words:
        bits[int(r["w"])] = np.uint64(r["word"] % (1 << 64))
    return {
        "bits": bits,
        "m": m,
        "k": k,
        "n_keys": n,
        # the probe side MUST hash the same type: xxhash64('5') !=
        # xxhash64(5), and a plain semi join would have coerced the
        # comparison — a silent type mismatch here means FALSE NEGATIVES
        "dtype": small.schema[key].dataType.simpleString(),
    }


def bloom_might_contain(bloom: dict, key_col: Column | str) -> Column:
    """Boolean probe column: TRUE when every one of the key's k bloom
    bits is set (i.e. the key MIGHT be in the set; definitely-absent
    keys are FALSE). NULL keys probe FALSE.

    The k positions arrive as k SEPARATE long columns (not one array
    column): Arrow hands the UDF contiguous int64 buffers, where an
    array column materializes a Python list per row and the np.stack
    over those object arrays dominated the probe wall time."""
    bits = bloom["bits"]
    m, k = bloom["m"], bloom["k"]

    @pandas_udf("boolean")
    def _probe(*pos_cols: pd.Series) -> pd.Series:
        ok: np.ndarray | None = None
        for s in pos_cols:
            arr = s.to_numpy(np.int64)
            word = bits[arr // 64]
            bit = np.uint64(1) << (arr % 64).astype(np.uint64)
            hit = (word & bit) != 0
            ok = hit if ok is None else (ok & hit)
        return pd.Series(ok)

    col = F.col(key_col) if isinstance(key_col, str) else key_col
    # NULL keys: the outer when() forces FALSE; coalescing the position
    # to 0 just keeps the UDF input non-null (int64-packable)
    pos_cols = [
        F.coalesce(F.pmod(F.xxhash64(col, F.lit(s)), F.lit(m)), F.lit(0))
        for s in range(k)
    ]
    return F.when(col.isNull(), F.lit(False)).otherwise(_probe(*pos_cols))


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    fpp: float = 0.01,
    bloom: dict | None = None,
) -> DataFrame:
    """EXACT left-semi join with a bloom prefilter: rows of ``big``
    whose key is provably absent from ``small`` are dropped MAP-SIDE
    before the semi join's shuffle; false positives are removed by the
    exact join. Pass a prebuilt ``bloom`` to reuse one filter across
    several joins/jobs."""
    if bloom is None:
        # pin the distinct key set ONCE: it feeds the size count, the
        # bit build, and the exact semi join — without the checkpoint
        # the small side's whole subtree re-executes for each of the
        # three jobs
        small = small.select(on).distinct().localCheckpoint()
        bl = build_bloom(small, on, fpp, n_keys=small.count())
    else:
        bl = bloom
    big_t = big.schema[on].dataType.simpleString()
    if bl.get("dtype") is not None and big_t != bl["dtype"]:
        raise ValueError(
            f"key type mismatch: big[{on!r}] is {big_t}, bloom was built "
            f"over {bl['dtype']} — xxhash64 hashes the raw type, so the "
            "prefilter would FALSE-NEGATIVE rows the coerced semi join "
            "matches; cast one side explicitly first"
        )
    pre = big.filter(bloom_might_contain(bl, on))
    return pre.join(small.select(on).distinct(), on, "left_semi")
