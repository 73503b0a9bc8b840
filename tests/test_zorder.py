"""Z-order layout: quantitative proof that Morton interleaving tightens
per-file min/max stats on EVERY layout column, where a linear sort only
tightens its leading column — the footer-stats pruning win that matters
at 100 TB."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sstable_migrator_spark.sinks import zorder_value, zorder_write


def _file_stats_width(path: str, col: str, lo: float, hi: float) -> float:
    """Mean normalized (min,max) width of `col` across the files."""
    import glob

    widths = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            c = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            mins.append(c.statistics.min)
            maxs.append(c.statistics.max)
        widths.append((max(maxs) - min(mins)) / (hi - lo))
    return sum(widths) / len(widths)


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    got = df.select(zorder_value([F.col("x"), F.col("y")], bits=3).alias("z")).first()["z"]
    # x bits -> even positions, y bits -> odd: x=101, y=011
    # z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 | y2<<5
    want = (1 << 0) | (1 << 1) | (0 << 2) | (1 << 3) | (1 << 4) | (0 << 5)
    assert got == want, (got, want)


def test_zorder_layout_tightens_both_columns(spark, tmp_path):
    # two independent uniform dimensions
    n = 4096
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % n).alias("a"),
        (F.col("id") * 40503 % n).alias("b"),
    )
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    (
        df.repartitionByRange(8, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zorder_write(df, zord, ["a", "b"], n_files=8, bits=12)

    lin_a = _file_stats_width(linear, "a", 0, n - 1)
    lin_b = _file_stats_width(linear, "b", 0, n - 1)
    z_a = _file_stats_width(zord, "a", 0, n - 1)
    z_b = _file_stats_width(zord, "b", 0, n - 1)

    # linear: a tight, b full-width. z-order: both mid-width.
    assert lin_b > 0.9, lin_b
    assert z_a < 0.6 and z_b < 0.6, (z_a, z_b)
    # the COMBINED prunability (sum of widths) must beat linear sort
    assert z_a + z_b < lin_a + lin_b, (z_a, z_b, lin_a, lin_b)


def test_zorder_bits_overflow_guard():
    import pytest
    from pyspark.sql import functions as F

    from sstable_migrator_spark.sinks import zorder_value

    with pytest.raises(ValueError, match="63"):
        zorder_value([F.col(c) for c in "abcdef"], bits=12)  # 72 bits > long
