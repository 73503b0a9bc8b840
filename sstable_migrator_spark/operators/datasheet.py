"""One-call corpus DATASHEET — the "datasheets for datasets" summary a
data release ships and an acquisition review reads first.

Reference analog: the run-log / notify rollups (App.java's per-batch
counters) generalized to the corpus itself. One call returns a single
bounded LONG-FORMAT table (section, key, metric, value) covering:

- ``total``    — docs, whitespace tokens, chars (one rollup);
- ``lang`` / ``source`` — the mixture: per-group docs + tokens (the
  same shares ``expectations.mixture_drift_report`` watches over time);
- ``len_hist`` — token-count histogram in fixed-width bands (floor
  division, cross-engine exact), the padding/packing planner's input;
- ``dup_hist`` — exact-duplicate MULTIPLICITY histogram: how many
  fingerprint groups have k copies (k=1 = unique) — the dedup dial
  that says whether soft-dedup weights or hard dedup is warranted;
- ``dup``      — exact_dup_docs: rows a hard exact dedup would drop;
- ``quality``  — natural_docs under the integer English-naturalness
  judge (>= 10 tokens, stopwords >= 1/8 — q247's label, exact).

Everything is BIGINT (counts and integer bands only — no floats means
the whole sheet hash-matches a SQL twin). Plan shape: five keyed
rollups (one scan each; the dup histogram is the only data-sized
shuffle — the fingerprint exchange exact dedup already pays), each
collapsing to a bounded row set (|langs| + |sources| + |bands| +
|multiplicities| + 5), then a union of bounded sides. Nothing
doc-sized reaches the driver; at 100 TB each section is a map-side
partial aggregation over a column-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_datasheet"]


def corpus_datasheet(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    len_bucket_width: int = 64,
) -> DataFrame:
    """The one-call datasheet (module docstring). Returns
    ``(section string, key string, metric string, value long)``;
    ``key`` is '' for scalar sections, the group value for mixtures,
    the band's lower bound for histograms (as a string key, so one
    schema fits every section)."""
    from sstable_migrator_spark.functions import text as TX

    w = int(len_bucket_width)
    if w <= 0:
        raise ValueError(f"len_bucket_width must be positive, got {w}")
    tk = TX.tokens(F.col(text_col))
    base = docs.select(
        F.col(lang_col).alias("_lang"),
        F.col(source_col).alias("_src"),
        F.size(tk).cast("long").alias("_toks"),
        F.length(text_col).cast("long").alias("_chars"),
        TX.fingerprint(F.col(text_col)).alias("_fp"),
        (
            (F.size(tk) >= 10)
            & (
                8
                * F.size(
                    F.filter(
                        F.transform(tk, F.lower),
                        lambda x: x.isin(*TX.DEFAULT_STOPWORDS),
                    )
                )
                >= F.size(tk)
            )
        )
        .cast("long")
        .alias("_nat"),
    )

    def row(section, key, metric, value):
        return F.struct(
            F.lit(section).alias("section"),
            key.cast("string").alias("key"),
            F.lit(metric).alias("metric"),
            value.cast("long").alias("value"),
        )

    total = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_toks").alias("_t"),
        F.sum("_chars").alias("_c"),
        F.sum("_nat").alias("_q"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("_fp"))).alias("_d"),
    ).select(
        F.explode(
            F.array(
                row("total", F.lit(""), "docs", F.col("_n")),
                row("total", F.lit(""), "tokens", F.col("_t")),
                row("total", F.lit(""), "chars", F.col("_c")),
                row("quality", F.lit(""), "natural_docs", F.col("_q")),
                row("dup", F.lit(""), "exact_dup_docs", F.col("_d")),
            )
        ).alias("r")
    ).select("r.*")

    def mixture(col, section):
        g = base.groupBy(F.col(col).alias("_k")).agg(
            F.count(F.lit(1)).alias("_n"), F.sum("_toks").alias("_t")
        )
        return g.select(
            F.explode(
                F.array(
                    row(section, F.col("_k"), "docs", F.col("_n")),
                    row(section, F.col("_k"), "tokens", F.col("_t")),
                )
            ).alias("r")
        ).select("r.*")

    len_hist = (
        base.groupBy(((F.col("_toks") - F.col("_toks") % w) / w)
                     .cast("long").alias("_b"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            row("len_hist", F.col("_b") * w, "docs", F.col("_n")).alias("r")
        )
        .select("r.*")
    )
    # fingerprint groups -> group sizes -> how many groups of each size
    dup_hist = (
        base.groupBy("_fp")
        .agg(F.count(F.lit(1)).alias("_k"))
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(row("dup_hist", F.col("_k"), "groups", F.col("_n")).alias("r"))
        .select("r.*")
    )
    return (
        total.unionByName(mixture("_lang", "lang"))
        .unionByName(mixture("_src", "source"))
        .unionByName(len_hist)
        .unionByName(dup_hist)
    )
