"""Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Appendix A) — the
most-cited published document-quality rule set, implemented
FLAG-FOR-FLAG so a user can reproduce the paper's filtering exactly
and audit which rule fired:

1. word count in [min_words, max_words] (paper: 50..100,000);
2. mean word length in [3, 10] characters;
3. symbol-to-word ratio ('#' or ellipsis) <= 0.1;
4. <= 90%... precisely: at most 10% of lines may START with a bullet;
5. at most 30% of lines may END with an ellipsis;
6. >= 80% of words contain at least one alphabetic character;
7. at least 2 DISTINCT members of the 8-word English stop set
   (the, be, to, of, and, that, have, with) appear.

Every threshold is an INTEGER cross-multiplied comparison (10 *
symbols <= words, 5 * alpha_words >= 4 * words, ...) — no float
ratios, so the flags are order-free and hash-exact against the SQL
oracle, and the whole operator is a map-side projection (zero
shuffles at any corpus size). Ellipsis counts cover both the unicode
character and the three-dot form.

Reference analog: the P-family validity gates (SURVEY §2 P3-P7) —
row-level accept/reject predicates — applied to documents instead of
domain names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sstable_migrator_spark.functions import text as TX

__all__ = ["gopher_quality_flags", "GOPHER_STOP_SET"]

GOPHER_STOP_SET = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _count_occurrences(col: Column, sub: str) -> Column:
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(sub), F.lit(""))))
        / len(sub)
    ).cast("long")


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100000,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document Gopher rule flags (1 = passes the rule) plus the
    integer counters behind them and the overall ``keep`` conjunction.
    Pure projection — composes into the streaming admission gate and
    the batch funnel alike. ``keep_cols`` carries extra input columns
    through (e.g. the apex for a per-domain gate rollup, or the text
    for further gates downstream) so the whole flag ensemble stays one
    map-side select."""
    text = F.col(text_col)
    toks = TX.tokens(text)
    n_words = F.size(toks).cast("long")
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_symbols = (
        _count_occurrences(text, "#")
        + _count_occurrences(text, "…")
        + _count_occurrences(text, "...")
    )
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).startswith("•")
            | F.trim(ln).startswith("- ")
            | F.trim(ln).startswith("* "),
        )
    ).cast("long")
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).endswith("…")
            | F.trim(ln).endswith("..."),
        )
    ).cast("long")
    alpha_words = F.size(
        F.filter(toks, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in GOPHER_STOP_SET]),
        )
    ).cast("long")

    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        # 3 <= mean <= 10  <=>  3n <= total_chars <= 10n (integer form)
        "ok_mean_word_len": (total_chars >= 3 * n_words)
        & (total_chars <= 10 * n_words),
        "ok_symbol_ratio": n_symbols * 10 <= n_words,
        "ok_bullet_lines": bullet_lines * 10 <= n_lines,
        "ok_ellipsis_lines": ellipsis_lines * 10 <= n_lines * 3,
        "ok_alpha_words": alpha_words * 5 >= n_words * 4,
        "ok_stop_words": stop_hits >= 2,
    }
    out = docs.select(
        id_col,
        *(keep_cols or []),
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        *[c.cast("int").alias(name) for name, c in flags.items()],
    )
    keep = None
    for name in flags:
        term = F.col(name) == 1
        keep = term if keep is None else keep & term
    return out.withColumn("keep", keep.cast("int"))
