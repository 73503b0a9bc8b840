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

__all__ = [
    "c4_clean",
    "dedup_lines",
    "gopher_quality_flags",
    "repetition_flags",
    "GOPHER_STOP_SET",
]

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


# --- the REPETITION half of the MassiveText table ---------------------------

# gram-join marker. Whitespace tokenization does NOT guarantee its
# absence inside tokens (\x01 is not whitespace), so repetition_flags
# strips C0 control characters from the text first — otherwise two
# distinct same-k n-grams could concat_ws to one string and merge
# their counts (and corrupt gram_chars) on adversarial input.
_SEP = "\x01"
# C0 controls minus \t \n \x0b \x0c \r (those are whitespace: they
# shape token/line boundaries and must survive to the splits)
_CTRL_RE = "[\\x00-\\x08\\x0e-\\x1f\\x7f]"

# (flag name, numerator, denominator): metric * den <= total * num
# encodes "fraction <= num/den" with integers only. Thresholds are the
# published MassiveText values (Rae et al. 2021, Table A1).
_LINE_PARA_RULES = {
    "ok_dup_line_frac": (3, 10),     # <= 0.30
    "ok_dup_para_frac": (3, 10),     # <= 0.30
    "ok_dup_line_chars": (1, 5),     # <= 0.20
    "ok_dup_para_chars": (1, 5),     # <= 0.20
}
_TOP_NGRAM_RULES = {2: (1, 5), 3: (9, 50), 4: (4, 25)}       # .20 .18 .16
_DUP_NGRAM_RULES = {
    5: (3, 20), 6: (7, 50), 7: (13, 100), 8: (3, 25), 9: (11, 100),
    10: (1, 10),
}  # .15 .14 .13 .12 .11 .10


def _frac_ok(value, total, rule: tuple[int, int]):
    num, den = rule
    return (value * den <= total * num).cast("int")


def repetition_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The REPETITION rules of Rae et al. 2021 Table A1 — the other
    half of the published Gopher filter (``gopher_quality_flags`` is
    the quality half, q80 the word-level fractions): duplicate
    line/paragraph fractions and their character fractions, the
    top-{2,3,4}-gram character fraction, and the duplicated-
    {5..10}-gram character fraction, each against the paper's
    threshold and each an INTEGER cross-multiplied comparison — no
    float ratio anywhere, so every flag is hash-exact cross-engine.

    Definitions (stated because the paper leaves room):
    - duplicate line/para fraction = (n - n_distinct) / n — the extra
      copies beyond each value's first occurrence;
    - their char fraction = chars in those extra copies / total
      line (para) chars;
    - top n-gram char fraction = count * gram_chars of the most
      frequent word n-gram / total WORD chars (ties break
      deterministically on (count, gram_chars, gram));
    - dup n-gram char fraction = chars of words covered by the UNION
      of all occurrences of n-grams appearing >= 2 times (no double
      counting — the interval-union fold) / total word chars.
    Chars are TOKEN characters (whitespace excluded), the exact form
    the oracle replays.

    Scale shape: line/para metrics are map-only array expressions; the
    n-gram side explodes (k, pos, gram) rows for all nine k in ONE
    pass (~9 rows per word), aggregates on (id, k, gram) — one
    data-sized shuffle — then one bounded per-(id, k) rollup: the
    top-gram argmax is a max(struct), the coverage union is a fold
    over that gram-size's duplicated positions (O(dup occurrences)
    per doc). Two shuffles total + the final assembly joins on id.

    CONSTRUCTION NOTE: the expression-dense sections build through
    ``selectExpr``/``F.expr`` SQL strings — one py4j round trip each —
    instead of thousands of Column calls. The q213 plan previously
    spent seconds of pure driver time in py4j socket round trips
    (measured: ~1.9k calls, the dominant share of the bench entry's
    fixed term); the SQL strings parse JVM-side into the SAME analyzed
    plan (oracle- and plan-test-pinned)."""
    top_ks = sorted(_TOP_NGRAM_RULES)
    dup_ks = sorted(_DUP_NGRAM_RULES)
    all_ks = [*top_ks, *dup_ks]

    # strip non-whitespace control characters up front: they are never
    # legitimate word characters, and \x01 inside a token would collide
    # with the gram separator (see _SEP). Tokens, char counts, and
    # line/para metrics all measure the same cleaned text, and the SQL
    # oracle applies the identical replace
    # (stripping happens BEFORE tokenization, so a control-only token
    # dissolves into the surrounding whitespace — \s+ splitting never
    # yields an empty token).
    # SQL literal parsing turns the \uXXXX escapes into the literal
    # control characters, so the regex engine sees the same class
    # _CTRL_RE spells with \xNN
    ctrl = "[\\u0000-\\u0008\\u000e-\\u001f\\u007f]"
    clean = f"regexp_replace({text_col}, '{ctrl}', '')"
    tok = (
        f"CASE WHEN length(trim({clean})) = 0 "
        "THEN CAST(array() AS array<string>) "
        f"ELSE split(trim({clean}), '\\\\s+') END"
    )
    base = docs.selectExpr(
        id_col,
        f"{tok} AS _ws",
        f"split({clean}, '\\n') AS _lines",
        f"split({clean}, '\\n\\n') AS _paras",
    ).selectExpr(
        "*",
        "aggregate(_ws, CAST(0 AS BIGINT), (a, w) -> a + length(w)) AS _c",
    )
    # NOT checkpointed: the three consumers below re-run only map-side
    # tokenize work per scan — materializing the token/line arrays to
    # disk costs more than recomputing them (measured)

    def _sql_frac_ok(value: str, total: str, rule: tuple[int, int]) -> str:
        num, den = rule
        return f"CAST(({value}) * {den} <= ({total}) * {num} AS INT)"

    def _sql_arr_chars(col: str) -> str:
        return f"aggregate({col}, CAST(0 AS BIGINT), (a, x) -> a + length(x))"

    lp_exprs = []
    for side, pre in (("_lines", "line"), ("_paras", "para")):
        n = f"CAST(size({side}) AS BIGINT)"
        nd = f"CAST(size(array_distinct({side})) AS BIGINT)"
        c = _sql_arr_chars(side)
        cd = _sql_arr_chars(f"array_distinct({side})")
        lp_exprs.append(
            _sql_frac_ok(f"{n} - {nd}", n, _LINE_PARA_RULES[f"ok_dup_{pre}_frac"])
            + f" AS ok_dup_{pre}_frac"
        )
        lp_exprs.append(
            _sql_frac_ok(f"{c} - {cd}", c, _LINE_PARA_RULES[f"ok_dup_{pre}_chars"])
            + f" AS ok_dup_{pre}_chars"
        )
    lp = base.selectExpr(
        id_col,
        "_c AS n_word_chars",
        lp_exprs[0],  # line frac
        lp_exprs[2],  # para frac
        lp_exprs[1],  # line chars
        lp_exprs[3],  # para chars
    )

    # ONE (k, pos, gram) explode for all nine gram sizes; the SQL
    # literal '\\u0001' parses to _SEP (the \\x01 gram separator)
    empty = "CAST(array() AS array<struct<k:int,pos:bigint,gram:string>>)"
    gram_parts = ", ".join(
        f"CASE WHEN size(_ws) >= {k} THEN "
        f"transform(sequence(0, size(_ws) - {k}), "
        f"i -> struct(CAST({k} AS INT) AS k, CAST(i AS BIGINT) AS pos, "
        f"concat_ws('\\u0001', slice(_ws, i + 1, {k})) AS gram)) "
        f"ELSE {empty} END"
        for k in all_ks
    )
    rows = base.selectExpr(
        id_col, f"explode(flatten(array({gram_parts}))) AS g"
    ).selectExpr(id_col, "g.k", "g.pos", "g.gram")
    counts = rows.groupBy(id_col, "k", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        # positions matter only for the coverage-union gram sizes; the
        # top-k grams ship empty lists through the exchange (collect_
        # list drops the NULLs map-side, shrinking the partial states)
        F.sort_array(
            F.collect_list(
                F.when(F.col("k") >= min(dup_ks), F.col("pos"))
            )
        ).alias("positions"),
    ).withColumn(
        "gram_chars",
        (F.length("gram") - (F.col("k") - 1)).cast("long"),
    )

    top = (
        counts.filter(F.col("k").isin(top_ks))
        .groupBy(id_col, "k")
        .agg(
            F.max(F.struct("cnt", "gram_chars", "gram")).alias("_m")
        )
        .select(
            id_col,
            "k",
            (F.col("_m.cnt") * F.col("_m.gram_chars")).alias("cov"),
        )
        .groupBy(id_col)
        .pivot("k", top_ks)
        .agg(F.first("cov"))
    )
    top = top.select(
        id_col, *[F.col(str(k)).alias(f"_top{k}") for k in top_ks]
    )

    # duplicated-gram coverage: union of [pos, pos+k) word intervals,
    # folded over this k's sorted duplicated positions per doc
    dup_pos = (
        counts.filter((F.col("k").isin(dup_ks)) & (F.col("cnt") >= 2))
        .select(id_col, "k", F.explode("positions").alias("pos"))
        .groupBy(id_col, "k")
        .agg(F.sort_array(F.collect_list("pos")).alias("ps"))
        .join(base.select(id_col, "_ws"), id_col)
    )
    fold = F.expr(
        "aggregate(ps, "
        "named_struct('last', CAST(0 AS BIGINT), 'cov', CAST(0 AS BIGINT)), "
        "(acc, p) -> named_struct("
        "'last', p + CAST(k AS BIGINT), "
        "'cov', acc.cov + aggregate("
        "slice(_ws, CAST(greatest(p, acc.last) + 1 AS INT), "
        "CAST(p + CAST(k AS BIGINT) - greatest(p, acc.last) AS INT)), "
        "CAST(0 AS BIGINT), (a, w) -> a + length(w))), "
        "acc -> acc.cov)"
    )
    dup = (
        dup_pos.select(id_col, "k", fold.alias("cov"))
        .groupBy(id_col)
        .pivot("k", dup_ks)
        .agg(F.first("cov"))
    )
    dup = dup.select(
        id_col, *[F.col(str(k)).alias(f"_dup{k}") for k in dup_ks]
    )

    out = lp.join(top, id_col, "left").join(dup, id_col, "left")
    c = F.col("n_word_chars")
    counter_cols, flag_cols = [], []
    for k in top_ks:
        cov = F.coalesce(F.col(f"_top{k}"), F.lit(0)).cast("long")
        counter_cols.append(cov.alias(f"top_{k}gram_chars"))
        flag_cols.append(
            _frac_ok(cov, c, _TOP_NGRAM_RULES[k]).alias(f"ok_top_{k}gram")
        )
    for k in dup_ks:
        cov = F.coalesce(F.col(f"_dup{k}"), F.lit(0)).cast("long")
        counter_cols.append(cov.alias(f"dup_{k}gram_chars"))
        flag_cols.append(
            _frac_ok(cov, c, _DUP_NGRAM_RULES[k]).alias(f"ok_dup_{k}gram")
        )
    out = out.select(
        id_col,
        "n_word_chars",
        *counter_cols,
        *[F.col(n) for n in _LINE_PARA_RULES],
        *flag_cols,
    )
    keep = None
    for name in [
        *list(_LINE_PARA_RULES),
        *[f"ok_top_{k}gram" for k in top_ks],
        *[f"ok_dup_{k}gram" for k in dup_ks],
    ]:
        term = F.col(name) == 1
        keep = term if keep is None else keep & term
    return out.withColumn("keep", keep.cast("int"))


# --- the C4 cleaning rules (Raffel et al. 2020, §2.2) ------------------------

_C4_TERMINAL = (".", "!", "?", '"', "'")


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """The C4 line-level cleaning recipe (Raffel et al. 2020, "Exploring
    the Limits of Transfer Learning", §2.2) — the OTHER most-cited
    published filter, complementing the Gopher pair (quality flags +
    repetition flags): KEEP only lines that end in a terminal
    punctuation mark and carry >= ``min_words_per_line`` words and do
    not contain the word "javascript" (case-insensitive); then DROP the
    whole page when the cleaned text has fewer than ``min_sentences``
    sentences (terminal-punctuation count), or when the RAW page
    mentions "lorem ipsum" or contains a curly brace (code). The
    lorem-ipsum/brace drops follow the paper exactly: C4 removes any
    page containing them ANYWHERE on the raw page, so a page whose
    only offending lines the line filter would have removed is still
    dropped. The paper's corpus-level three-sentence-span dedup is the
    span-dedup family's job (q138/q198), not re-implemented here.

    Returns ``(id, clean_text, n_lines_kept, n_sentences, keep)`` —
    clean_text is the kept lines re-joined with newlines (empty string
    when nothing survives). Pure map-side array expressions, zero
    shuffles at any scale, and the cleaned STRING is hash-exact against
    the SQL twin."""
    text = F.col(text_col)
    lines = F.split(text, "\n")

    def _line_ok(ln):
        t = F.trim(ln)
        ends = None
        for p in _C4_TERMINAL:
            e = t.endswith(p)
            ends = e if ends is None else (ends | e)
        enough_words = F.size(TX.tokens(t)) >= min_words_per_line
        no_js = ~F.lower(t).contains("javascript")
        return ends & enough_words & no_js

    kept = F.filter(lines, _line_ok)
    clean = F.array_join(F.transform(kept, F.trim), "\n")
    # sentences = terminal-punctuation marks in the CLEANED text
    n_sent = sum(
        (
            F.length(clean)
            - F.length(F.replace(clean, F.lit(p), F.lit("")))
        ).cast("long")
        for p in (".", "!", "?")
    )
    page_ok = (
        (n_sent >= min_sentences)
        & ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
    )
    return docs.select(
        id_col,
        clean.alias("clean_text"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        page_ok.cast("int").alias("keep"),
    )


def dedup_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """WITHIN-document line deduplication (the RefinedWeb-style line
    cleaner; corpus-level line/paragraph dedup is q78's job): keep the
    FIRST occurrence of every line, preserving order — navigation
    blocks, repeated headers, and footer boilerplate collapse to one
    copy. Returns ``(id, clean_text, n_lines, n_lines_kept)``.
    Map-side array expressions only (the first-occurrence filter is
    the indexed-lambda form ``position(line) == index``), zero
    shuffles, and the cleaned STRING is hash-exact cross-engine."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda x, i: (F.array_position(lines, x) - 1) == i,
    )
    return docs.select(
        id_col,
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
    )
