"""BM25 full-text retrieval with exact integer scoring.

North-star extension (lexical sibling of the ANN/embedding family in
operators/simsearch.py): score documents against a bag-of-terms query
with BM25 — THE standard lexical ranking function — re-derived so the
whole computation is BIGINT arithmetic and therefore order-free,
partitioning-proof, and hash-exact against a SQL oracle:

- **IDF** — ``ln((N - df + .5)/(df + .5) + 1)`` collapses to
  ``log((2N+2)/(2df+1))``; quantized with the same integer q16
  log2 approximation the perplexity filter uses (operators/lm).
  Natural-log vs log2 is a constant factor absorbed by the ranking.
- **TF normalization** — ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
  with the standard k1 = 1.2 = 6/5 and b = 0.75 = 3/4. Substituting
  ``avgdl = T/n`` (total corpus tokens over doc count) and clearing
  every fraction gives the exact integer ratio
      num = 44*T*tf,   den = 20*T*tf + 6*T + 18*dl*n
  so the per-(term, doc) contribution is ``(idf_q16 * num) div den``
  — one integer multiply and one exact integer division, no floats.
  Overflow headroom: contributions stay under 2^63 while
  ``idf_q16 * 44 * T * tf < 2^63`` — with idf_q16 <= ~16*40 that is
  T*tf < ~2e16, comfortable for corpora to ~10^13 tokens; past that,
  run the internal products as DECIMAL(38,0) and cast the result back
  (the division keeps results small — documented, not needed here).

Plan shape at 100 TB: postings are one map-side explode + one (term,
doc) count aggregation; document lengths ride the same pass. The query
side (a handful of terms with their df) broadcasts; scoring is a
broadcast hash join postings-vs-query, then ONE aggregation keyed by
doc id and a TakeOrderedAndProject for the top-k. Nothing data-sized
shuffles twice; ties break on doc id so results are fully
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sstable_migrator_spark.operators.lm import _q16_col, exact_intdiv

__all__ = ["bm25_topk", "build_postings"]


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, term, tf, dl) postings — one explode + one aggregation.
    Terms are lowercase whitespace tokens (the tokenizer every other
    text operator in this engine shares)."""
    from sstable_migrator_spark.functions import text as TX

    toks = docs.select(
        F.col(id_col).alias("doc"),
        TX.tokens(F.lower(F.col(text_col))).alias("tk"),
    )
    return (
        toks.select("doc", F.size("tk").alias("dl"), F.explode("tk").alias("term"))
        .groupBy("doc", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    topk: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under integer BM25.
    Returns ``(doc_id, score_q, n_hit)`` — the quantized integer score
    and how many query terms matched — ordered by (score desc, doc id).
    """
    terms = sorted(set(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("empty query")
    post = build_postings(docs, text_col=text_col, id_col=id_col)
    # corpus constants: one row each, computed from the SAME postings
    # pass (doc lengths are already aggregated per doc)
    doclens = post.select("doc", "dl").distinct()
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    )
    qpost = post.filter(F.col("term").isin(terms))
    df_tab = qpost.groupBy("term").agg(F.countDistinct("doc").alias("df"))
    idf = df_tab.crossJoin(F.broadcast(stats)).select(
        "term",
        "n",
        "t",
        _q16_col(
            (F.col("df") * 2 + 1).cast("long"),
            (F.col("n") * 2 + 2).cast("long"),
        ).alias("idf_q"),
    )
    num = F.col("idf_q") * F.lit(44) * F.col("t") * F.col("tf")
    den = (
        F.lit(20) * F.col("t") * F.col("tf")
        + F.lit(6) * F.col("t")
        + F.lit(18) * F.col("dl") * F.col("n")
    ).cast("long")
    scored = (
        qpost.join(F.broadcast(idf), "term")
        .select("doc", exact_intdiv(num, den).alias("contrib"))
        .groupBy("doc")
        .agg(
            F.sum("contrib").alias("score_q"),
            F.count(F.lit(1)).alias("n_hit"),
        )
    )
    return scored.select(
        F.col("doc").alias(id_col), "score_q", "n_hit"
    ).orderBy(F.desc("score_q"), id_col).limit(topk)
