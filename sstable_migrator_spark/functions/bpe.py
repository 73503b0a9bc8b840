"""Distributed BPE tokenizer training (Sennrich et al. 2016).

q134 pins one iteration's core statistic (corpus-weighted adjacent
pair counts); this module runs the full merge-learning loop as a
driver-looped DataFrame program, the same shape as graph.pagerank:

- the state is the WORD-TYPE vocabulary ``(symbols array<string>,
  wc long)`` — thousands of rows after the first rollup, never the
  corpus (the classic BPE trick: pair statistics over types weighted
  by counts, not over tokens);
- each iteration is one exploded pair rollup (a bounded shuffle) and
  ONE collected row (the argmax merge — O(1) driver data), then a
  map-only expression fold applies the merge to the symbol arrays of
  affected words only;
- lineage is cut per round with localCheckpoint so plan depth stays
  O(1) across merges.

At 100 TB the corpus-side cost is the initial word rollup (one
shuffle); everything after runs on the vocabulary, whose size is
zipf-bounded and independent of corpus scale. ``encode_word`` is the
driver-side greedy encoder for applying the learned merges downstream
(e.g. building a tokenizer artifact); corpus-scale encoding applies
merges inside expressions or an Arrow UDF with the merge list
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sstable_migrator_spark.functions import text as TX

__all__ = [
    "bpe_encode_docs",
    "encode_word",
    "load_bpe",
    "save_bpe",
    "train_bpe",
]


def _char_symbols(w):
    return F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1))
    )


def train_bpe(
    docs: DataFrame, n_merges: int = 50, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    order. Tie-break is (count desc, left asc, right asc) — fully
    deterministic, so retraining reproduces the identical tokenizer.
    Stops early if no adjacent pair is left (tiny corpora)."""
    words = docs.select(
        F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("w")
    ).filter(F.col("w").rlike("^[a-z]+$"))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .select(_char_symbols(F.col("w")).alias("sym"), "wc")
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.filter(F.size("sym") >= 2)
            .select(
                "wc",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("sym") - 1),
                        lambda i: F.struct(
                            F.element_at("sym", i).alias("a"),
                            F.element_at("sym", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("wc").alias("freq"))
            .orderBy(F.desc("freq"), "a", "b")
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))
        la, lb = F.lit(a), F.lit(b)
        # greedy left-to-right merge fold; only words containing the
        # pair pay the expression work
        fold = F.aggregate(
            F.col("sym"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, F.size(acc)) == la)
                & (x == lb),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        touched = F.array_contains("sym", a) & F.array_contains("sym", b)
        vocab = vocab.select(
            F.when(touched, fold).otherwise(F.col("sym")).alias("sym"), "wc"
        ).localCheckpoint()
    return merges


def save_bpe(merges: list[tuple[str, str]], path: str) -> None:
    """Persist a learned merge list as a versioned JSON tokenizer
    artifact — the thing a trainer ships alongside its data (encoding
    is only reproducible with the EXACT merges, in order). Includes an
    md5 of the ordered merges so a consumer can verify identity
    without comparing lists."""
    import hashlib
    import json

    ordered = [[a, b] for a, b in merges]
    digest = hashlib.md5(
        "\n".join(f"{a}\t{b}" for a, b in merges).encode("utf-8")
    ).hexdigest()
    with open(path, "w") as fh:
        json.dump(
            {"version": 1, "n_merges": len(merges), "md5": digest,
             "merges": ordered},
            fh,
        )


def load_bpe(path: str) -> list[tuple[str, str]]:
    """Load a ``save_bpe`` artifact, verifying version and digest —
    a corrupted or hand-edited merge list fails loudly rather than
    silently re-tokenizing the corpus differently."""
    import hashlib
    import json

    with open(path) as fh:
        art = json.load(fh)
    if art.get("version") != 1:
        raise ValueError(f"unknown BPE artifact version {art.get('version')!r}")
    merges = [(a, b) for a, b in art["merges"]]
    digest = hashlib.md5(
        "\n".join(f"{a}\t{b}" for a, b in merges).encode("utf-8")
    ).hexdigest()
    if digest != art.get("md5"):
        raise ValueError("BPE artifact digest mismatch — corrupted merges")
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Greedy BPE encoding of one word with a learned merge list, merge
    priority = training order (the standard inference rule). Driver-side
    utility; corpus-scale encoding broadcasts ``merges`` into an
    expression chain or Arrow UDF."""
    sym = list(word)
    rank = {m: i for i, m in enumerate(merges)}
    while len(sym) >= 2:
        cand = [
            (rank[(sym[i], sym[i + 1])], i)
            for i in range(len(sym) - 1)
            if (sym[i], sym[i + 1]) in rank
        ]
        if not cand:
            break
        r, _ = min(cand)
        a, b = merges[r]
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_encode_docs(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-scale BPE encoding: apply a learned merge list to every
    document, returning ``(id, pieces array<string>, n_pieces)``. The
    merge table rides to executors once (task-closure broadcast — it is
    a tokenizer artifact, KBs); encoding is an Arrow-batched mapInPandas
    with a per-batch word cache, so each distinct word in a batch is
    encoded once regardless of frequency (zipf makes the cache hit rate
    high). Map-only — no shuffle anywhere.

    Tokenization note: encoding lowercases + whitespace-splits ALL
    words, while train_bpe learns only from ``^[a-z]+$`` word types —
    so punctuation-bearing words encode mostly character-wise (no
    learned merges cover them). That is the standard train-on-clean /
    encode-everything asymmetry; pre-clean the text if it matters."""
    import pandas as pd

    def op(batches):
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            out_ids, out_pieces = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                pieces: list[str] = []
                for w in (text or "").lower().split():
                    if w not in cache:
                        cache[w] = encode_word(w, merges)
                    pieces.extend(cache[w])
                out_ids.append(did)
                out_pieces.append(pieces)
            yield pd.DataFrame({id_col: out_ids, "pieces": out_pieces})

    id_type = docs.schema[id_col].dataType.simpleString()
    enc = docs.select(id_col, text_col).mapInPandas(
        op, f"{id_col} {id_type}, pieces array<string>"
    )
    return enc.select(id_col, "pieces", F.size("pieces").cast("long").alias("n_pieces"))
