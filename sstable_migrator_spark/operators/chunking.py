"""Document chunking for retrieval/training pipelines (the RAG
preprocessing step: split every document into overlapping token
windows with stable, content-derived chunk ids).

North-star extension: embedding/retrieval pipelines never index whole
documents — they index chunks. The operator contract:

- every token of the source document appears in at least one chunk
  (stride = chunk_tokens - overlap_tokens, last chunk clamped);
- consecutive chunks overlap by exactly ``overlap_tokens`` (except the
  clamped tail), so a span crossing a boundary is fully contained in
  one of the two neighbors whenever it is shorter than the overlap;
- ``chunk_id`` is the portable md5 of ``doc_id:chunk_idx:chunk_text``
  — deterministic across engines, partitionings, and re-runs, so
  downstream embedding tables can incrementally upsert on it (the same
  stable-identity idea as the governed CDC path);
- a document shorter than one chunk yields exactly one chunk (itself);
  an empty/blank document yields none.

Entirely expression-level (sequence/transform/slice/array_join +
explode): the chunker is map-only — no shuffle, no UDF, scales as a
projection over the corpus scan. 100 TB note: chunk explosion
multiplies rows by ~len/stride; downstream aggregations shuffle the
CHUNKS, so pick chunk/overlap for the retriever, not the engine — the
operator itself adds no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode documents into overlapping token-window chunks. Returns
    ``(doc_id, chunk_idx, n_tokens, chunk_text, chunk_id)`` with
    0-based ``chunk_idx`` in document order."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap_tokens}) < chunk ({chunk_tokens})"
        )
    from sstable_migrator_spark.functions import text as TX

    stride = chunk_tokens - overlap_tokens
    toks = docs.select(
        F.col(id_col), TX.tokens(F.col(text_col)).alias("tk")
    ).filter(F.size("tk") > 0)
    # window starts: 1, 1+stride, ... while start <= len - overlap
    # (equivalently: n_chunks = 1 + ceil(max(len - chunk, 0) / stride),
    # which guarantees full coverage and no all-overlap tail chunk)
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(F.size("tk") - chunk_tokens, F.lit(0)) + stride - 1)
            / stride
        ).cast("int")
    )
    chunks = toks.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice("tk", i * stride + 1, chunk_tokens), " "
                ),
            )
        ).alias("chunk_idx", "chunk_text"),
    )
    return chunks.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(F.split("chunk_text", " ")).alias("n_tokens"),
        "chunk_text",
        F.md5(
            F.concat_ws(":", F.col(id_col).cast("string"), "chunk_idx", "chunk_text")
        ).alias("chunk_id"),
    )
