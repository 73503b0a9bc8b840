"""Web-crawl ingestion: CommonCrawl WET shards -> curated training
corpus — the composition that turns the round's source/extraction
pieces into the pipeline a user actually runs:

    read_wet (one task/shard)  ->  wet_to_documents (stable ids,
    HTML residue strip, lang-id)  ->  build_training_corpus (quality,
    dedup, PII, optional ExactSubstr removal, chunk, pack, shard)

Everything here is a projection over operators that carry their own
oracle/unit evidence (q200 WET framing, q201 HTML extraction, q47
lang-id, the funnel's own stages); this module wires them and pins the
composition with a test.

Scale shape: WET shards parallelize per file (~150 MB each — a crawl
segment is tens of thousands); document ids are content-free hashes of
the (url, date) identity so re-ingesting a shard is idempotent at the
exact-dedup stage; the funnel's own shapes are documented in
pipelines/corpus.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sstable_migrator_spark.functions import text as TX

__all__ = [
    "warc_responses_to_documents",
    "wet_to_documents",
    "ingest_warc_corpus",
    "ingest_wet_corpus",
]


def wet_to_documents(wet: DataFrame, strip_html: bool = False) -> DataFrame:
    """WET records -> the (doc_id, lang, text, url) document shape the
    curation funnel consumes. ``doc_id`` is the portable hash of
    (url | date) — a pure identity function, so the same record always
    maps to the same id and re-ingestion collapses at exact dedup.
    WET text is already extracted; ``strip_html=True`` additionally
    runs the html_to_text pipeline for crawls whose conversion step
    left markup residue (or for raw WARC response payloads)."""
    text = F.col("text")
    if strip_html:
        text = TX.html_to_text(text)
    return wet.select(
        TX.hash64(F.concat_ws("|", F.col("url"), F.col("date")), seed=41).alias(
            "doc_id"
        ),
        F.col("url"),
        text.alias("text"),
    ).withColumn("lang", TX.lang_id(F.col("text")))


def warc_responses_to_documents(responses: DataFrame) -> DataFrame:
    """Raw-WARC ``response`` records (``sources.warc.
    read_warc_responses`` output) -> the same (doc_id, url, text, lang)
    document shape ``wet_to_documents`` yields — the full
    WARC->text path WET precomputes: keep successful (2xx) HTML
    responses whose body was FULLY DECODED (``content_encoding == ""``
    — a residual coding like br/zstd or a corrupt gzip layer means the
    "html" column holds undecodable bytes, which would feed garbage
    through html_to_text while still passing the 2xx/text filter), run
    the header-stripped body through html_to_text (q201's extraction
    pipeline), and stamp the identical hash-of-(url|date) id, so a
    crawl ingested from raw WARC and from its WET sibling collapses at
    exact dedup."""
    kept = responses.filter(
        (F.col("status") >= 200)
        & (F.col("status") < 300)
        & (
            (F.col("content_type") == "")
            | F.col("content_type").startswith("text/")
        )
        & (F.col("content_encoding") == "")
    )
    return kept.select(
        TX.hash64(F.concat_ws("|", F.col("url"), F.col("date")), seed=41).alias(
            "doc_id"
        ),
        F.col("url"),
        TX.html_to_text(F.col("html")).alias("text"),
    ).withColumn("lang", TX.lang_id(F.col("text")))


def ingest_warc_corpus(
    spark: SparkSession,
    warc_glob: str,
    out_dir: str,
    **funnel_kwargs,
) -> dict:
    """``ingest_wet_corpus`` for RAW WARC input: response records ->
    header strip -> html_to_text -> the same curation funnel. Use when
    the crawl has no WET sibling (or you don't trust its conversion).
    Returns the funnel counts plus the raw response-record count."""
    from sstable_migrator_spark.pipelines.corpus import build_training_corpus
    from sstable_migrator_spark.sources.warc import read_warc_responses

    responses = read_warc_responses(spark, warc_glob)
    docs = warc_responses_to_documents(responses).localCheckpoint()
    counts = build_training_corpus(
        docs.select("doc_id", "lang", "text"), out_dir, **funnel_kwargs
    )
    counts["warc_records"] = counts["input"]
    return counts


def ingest_wet_corpus(
    spark: SparkSession,
    wet_glob: str,
    out_dir: str,
    strip_html: bool = False,
    **funnel_kwargs,
) -> dict:
    """End to end: scan the WET shards, shape them into documents, run
    the curation funnel, write shards. Returns the funnel's per-stage
    row counts plus the raw record count."""
    from sstable_migrator_spark.pipelines.corpus import build_training_corpus
    from sstable_migrator_spark.sources.warc import read_wet

    wet = read_wet(spark, wet_glob)
    docs = wet_to_documents(wet, strip_html=strip_html).localCheckpoint()
    counts = build_training_corpus(
        docs.select("doc_id", "lang", "text"), out_dir, **funnel_kwargs
    )
    counts["wet_records"] = counts["input"]
    return counts
