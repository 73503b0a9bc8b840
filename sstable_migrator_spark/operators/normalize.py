"""Unicode normalization — the dedup-key prerequisite.

North-star extension: exact dedup, shingle hashing, and URL/anchor
matching all key on BYTES, but the same visible text arrives from the
web in different code-point sequences (precomposed U+00E9 vs
e + COMBINING ACUTE U+0301, fullwidth forms, ligatures). Without a
normalization pass, "café" fails to collide with "café" and a
duplicate survives every hash-keyed stage. The standard treatment is
Unicode normalization (NFC for byte-stable keys, NFKC when
compatibility folding — fullwidth digits, ligatures — should also
collapse) run BEFORE fingerprinting.

Spark has no built-in Unicode normalizer, so this is an Arrow-batched
``mapInPandas`` kernel over Python's ``unicodedata`` (the same tables
ICU ships) — a deliberate, documented exception to the JVM-only
hot-path rule: the operation IS a library call, exactly like the
multimodal decode kernels. It is map-only (no shuffle), one
``str.map`` per Arrow batch. On a 100 TB corpus this costs one pass
of Python string traffic; the alternative (an ICU UDF jar) keeps the
same plan shape and can swap in without touching callers. Already-
normalized text (the overwhelming majority of real corpora) pays one
normality check per row.

The ``changed`` flag is returned so pipelines can COUNT how much of a
corpus was non-normal (a data-quality signal: a spike usually means a
new source with a different encoder) and so tests can plant known
denormal forms and gate the discrimination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["normalize_unicode", "repair_mojibake"]

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def normalize_unicode(
    docs: DataFrame,
    form: str = "NFC",
    text_col: str = "text",
) -> DataFrame:
    """Return ``docs`` with ``text_col`` Unicode-normalized to ``form``
    plus a ``changed`` boolean (True where normalization altered the
    string). NULL text stays NULL with ``changed = false``. All other
    columns pass through unchanged."""
    import unicodedata

    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    if text_col not in docs.columns:
        raise ValueError(f"column {text_col!r} not in {docs.columns}")
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(docs.schema.fields) + [T.StructField("changed", T.BooleanType(), False)]
    )
    cols = docs.columns

    def _norm(batches):
        for pdf in batches:
            src = pdf[text_col]
            normed = src.map(
                lambda s: unicodedata.normalize(form, s) if s is not None else None
            )
            pdf = pdf[cols].copy()
            pdf["changed"] = [
                a is not None and a != b for a, b in zip(src, normed)
            ]
            pdf[text_col] = normed
            yield pdf

    return docs.mapInPandas(_norm, out_schema)


def repair_mojibake(
    docs: DataFrame,
    text_col: str = "text",
    max_rounds: int = 2,
) -> DataFrame:
    """Repair DOUBLE-ENCODED UTF-8 ("mojibake": UTF-8 bytes mistakenly
    decoded as Latin-1/CP1252 and re-encoded — the single most common
    web-text corruption, rendering every 'é' as 'Ã©' and every curly
    quote as 'â€™'). The fix is the inverse trip: re-encode the
    codepoints as Latin-1 (CP1252 fallback for the 0x80-0x9F quirks)
    and decode the bytes as UTF-8; a repair is accepted ONLY when the
    round-trip succeeds AND shortens the string (a genuine multibyte
    collapse — ASCII and already-correct text fail the encode or the
    decode and pass through untouched). ``max_rounds`` bounds repeated
    application for doubly-doubled text. Returns ``docs`` with the
    repaired ``text_col`` plus ``changed``.

    Same kernel contract as ``normalize_unicode``: Arrow-batched
    mapInPandas, map-only, a documented library-call exception to the
    JVM-only hot-path rule. Heuristic by nature (like ftfy's core
    trick) — a string that legitimately reads as UTF-8 after a
    Latin-1 encode is indistinguishable from corruption; the
    shortening guard makes false positives need a shorter VALID UTF-8
    reading, which natural text does not produce."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    if text_col not in docs.columns:
        raise ValueError(f"column {text_col!r} not in {docs.columns}")
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(docs.schema.fields) + [T.StructField("changed", T.BooleanType(), False)]
    )
    cols = docs.columns

    def _fix_one(s):
        if s is None:
            return None
        for _ in range(max_rounds):
            raw = None
            for enc in ("latin-1", "cp1252"):
                try:
                    raw = s.encode(enc)
                    break
                except UnicodeEncodeError:
                    continue
            if raw is None:
                break
            try:
                t = raw.decode("utf-8")
            except UnicodeDecodeError:
                break
            if len(t) >= len(s):
                break
            s = t
        return s

    def _repair(batches):
        for pdf in batches:
            src = pdf[text_col]
            fixed = src.map(_fix_one)
            pdf = pdf[cols].copy()
            pdf["changed"] = [
                a is not None and a != b for a, b in zip(src, fixed)
            ]
            pdf[text_col] = fixed
            yield pdf

    return docs.mapInPandas(_repair, out_schema)
