"""Training-objective example construction: transforms that turn
curated text into (input, target) pairs for denoising objectives —
the last step between a curated corpus and a dataloader.

``span_corruption`` is the T5/UL2 family's form (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning with a Unified
Text-to-Text Transformer": mask contiguous spans, train the model to
reconstruct them behind sentinel tokens). Its code-infill sibling is
``operators/code.fim_split`` (single-span, PSM order).

Same determinism discipline as FIM: every cut point is an md5-derived
ROW PROPERTY (the hash-sample recipe), so any engine, any
partitioning, any speculative re-run produces the identical example —
at 100 TB retries WILL happen and a nondeterministic objective
transform silently corrupts training data. Map-only native
expressions; zero shuffles at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["span_corruption"]

#: Sentinel token format: <extra_id_0>, <extra_id_1>, ... (the T5
#: vocabulary's reserved tokens).
def _sentinel(i: int) -> str:
    return f"<extra_id_{i}>"


def span_corruption(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_spans: int = 2,
    seed: int = 7,
) -> DataFrame:
    """Deterministic span corruption: ``2 * n_spans`` cut points in
    ``[0, n]`` are md5-derived (``md5(id:seed:i)``, the engine's
    15-hex-digit -> BIGINT recipe) and SORTED (``array_sort`` — both
    engines sort longs identically), so consecutive pairs
    ``[c0,c1), [c2,c3), ...`` are non-overlapping masked spans by
    construction. ``input_text`` is the unmasked segments joined by
    sentinels ``<extra_id_k>``; ``target_text`` is the masked spans
    each prefixed by its sentinel plus a closing final sentinel — the
    published T5 example layout. Cut-point COLLISIONS simply yield
    empty spans/segments (still reconstructible); the reassembly
    property (interleaving input segments with target spans
    reproduces the document) is test-pinned and the whole rendered
    pair sits under the q245 oracle hash. Map-only."""
    if n_spans < 1:
        raise ValueError(f"n_spans must be >= 1, got {n_spans}")
    text = F.col(text_col)
    n = F.length(text).cast("long")

    def cut(tag: str) -> Column:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col(id_col).cast("string"),
                        F.lit(str(seed)),
                        F.lit(tag),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        return h % (n + F.lit(1))

    cuts = F.array_sort(
        F.array(*[cut(f"c{i}") for i in range(2 * n_spans)])
    )

    def at(i: int) -> Column:  # sorted cut i (0-based)
        return F.element_at(cuts, i + 1)

    # input: seg0 <s0> seg1 <s1> ... seg{k} ... tail
    input_parts: list[Column] = [text.substr(F.lit(1).cast("long"), at(0))]
    target_parts: list[Column] = []
    for k in range(n_spans):
        lo, hi = at(2 * k), at(2 * k + 1)
        input_parts.append(F.lit(_sentinel(k)))
        target_parts.append(F.lit(_sentinel(k)))
        target_parts.append(text.substr(lo + F.lit(1), hi - lo))
        nxt = at(2 * k + 2) if k + 1 < n_spans else n
        input_parts.append(text.substr(hi + F.lit(1), nxt - hi))
    target_parts.append(F.lit(_sentinel(n_spans)))
    return docs.select(
        F.col(id_col),
        n.alias("n_chars"),
        F.concat(*input_parts).alias("input_text"),
        F.concat(*target_parts).alias("target_text"),
    )
