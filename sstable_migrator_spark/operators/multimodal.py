"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs. The decode/feature steps are Arrow-batched
``mapInPandas`` operators; the actual codec calls are STUBBED (the
image/audio libraries are not in this container) behind
``DecoderUnavailable`` / a deterministic fake, while the Spark-side
contract — schema, batch shape, partitioning — is real and tested.

At 100 TB: binary payloads ride in the same parquet row groups;
``spark.sql.files.maxPartitionBytes`` bounds task input; feature
extraction is map-only (no shuffle); downstream joins use the metadata
columns only, so column pruning keeps payload bytes out of shuffles.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised by the real-decode path: codec libraries are not baked
    into this environment. The deterministic fake keeps the pipeline
    testable end-to-end."""


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: bytes of sha256 scaled to [0,1).
    Replaces the (unavailable) image/audio decode+embed step."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def decode_features(media: DataFrame, dim: int = 8, real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``real_decode=True`` raises DecoderUnavailable — the marked stub for
    the codec step; the default path computes the deterministic fake so
    schema/batching/partition behavior is fully exercised.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decode:
            raise DecoderUnavailable(
                "image/audio codecs not available in this environment"
            )
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "payload_bytes": payloads.map(lambda b: len(b or b"")).astype("int32"),
                    "feature": payloads.map(lambda b: _fake_feature(b, dim)),
                }
            )

    return media.mapInPandas(op, FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = (f"media-{i}".encode() * (i % 7 + 1))
        rows.append(
            (
                i,
                kinds[i % 3],
                bytearray(payload),
                (64 + i, 48 + i, 1000 * (i % 30), "fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per planned frame timestamp
    (sequence over duration) — the decode of each frame is the stubbed
    step. Shows the explode/partition shape without codecs."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, real_decode: bool = False
) -> DataFrame:
    """mapInPandas image resize over binary payloads.

    The codec call is the stubbed step (``real_decode=True`` raises
    DecoderUnavailable); the default deterministic fake models the
    resource shape of a real resize — output payload size proportional
    to the target pixel count (truncate/cycle the source bytes to
    3*width*height) and metadata rewritten — so partitioning, Arrow
    batch flow and schema are exercised end-to-end. Map-only: no
    shuffle, payload bytes never cross an exchange.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decode:
            raise DecoderUnavailable(
                "image codecs not available in this environment"
            )
        target = 3 * width * height

        def fake_resize(b: bytes) -> bytes:
            src = bytes(b or b"\x00")
            reps = target // len(src) + 1
            return (src * reps)[:target]

        for pdf in batches:
            meta = pd.DataFrame(
                {
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "duration_ms": [m["duration_ms"] if m else 0 for m in pdf["meta"]],
                    "codec": [m["codec"] if m else "" for m in pdf["meta"]],
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(fake_resize),
                    "meta": meta.to_dict("records"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(op, RESIZED_SCHEMA)
