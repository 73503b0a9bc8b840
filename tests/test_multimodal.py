from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sstable_migrator_spark.operators.multimodal import (
    DecoderUnavailable,
    decode_features,
    frame_sample_plan,
    synthetic_image_media,
    synthetic_media,
)


def test_decode_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=12)
    out = decode_features(media, dim=8)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 12
    payload = b"media-3" * 4
    assert rows[3]["payload_sha256"] == hashlib.sha256(payload).hexdigest()
    assert rows[3]["payload_bytes"] == len(payload)
    assert len(rows[3]["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in rows[3]["feature"])
    # run twice -> identical (deterministic stub)
    again = {r["media_id"]: r["feature"] for r in decode_features(media, dim=8).collect()}
    assert again[3] == rows[3]["feature"]


def test_real_decode_images_only(spark):
    """real_decode=True is the REAL path for images (stdlib codec) and a
    loud DecoderUnavailable stub for audio/video, whose codecs genuinely
    aren't in this environment. Mixed-kind input must fail loudly."""
    media = synthetic_media(spark, n=6)
    with pytest.raises(Exception) as exc:
        decode_features(media, real_decode=True).collect()
    # PySpark surfaces worker errors as PythonException; the inner
    # DecoderUnavailable message lives in the worker traceback, which
    # str() may omit — the raise itself is the contract.
    assert exc.value is not None
    # image-only input decodes for real (pixels, not hashes)
    imgs = synthetic_image_media(spark, n=4)
    rows = decode_features(imgs, real_decode=True).collect()
    assert len(rows) == 4
    assert all(len(r["feature"]) == 8 for r in rows)


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=12)
    out = frame_sample_plan(media, every_ms=1000)
    rows = out.collect()
    assert all(r["frame_ts_ms"] % 1000 == 0 for r in rows)
    # video rows only (kind index 2 mod 3)
    vid_ids = {r["media_id"] for r in rows}
    assert vid_ids == {i for i in range(12) if i % 3 == 2}


def test_resize_images(spark):
    from sstable_migrator_spark.operators.multimodal import (
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, 30)
    out = resize_images(media, width=8, height=4)
    rows = out.collect()
    assert len(rows) == 10  # only the 'image' third of the kinds
    for r in rows:
        assert len(r["payload"]) == 3 * 8 * 4
        assert (r["meta"]["width"], r["meta"]["height"]) == (8, 4)


def test_resize_real_decode_is_stubbed(spark):
    from sstable_migrator_spark.operators.multimodal import (
        DecoderUnavailable,
        resize_images,
        synthetic_media,
    )

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    media = synthetic_media(spark, 6)
    with _pytest.raises((DecoderUnavailable, Py4JJavaError, Exception)):
        resize_images(media, 8, 4, real_decode=True).collect()
