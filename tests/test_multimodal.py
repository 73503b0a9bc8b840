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


def _ham(a: int, b: int) -> int:
    """Hamming distance of two SIGNED 64-bit hashes (mask before
    popcount — Python xor of negatives is sign-extended)."""
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_image_phash_near_dup_pairs(spark):
    """Perceptual near-dup mining: a re-encoded copy and a
    few-pixels-noised copy must pair with the original at small
    hamming; unrelated gradients must not pair. Also pins determinism
    under repartitioning and banded-join completeness vs brute force."""
    import numpy as np

    from sstable_migrator_spark.functions.imagecodec import encode_png, encode_ppm
    from sstable_migrator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_near_dup_pairs,
        image_phash,
    )

    h, w = 48, 64

    def blocky(seed):
        # dense low-frequency spectrum (seeded 8x8 blocks upsampled):
        # every coefficient in the hash's 8x8 DCT block carries real
        # magnitude, so the median threshold is stable — sparse-spectrum
        # images (gradients, few sinusoids) are pHash's degenerate case
        # and would flip near-zero bits on any perturbation
        rng = np.random.RandomState(seed)
        coarse = rng.randint(30, 226, size=(8, 8))
        c = np.kron(coarse, np.ones((8, 8), dtype=int))[:h, :w].astype(np.uint8)
        return np.stack([c, c, c], axis=2)

    base = blocky(42)
    noised = base.copy()
    noised[2:14, 2:14, :] = np.clip(
        noised[2:14, 2:14, :].astype(int) + 40, 0, 255
    ).astype(np.uint8)  # visible local edit, same image
    other = blocky(7)
    rows = [
        (0, "image", bytearray(encode_png(base)), (w, h, 0, "png")),
        (1, "image", bytearray(encode_ppm(base)), (w, h, 0, "ppm")),   # re-encode
        (2, "image", bytearray(encode_png(noised)), (w, h, 0, "png")), # small edit
        (3, "image", bytearray(encode_png(other)), (w, h, 0, "png")),  # unrelated
        (4, "audio", bytearray(b"RIFFxxxx"), (0, 0, 0, "wav")),        # ignored
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    hashes = {r["media_id"]: r["phash"] for r in image_phash(media).collect()}
    assert set(hashes) == {0, 1, 2, 3}  # non-images skipped
    assert hashes[0] == hashes[1]  # lossless re-encode: identical hash
    assert _ham(hashes[0], hashes[2]) <= 7
    assert _ham(hashes[0], hashes[3]) > 7

    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dup_pairs(media).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 0
    assert (0, 2) in pairs and (1, 2) in pairs
    assert all(3 not in p for p in pairs)

    # completeness: banded join == brute force at the same threshold
    from itertools import combinations

    brute = {
        (a, b)
        for a, b in combinations(sorted(hashes), 2)
        if _ham(hashes[a], hashes[b]) <= 7
    }
    assert set(pairs) == brute

    # determinism under repartitioning
    again = {r["media_id"]: r["phash"]
             for r in image_phash(media.repartition(5)).collect()}
    assert again == hashes


def test_image_phash_fake_path(spark):
    """Codec-free plumbing: the fake-decode path hashes payload-derived
    gray squares — deterministic, distinct payloads distinct hashes."""
    from sstable_migrator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_phash,
    )

    rows = [
        (0, "image", bytearray(b"payload-a"), (1, 1, 0, "png")),
        (1, "image", bytearray(b"payload-b"), (1, 1, 0, "png")),
        (2, "image", bytearray(b"payload-a"), (1, 1, 0, "png")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["phash"]
           for r in image_phash(media, real_decode=False).collect()}
    assert got[0] == got[2] != got[1]


def test_audio_phash_near_dup_pairs(spark):
    """Audio perceptual dedup: volume-scaled and mildly-noised copies
    of a clip pair with the original; a different clip does not.
    Median thresholding makes the print volume-invariant by
    construction — pinned explicitly."""
    import numpy as np

    from sstable_migrator_spark.functions.audiocodec import encode_wav
    from sstable_migrator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_near_dup_pairs,
        audio_phash,
    )

    rate = 8000
    t = np.arange(rate)  # 1 second
    rng = np.random.RandomState(11)
    # NON-stationary clip (chirp + AM envelope): stationary tones give
    # a time-constant spectrogram whose 2-D DCT collapses onto one row
    # and leaves near-median ties — the audio analog of the image
    # test's sparse-spectrum caveat
    base = (
        4000 * np.sin(2 * np.pi * (200 + 1200 * t / rate) * t / rate)
        + 2500 * np.sin(2 * np.pi * 900 * t / rate) * np.sin(2 * np.pi * 2 * t / rate)
        + 600 * rng.randn(rate)
    )
    quiet = base * 0.25                      # uniform volume change
    noised = base + 60 * np.random.RandomState(7).randn(rate)
    other = (
        4000 * np.sin(2 * np.pi * (1500 - 900 * t / rate) * t / rate)
        + 2500 * np.sin(2 * np.pi * 300 * t / rate)
        + 600 * np.random.RandomState(3).randn(rate)
    )

    def wav(x):
        return bytearray(
            encode_wav(np.clip(x, -32768, 32767).astype(np.int32)[:, None], rate)
        )

    rows = [
        (0, "audio", wav(base), (0, 0, rate, "wav")),
        (1, "audio", wav(quiet), (0, 0, rate, "wav")),
        (2, "audio", wav(noised), (0, 0, rate, "wav")),
        (3, "audio", wav(other), (0, 0, rate, "wav")),
        (4, "image", bytearray(b"PNGish"), (1, 1, 0, "png")),  # ignored
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = {r["media_id"]: r["aphash"] for r in audio_phash(media).collect()}
    assert set(hashes) == {0, 1, 2, 3}
    assert _ham(hashes[0], hashes[1]) <= 7  # volume-invariant
    assert _ham(hashes[0], hashes[2]) <= 7
    assert _ham(hashes[0], hashes[3]) > 7

    pairs = {(r["id_a"], r["id_b"]) for r in audio_near_dup_pairs(media).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs
    assert all(3 not in p for p in pairs)

    # determinism under repartitioning
    again = {r["media_id"]: r["aphash"]
             for r in audio_phash(media.repartition(3)).collect()}
    assert again == hashes


def test_video_phash_near_dup_pairs(spark):
    """Triad leg 3: a LOSSLESS AVI/DIB re-encode of the same frames and
    a 2x pixel-replicated enlargement pair at hamming 0 on every slot;
    a re-edited video (one replaced frame) fails the strict-AND; an
    unrelated video never pairs. GIF and AVI containers both decode."""
    import numpy as np

    from sstable_migrator_spark.functions.avicodec import encode_avi_dib
    from sstable_migrator_spark.functions.gifcodec import encode_gif
    from sstable_migrator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        video_near_dup_pairs,
        video_phash,
    )

    h, w = 32, 40

    def blocky(seed):
        rng = np.random.RandomState(seed)
        coarse = rng.randint(30, 226, size=(8, 8))
        c = np.kron(coarse, np.ones((8, 8), dtype=int))[:h, :w].astype(np.uint8)
        return np.stack([c, c, c], axis=2)

    frames = [blocky(1), blocky(2), blocky(3)]
    big = [np.repeat(np.repeat(f, 2, axis=0), 2, axis=1) for f in frames]
    reedit = [frames[0], blocky(99), frames[2]]  # middle frame replaced
    other = [blocky(7), blocky(8), blocky(9)]

    rows = [
        (0, "video", bytearray(encode_avi_dib(frames)), (w, h, 300, "dib")),
        (1, "video", bytearray(encode_avi_dib(frames)), (w, h, 300, "dib")),   # re-encode
        (2, "video", bytearray(encode_avi_dib(big)), (2 * w, 2 * h, 300, "dib")),  # 2x
        (3, "video", bytearray(encode_avi_dib(reedit)), (w, h, 300, "dib")),
        (4, "video", bytearray(encode_avi_dib(other)), (w, h, 300, "dib")),
        (5, "image", bytearray(b"\x89PNG"), (0, 0, 0, "png")),  # ignored
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    ph = video_phash(media, n_frames=3).collect()
    by = {(r["media_id"], r["slot"]): r["vphash"] for r in ph}
    assert {m for m, _s in by} == {0, 1, 2, 3, 4}
    for s in range(3):
        assert by[(0, s)] == by[(1, s)] == by[(2, s)]  # re-encode + 2x: identical
    assert by[(0, 1)] != by[(3, 1)]                    # the edited slot differs

    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in video_near_dup_pairs(media, n_frames=3).collect()}
    assert pairs[(0, 1)] == 0 and pairs[(0, 2)] == 0 and pairs[(1, 2)] == 0
    assert (0, 3) not in pairs and (0, 4) not in pairs  # strict-AND holds

    # GIF container path decodes through the same print
    gif_frames = [f.copy() for f in frames]
    gmedia = spark.createDataFrame(
        [(10, "video", bytearray(encode_gif(gif_frames)), (w, h, 300, "gif")),
         (11, "video", bytearray(encode_avi_dib(frames)), (w, h, 300, "dib"))],
        MEDIA_SCHEMA,
    )
    gph = {(r["media_id"], r["slot"]): r["vphash"]
           for r in video_phash(gmedia, n_frames=3).collect()}
    for s in range(3):
        assert gph[(10, s)] == gph[(11, s)]  # lossless either way


def test_video_phash_fake_path_and_validation(spark):
    import pytest as _pytest

    from sstable_migrator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        video_phash,
    )

    media = spark.createDataFrame(
        [(0, "video", bytearray(b"abc"), (0, 0, 0, "fake")),
         (1, "video", bytearray(b"abd"), (0, 0, 0, "fake"))],
        MEDIA_SCHEMA,
    )
    got = {(r["media_id"], r["slot"]): r["vphash"]
           for r in video_phash(media, n_frames=2, real_decode=False).collect()}
    assert len(got) == 4
    with _pytest.raises(ValueError):
        video_phash(media, n_frames=0)
