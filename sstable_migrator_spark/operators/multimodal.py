"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs. The decode/feature steps are Arrow-batched
``mapInPandas`` operators. ``real_decode=True`` is a REAL path built
on the dependency-free codecs in functions/ (PNG/PPM/BMP/JPEG images,
RIFF/PCM WAV audio, animated-GIF and AVI/MJPEG video); proprietary
codecs (H.264 & friends) raise ``DecoderUnavailable`` loudly. The
default fake path exercises the same Spark-side contract — schema,
batch shape, partitioning — without touching any codec.

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
    """Raised by the real-decode path for media whose codecs are not
    available (H.264 & friends are not stdlib-feasible). Images
    real-decode via functions.imagecodec (PNG/PPM/BMP/JPEG), audio via
    functions.audiocodec (RIFF/PCM WAV), animated GIF video via
    functions.gifcodec (real LZW + frame compositing), and AVI/MJPEG
    video via functions.avicodec (RIFF walk + baseline JPEG frames) —
    all dependency-free — so ``real_decode=True`` is the real path for
    everything but proprietary video codecs, which stay a loud stub."""


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: bytes of sha256 scaled to [0,1).
    Replaces the (unavailable) image/audio decode+embed step."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def decode_features(media: DataFrame, dim: int = 8, real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``real_decode=True`` decodes image payloads (PNG/PPM/BMP via
    functions.imagecodec — pixels, not hashes) and audio payloads
    (RIFF/PCM WAV via functions.audiocodec — samples, not hashes) for
    real, computing channel-/sample-statistic features; video raises
    DecoderUnavailable (no container codec is stdlib-feasible, and a
    fake decoder would be worse than an honest error). The default
    fake path keeps schema/batching/partition behavior exercised
    without touching any codec.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decode:
            from sstable_migrator_spark.functions.audiocodec import (
                audio_features,
                decode_wav,
            )
            from sstable_migrator_spark.functions.imagecodec import (
                decode_image,
                image_features,
            )

            def real_feature(kind: str, b: bytes) -> list[float]:
                if kind == "image":
                    return image_features(decode_image(b), dim)
                if kind == "audio":
                    samples, rate = decode_wav(b)
                    f = audio_features(samples, rate)
                    scale = 32768.0
                    feats = [
                        f["peak"] / scale,
                        f["rms"] / scale,
                        f["zero_crossings"] / max(f["n_frames"], 1),
                        f["duration_ms"] / 1000.0,
                    ]
                    return (feats * ((dim + 3) // 4))[:dim]
                if kind == "video" and b[:6] in (b"GIF89a", b"GIF87a"):
                    from sstable_migrator_spark.functions.gifcodec import decode_gif

                    return image_features(decode_gif(b)[0]["pixels"], dim)
                if kind == "video" and b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    from sstable_migrator_spark.functions.avicodec import decode_avi

                    return image_features(decode_avi(b)[0]["pixels"], dim)
                raise DecoderUnavailable(
                    f"no codec for kind {kind!r}: images decode via imagecodec "
                    "(PNG/PPM/BMP/JPEG), audio via audiocodec (WAV/PCM), video "
                    "via gifcodec (animated GIF) or avicodec (AVI/MJPEG); "
                    "other video containers are stubbed"
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
                        "payload_bytes": payloads.map(lambda b: len(b or b"")).astype(
                            "int32"
                        ),
                        "feature": [
                            real_feature(k, bytes(b or b""))
                            for k, b in zip(pdf["kind"], payloads)
                        ],
                    }
                )
            return
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


def synthetic_image_media(spark, n: int = 24) -> DataFrame:
    """Media table whose payloads are REAL encoded images (deterministic
    gradients, alternating PNG and PPM) so the real-decode paths are
    exercised end-to-end without codec libraries."""
    import numpy as np

    from sstable_migrator_spark.functions.imagecodec import encode_png, encode_ppm

    rows = []
    for i in range(n):
        w, h = 16 + (i % 5) * 4, 12 + (i % 3) * 4
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack(
            [
                (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                np.full((h, w), i * 9 % 256, dtype=np.uint8),
            ],
            axis=2,
        )
        payload = encode_png(arr) if i % 2 == 0 else encode_ppm(arr)
        rows.append(
            (i, "image", bytearray(payload), (w, h, 0, "png" if i % 2 == 0 else "ppm"))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per planned frame timestamp
    (sequence over duration) — metadata only, no decode. Kept as the
    cheap planning shape; ``sample_frames(real_decode=True)`` below is
    the real path for animated-GIF payloads."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_ts_ms", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, dim: int = 8, real_decode: bool = False
) -> DataFrame:
    """Real video frame sampling over animated-GIF and AVI/MJPEG
    payloads (functions/gifcodec.py, functions/avicodec.py — the
    containers with a fully public stdlib-feasible stack): decode the
    animation, walk the frame timeline, keep the frame on display at
    each ``every_ms`` tick, and compute real pixel features per kept
    frame (imagecodec.image_features over the composited canvas). The
    fake path emits the same schema from metadata alone. Both are
    map-only Arrow-batched passes — frames never cross a shuffle;
    downstream rollups shuffle features, not pixels."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sstable_migrator_spark.functions.gifcodec import decode_gif
        from sstable_migrator_spark.functions.imagecodec import image_features

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "frame_index", "frame_ts_ms", "width", "height",
                "feature",
            )}
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                if not real_decode:
                    dur = max(int(meta["duration_ms"] or 0) if meta else 0, 1)
                    width = int(meta["width"] or 0) if meta else 0
                    height = int(meta["height"] or 0) if meta else 0
                    for fi, ts in enumerate(range(0, dur, every_ms)):
                        out["media_id"].append(mid)
                        out["frame_index"].append(fi)
                        out["frame_ts_ms"].append(ts)
                        out["width"].append(width)
                        out["height"].append(height)
                        # 4-byte index: bytes([fi]) caps at 256 frames
                        out["feature"].append(
                            _fake_feature(
                                bytes(payload or b"") + fi.to_bytes(4, "little"), dim
                            )
                        )
                    continue
                b = bytes(payload or b"")
                if b[:6] in (b"GIF89a", b"GIF87a"):
                    frames = decode_gif(b)
                elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    from sstable_migrator_spark.functions.avicodec import decode_avi

                    frames = decode_avi(b)
                else:
                    raise DecoderUnavailable(
                        "real frame sampling decodes animated GIF and AVI/MJPEG "
                        "only; other video containers are stubbed"
                    )
                # frame f is on display in [start_f, start_f + delay_f)
                starts = []
                t = 0
                for f in frames:
                    starts.append(t)
                    t += max(f["delay_ms"], 1)
                total = t
                fi = 0
                for ts in range(0, total, every_ms):
                    while fi + 1 < len(frames) and starts[fi + 1] <= ts:
                        fi += 1
                    px = frames[fi]["pixels"]
                    out["media_id"].append(mid)
                    out["frame_index"].append(fi)
                    out["frame_ts_ms"].append(ts)
                    out["width"].append(px.shape[1])
                    out["height"].append(px.shape[0])
                    out["feature"].append(image_features(px, dim))
            yield pd.DataFrame(out) if out["media_id"] else pd.DataFrame(
                {k: pd.Series(dtype="object") for k in out}
            )

    return media.mapInPandas(op, FRAME_SCHEMA)


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

    ``real_decode=True`` is the real path: decode (PNG/PPM/BMP,
    functions.imagecodec) -> nearest-neighbor resize -> re-encode PNG,
    metadata rewritten to the actual output dimensions. The default
    deterministic fake models only the resource shape (payload bytes
    proportional to target pixel count). Both paths are map-only: no
    shuffle, payload bytes never cross an exchange.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decode:
            from sstable_migrator_spark.functions.imagecodec import (
                decode_image,
                encode_png,
                resize_nearest,
            )

            for pdf in batches:
                out_payloads = pdf["payload"].map(
                    lambda b: bytearray(
                        encode_png(resize_nearest(decode_image(bytes(b or b"")), width, height))
                    )
                )
                meta = pd.DataFrame(
                    {
                        "width": [width] * len(pdf),
                        "height": [height] * len(pdf),
                        "duration_ms": [
                            m["duration_ms"] if m else 0 for m in pdf["meta"]
                        ],
                        "codec": ["png"] * len(pdf),
                    }
                )
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "payload": out_payloads,
                        "meta": meta.to_dict("records"),
                    }
                )
            return
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


def _phash_from_gray(g) -> int:
    """The shared pHash core (image prints, per-frame video prints):
    32x32 nearest-neighbor resize -> 2-D DCT-II -> 8x8 low-frequency
    block thresholded at its DC-excluded median -> 64-bit signed int."""
    import numpy as np

    n = 32
    h, w = g.shape
    # nearest-neighbor resize: deterministic integer index math
    yi = (np.arange(n) * h) // n
    xi = (np.arange(n) * w) // n
    small = g[np.ix_(yi, xi)].astype(np.float64)
    k = np.arange(n)
    basis = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    dct = basis @ small @ basis.T
    block = dct[:8, :8].flatten()
    med = np.median(block[1:])  # exclude DC
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << i
    # two's-complement into a signed 64-bit long for the Spark column
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_phash(media: DataFrame, real_decode: bool = True) -> DataFrame:
    """64-bit perceptual hash per image — the pHash recipe: decode ->
    ITU-R 601 grayscale -> 32x32 nearest-neighbor resize -> 2-D DCT-II
    -> the 8x8 low-frequency block thresholded at its own median (DC
    excluded from the median so flat images don't flip on it). Two
    images that differ by re-encoding, mild noise, or small edits land
    within a few hamming bits; unrelated images land ~32 apart.
    Arrow-batched mapInPandas (the image libs stay optional: with
    ``real_decode=False`` payload bytes are hashed through the same
    pipeline shape via a deterministic fake gray square, keeping
    plumbing testable without codecs). Returns (media_id, phash).

    Pair mining composes with ``dedup.hamming_near_dup_pairs`` — the
    same exact banded joiner SimHash uses, so only (id, long) rows
    shuffle at 100 TB; see ``image_near_dup_pairs``."""
    import numpy as np
    import pandas as pd

    _phash_gray = _phash_from_gray

    def op(batches):
        from sstable_migrator_spark.functions.imagecodec import decode_image

        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                b = bytes(payload or b"")
                if real_decode:
                    arr = decode_image(b)
                    gray = (
                        0.299 * arr[:, :, 0]
                        + 0.587 * arr[:, :, 1]
                        + 0.114 * arr[:, :, 2]
                    )
                else:
                    import hashlib as _hl

                    seed = np.frombuffer(
                        _hl.sha256(b).digest() * 128, dtype=np.uint8
                    )[: 64 * 64]
                    gray = seed.reshape(64, 64).astype(np.float64)
                out.append({"media_id": int(mid), "phash": _phash_gray(gray)})
            if out:
                yield pd.DataFrame(out)

    return media.mapInPandas(op, "media_id long, phash long")


def image_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 7,
    bands: int = 8,
    real_decode: bool = True,
) -> DataFrame:
    """Near-duplicate image pairs: perceptual hashes + the exact banded
    hamming join (every pair within ``max_hamming`` found, pigeonhole —
    requires max_hamming < bands). Returns (id_a, id_b, hamming)."""
    from sstable_migrator_spark.operators.dedup import hamming_near_dup_pairs

    ph = image_phash(media, real_decode=real_decode).localCheckpoint()
    return hamming_near_dup_pairs(
        ph, hash_col="phash", id_col="media_id",
        bits=64, bands=bands, max_hamming=max_hamming,
    )


def audio_phash(media: DataFrame, real_decode: bool = True) -> DataFrame:
    """64-bit perceptual hash per audio clip — the image pHash recipe
    applied to a coarse spectrogram: decode -> mono -> 32 equal time
    windows x per-window DCT-II -> keep each window's first 32
    magnitude bands -> 2-D DCT of the 32x32 log-magnitude grid -> the
    8x8 low-frequency block thresholded at its DC-excluded median.
    Median thresholding makes the print invariant to uniform volume
    scaling; re-encoded or mildly noised copies land within a few
    hamming bits. Arrow-batched mapInPandas; pair mining composes with
    ``dedup.hamming_near_dup_pairs`` exactly like the image prints.
    Returns (media_id, aphash) for ``kind == "audio"`` rows."""
    import numpy as np
    import pandas as pd

    n = 32

    def _hash_grid(grid: "np.ndarray") -> int:
        k = np.arange(n)
        basis = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
        dct = basis @ grid @ basis.T
        block = dct[:8, :8].flatten()
        med = np.median(block[1:])
        bits = 0
        for i, v in enumerate(block):
            if v > med:
                bits |= 1 << i
        return bits - (1 << 64) if bits >= (1 << 63) else bits

    def _spectrogram(x: "np.ndarray") -> "np.ndarray":
        # pad to a multiple of 32 windows, window length >= 32 samples
        wlen = max(32, -(-len(x) // n))
        pad = wlen * n - len(x)
        if pad:
            x = np.concatenate([x, np.zeros(pad)])
        frames = x.reshape(n, wlen)
        k = np.arange(wlen)
        # 32 bands SPREAD across the full spectrum (taking bands
        # 0..31 of a long window would cover only the lowest sliver
        # of frequencies and hash mostly noise)
        u = (np.arange(n) * wlen) // n
        basis = np.cos((2 * k[None, :] + 1) * u[:, None] * np.pi / (2 * wlen))
        mags = np.abs(frames @ basis.T)  # (windows, bands)
        return np.log1p(mags)

    def op(batches):
        from sstable_migrator_spark.functions.audiocodec import decode_wav

        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                b = bytes(payload or b"")
                if real_decode:
                    samples, _rate = decode_wav(b)
                    x = samples.astype(np.float64).mean(axis=1)
                else:
                    import hashlib as _hl

                    seed = np.frombuffer(
                        _hl.sha256(b).digest() * 64, dtype=np.uint8
                    )[: 32 * 32]
                    x = seed.astype(np.float64)
                out.append(
                    {"media_id": int(mid), "aphash": _hash_grid(_spectrogram(x))}
                )
            if out:
                yield pd.DataFrame(out)

    return media.mapInPandas(op, "media_id long, aphash long")


def audio_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 7,
    bands: int = 8,
    real_decode: bool = True,
) -> DataFrame:
    """Near-duplicate audio pairs via the exact banded hamming join
    over the perceptual prints. Returns (id_a, id_b, hamming)."""
    from sstable_migrator_spark.operators.dedup import hamming_near_dup_pairs

    ah = audio_phash(media, real_decode=real_decode).localCheckpoint()
    return hamming_near_dup_pairs(
        ah, hash_col="aphash", id_col="media_id",
        bits=64, bands=bands, max_hamming=max_hamming,
    )


def video_phash(
    media: DataFrame, n_frames: int = 3, real_decode: bool = True
) -> DataFrame:
    """Per-slot perceptual prints for video — the triad's third leg:
    decode (GIF89a / AVI via the from-scratch codecs), sample
    ``n_frames`` frames at deterministic relative positions
    (``idx = slot * (F - 1) // (n_frames - 1)`` — first/.../last; every
    slot of a single-frame video is frame 0), grayscale each sampled
    frame, and pHash it with the SAME core the image prints use.
    Returns ``(media_id, slot, vphash)`` — one 64-bit print per slot,
    so two videos compare slot-by-slot (robust to re-encoding; cuts and
    re-edits diverge in the slots they change). Arrow-batched
    mapInPandas over ``kind == "video"`` rows; with
    ``real_decode=False`` a deterministic fake gray frame per slot
    keeps the plumbing testable without codecs."""
    import numpy as np
    import pandas as pd

    if n_frames < 1:
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")

    def op(batches):
        from sstable_migrator_spark.functions.gifcodec import decode_gif

        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                b = bytes(payload or b"")
                if real_decode:
                    if b[:6] in (b"GIF89a", b"GIF87a"):
                        frames = decode_gif(b)
                    elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                        from sstable_migrator_spark.functions.avicodec import (
                            decode_avi,
                        )

                        frames = decode_avi(b)
                    else:
                        raise DecoderUnavailable(
                            "video prints decode animated GIF and AVI only; "
                            "other containers are stubbed"
                        )
                    nf = len(frames)
                    for slot in range(n_frames):
                        idx = (
                            slot * (nf - 1) // (n_frames - 1)
                            if n_frames > 1
                            else 0
                        )
                        px = frames[idx]["pixels"]
                        gray = (
                            0.299 * px[:, :, 0]
                            + 0.587 * px[:, :, 1]
                            + 0.114 * px[:, :, 2]
                        )
                        out.append(
                            {
                                "media_id": int(mid),
                                "slot": slot,
                                "vphash": _phash_from_gray(gray),
                            }
                        )
                else:
                    import hashlib as _hl

                    for slot in range(n_frames):
                        seed = np.frombuffer(
                            _hl.sha256(b + bytes([slot])).digest() * 128,
                            dtype=np.uint8,
                        )[: 64 * 64]
                        gray = seed.reshape(64, 64).astype(np.float64)
                        out.append(
                            {
                                "media_id": int(mid),
                                "slot": slot,
                                "vphash": _phash_from_gray(gray),
                            }
                        )
            if out:
                yield pd.DataFrame(out)

    return media.mapInPandas(op, "media_id long, slot int, vphash long")


def video_near_dup_pairs(
    media: DataFrame,
    n_frames: int = 3,
    max_hamming: int = 7,
    bands: int = 8,
    real_decode: bool = True,
) -> DataFrame:
    """Near-duplicate video pairs: EVERY sampled slot must land within
    ``max_hamming`` (the strict-AND composition — one re-edited slot
    disqualifies the pair, which is what training-data video dedup
    wants; loosen by lowering ``n_frames``). One exact banded-hamming
    join per slot (a small fixed constant), inner-joined on the pair —
    only (id, long) rows shuffle. Returns ``(id_a, id_b, hamming)``
    with hamming = the WORST slot's distance."""
    from sstable_migrator_spark.operators.dedup import hamming_near_dup_pairs

    vp = video_phash(media, n_frames=n_frames, real_decode=real_decode)
    vp = vp.localCheckpoint()
    pairs = None
    for slot in range(n_frames):
        p = hamming_near_dup_pairs(
            vp.filter(F.col("slot") == slot).select("media_id", "vphash"),
            hash_col="vphash",
            id_col="media_id",
            bits=64,
            bands=bands,
            max_hamming=max_hamming,
        ).withColumnRenamed("hamming", f"_h{slot}")
        pairs = p if pairs is None else pairs.join(p, ["id_a", "id_b"])
    worst = (
        F.col("_h0")
        if n_frames == 1
        else F.greatest(*[F.col(f"_h{s}") for s in range(n_frames)])
    )
    return pairs.select("id_a", "id_b", worst.cast("int").alias("hamming"))
