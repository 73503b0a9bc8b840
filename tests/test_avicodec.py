"""AVI/MJPEG container codec: golden RIFF layout, round-trips through
the JPEG layer, header-only meta, timeline delays, loud errors on
foreign codecs and malformed containers. Mutation fuzzing lives in
tests/test_fuzz_decoders.py."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sstable_migrator_spark.functions.avicodec import (
    AviFormatError,
    avi_meta,
    decode_avi,
    encode_avi_mjpeg,
)


def _frames(n: int = 3, h: int = 24, w: int = 32) -> list[np.ndarray]:
    out = []
    for i in range(n):
        img = np.zeros((h, w, 3), np.uint8)
        img[:, :, 0] = (i * 60) % 256
        img[:, :, 1] = np.linspace(0, 255, w)[None, :]
        img[:, :, 2] = 128
        out.append(img)
    return out


def test_container_golden_layout():
    avi = encode_avi_mjpeg(_frames(2), fps=10.0)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", avi, 4)
    assert 8 + riff_size == len(avi)
    # first list is hdrl, containing avih then a vids strl
    assert avi[12:16] == b"LIST" and avi[20:24] == b"hdrl"
    assert avi[24:28] == b"avih"
    # avih: usec/frame, total frames, width, height at fixed offsets
    usec, frames_n = struct.unpack_from("<I", avi, 32)[0], struct.unpack_from("<I", avi, 48)[0]
    w, h = struct.unpack_from("<II", avi, 64)
    assert usec == 100_000 and frames_n == 2 and (w, h) == (32, 24)
    assert b"vids" in avi and b"MJPG" in avi and b"movi" in avi and b"idx1" in avi
    assert b"00dc" in avi


def test_roundtrip_frames_and_delays():
    frames = _frames(4)
    avi = encode_avi_mjpeg(frames, fps=5.0, quality=92)
    dec = decode_avi(avi)
    assert len(dec) == 4
    for src, d in zip(frames, dec):
        assert d["pixels"].shape == src.shape
        assert d["delay_ms"] == 200
        assert int(np.abs(d["pixels"].astype(int) - src.astype(int)).max()) <= 4


def test_meta_header_only():
    avi = encode_avi_mjpeg(_frames(3, h=16, w=48), fps=24.0)
    m = avi_meta(avi)
    assert m == {"width": 48, "height": 16, "n_frames": 3, "fps": 24.0, "codec": "mjpg"}
    # meta must not need the movi payload intact: corrupt a frame byte
    b = bytearray(avi)
    b[-20] ^= 0xFF
    assert avi_meta(bytes(b))["n_frames"] == 3


def test_foreign_codec_rejected():
    avi = bytearray(encode_avi_mjpeg(_frames(1), fps=10.0))
    idx = bytes(avi).index(b"MJPG", bytes(avi).index(b"strf"))
    avi[idx : idx + 4] = b"H264"
    # strh handler too (decode_avi prefers biCompression)
    idx2 = bytes(avi).index(b"MJPG")
    avi[idx2 : idx2 + 4] = b"H264"
    with pytest.raises(AviFormatError, match="H264"):
        decode_avi(bytes(avi))


def test_malformed_containers_rejected():
    with pytest.raises(AviFormatError, match="not a RIFF AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    avi = encode_avi_mjpeg(_frames(1), fps=10.0)
    with pytest.raises(AviFormatError):
        decode_avi(avi[:40])  # truncated before movi
    with pytest.raises(AviFormatError, match="no frames"):
        encode_avi_mjpeg([], fps=10.0)
    with pytest.raises(AviFormatError, match="fps"):
        encode_avi_mjpeg(_frames(1), fps=0)


def test_frame_shape_mismatch_rejected():
    frames = _frames(2)
    frames[1] = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(AviFormatError, match="canvas"):
        encode_avi_mjpeg(frames, fps=10.0)


def test_sample_frames_real_decode_avi(spark):
    """sample_frames(real_decode=True) over an AVI/MJPEG payload: 4
    frames at 5 fps (200 ms each) sampled every 200 ms returns one row
    per frame with real pixel features."""
    from sstable_migrator_spark.functions.imagecodec import image_features
    from sstable_migrator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_features,
        sample_frames,
    )

    frames = _frames(4)
    avi = encode_avi_mjpeg(frames, fps=5.0, quality=92)
    media = spark.createDataFrame(
        [(1, "video", bytearray(avi), (32, 24, 800, "mjpg"))], MEDIA_SCHEMA
    )
    rows = sorted(
        sample_frames(media, every_ms=200, real_decode=True).collect(),
        key=lambda r: r["frame_ts_ms"],
    )
    assert [r["frame_index"] for r in rows] == [0, 1, 2, 3]
    assert [r["frame_ts_ms"] for r in rows] == [0, 200, 400, 600]
    assert all((r["width"], r["height"]) == (32, 24) for r in rows)
    # features are the decoded-pixel statistics, not payload hashes
    decoded = decode_avi(avi)
    for r, d in zip(rows, decoded):
        want = image_features(d["pixels"], 8)
        assert np.allclose(r["feature"], want, atol=1e-6)

    feats = decode_features(media, real_decode=True).collect()
    assert len(feats) == 1
    assert np.allclose(
        feats[0]["feature"], image_features(decoded[0]["pixels"], 8), atol=1e-6
    )


def test_bi_rgb_codec_fourcc_fallback():
    """biCompression = 0 (BI_RGB) is four NUL bytes — truthy, so the
    codec name must fall back to the strh handler (or 'DIB ') instead
    of reporting NULs."""
    avi = bytearray(encode_avi_mjpeg(_frames(1), fps=10.0))
    strf_at = bytes(avi).index(b"MJPG", bytes(avi).index(b"strf"))
    avi[strf_at : strf_at + 4] = b"\x00\x00\x00\x00"  # BI_RGB
    m = avi_meta(bytes(avi))
    assert m["codec"] == "mjpg"  # strh handler fallback
    with pytest.raises(AviFormatError) as ei:  # decode refuses non-MJPG...
        strh_at = bytes(avi).index(b"MJPG")
        avi[strh_at : strh_at + 4] = b"\x00\x00\x00\x00"
        decode_avi(bytes(avi))
    assert "DIB" in str(ei.value)  # ...and names the real codec, not NULs


def test_dib_roundtrip_lossless():
    """Raw BI_RGB frames round-trip bit-exactly (bottom-up BGR rows,
    4-byte stride padding exercised by the odd width)."""
    from sstable_migrator_spark.functions.avicodec import encode_avi_dib

    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 256, (13, 17, 3)).astype(np.uint8) for _ in range(3)]
    avi = encode_avi_dib(frames, fps=8.0)
    m = avi_meta(avi)
    assert (m["width"], m["height"], m["n_frames"], m["codec"]) == (17, 13, 3, "dib")
    dec = decode_avi(avi)
    assert len(dec) == 3
    for d, f in zip(dec, frames):
        assert np.array_equal(d["pixels"], f)
    assert dec[0]["delay_ms"] == 125


def test_dib_zero_geometry_rejected():
    avi = bytearray(encode_avi_mjpeg(_frames(1), fps=10.0))
    # turn it into a BI_RGB stream claiming height 0
    strf_at = bytes(avi).index(b"strf")
    import struct as _s

    _s.pack_into("<i", avi, strf_at + 8 + 8, 0)  # biHeight = 0
    comp_at = bytes(avi).index(b"MJPG", strf_at)
    avi[comp_at : comp_at + 4] = b"\x00\x00\x00\x00"
    strh_at = bytes(avi).index(b"MJPG")
    avi[strh_at : strh_at + 4] = b"DIB "
    avih_at = bytes(avi).index(b"avih")
    _s.pack_into("<I", avi, avih_at + 8 + 36, 0)  # dwHeight = 0
    with pytest.raises(AviFormatError, match="geometry|frames"):
        decode_avi(bytes(avi))


def test_dib_size_image_is_stride_padded():
    """biSizeImage must be the real stride-padded frame size (the
    authoritative value for BI_RGB), not w*h*3."""
    import struct as _s

    from sstable_migrator_spark.functions.avicodec import encode_avi_dib

    avi = encode_avi_dib(_frames(1, h=13, w=17), fps=10.0)
    strf_at = avi.index(b"strf")
    (size_image,) = _s.unpack_from("<I", avi, strf_at + 8 + 20)
    stride = (17 * 3 + 3) & ~3
    assert size_image == stride * 13 == 676  # not 663
