"""Baseline JPEG codec: structural golden bytes (marker layout, Annex
K table payloads), canonical-Huffman self-checks, exact DC-only
round-trips, PSNR-bounded round-trips across subsampling/restart
variants, and loud errors on the unsupported processes. Mutation
fuzzing lives in tests/test_fuzz_decoders.py."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sstable_migrator_spark.functions.imagecodec import (
    ImageFormatError,
    decode_image,
    image_meta,
    sniff_format,
)
from sstable_migrator_spark.functions.jpegcodec import (
    AC_CHROMA,
    AC_LUMA,
    DC_CHROMA,
    DC_LUMA,
    QUANT_LUMA,
    ZIGZAG,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
    jpeg_meta,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def _gradient(h: int, w: int) -> np.ndarray:
    img = np.zeros((h, w, 3))
    img[:, :, 0] = np.linspace(0, 255, w)[None, :]
    img[:, :, 1] = np.linspace(0, 255, h)[:, None]
    img[:, :, 2] = 100
    return img.astype(np.uint8)


# ---------------------------------------------------------------------------
# table self-checks
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("tab", [DC_LUMA, DC_CHROMA, AC_LUMA, AC_CHROMA])
def test_huffman_tables_canonical_prefix_free(tab):
    bits, values = tab
    assert sum(bits) == len(values)
    codes = _canonical_codes(bits, values)
    # prefix-free: no code is a prefix of another
    items = sorted(codes.values(), key=lambda cl: cl[1])
    for i, (c1, l1) in enumerate(items):
        for c2, l2 in items[i + 1 :]:
            assert (c2 >> (l2 - l1)) != c1, "prefix violation"


def test_ac_tables_cover_all_run_size_symbols():
    """Every (run 0-15, size 1-10) symbol plus EOB and ZRL must be
    encodable — the encoder emits any of them."""
    for bits, values in (AC_LUMA, AC_CHROMA):
        syms = set(values)
        assert 0x00 in syms and 0xF0 in syms  # EOB, ZRL
        for run in range(16):
            for size in range(1, 11):
                assert (run << 4) | size in syms
        assert len(values) == 162


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # first entries of the public zigzag path
    assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]


# ---------------------------------------------------------------------------
# golden structure
# ---------------------------------------------------------------------------


def test_marker_layout_golden():
    img = np.full((8, 8, 3), 128, np.uint8)
    enc = encode_jpeg(img, 50)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert enc[2:4] == b"\xff\xe0" and enc[6:11] == b"JFIF\x00"
    # walk segments; collect marker sequence until SOS
    seen = []
    pos = 2
    while True:
        marker = struct.unpack_from(">H", enc, pos)[0]
        seen.append(marker)
        if marker == 0xFFDA:
            break
        (length,) = struct.unpack_from(">H", enc, pos + 2)
        pos += 2 + length
    assert seen == [0xFFE0, 0xFFDB, 0xFFDB, 0xFFC0, 0xFFC4, 0xFFC4, 0xFFC4, 0xFFC4, 0xFFDA]


def test_dqt_payload_is_annex_k_at_q50():
    """libjpeg scaling at quality 50 is the identity — the DQT payload
    must be the Annex K luminance table in zigzag order."""
    enc = encode_jpeg(np.zeros((8, 8, 3), np.uint8), 50)
    pos = 2
    while struct.unpack_from(">H", enc, pos)[0] != 0xFFDB:
        pos += 2 + struct.unpack_from(">H", enc, pos + 2)[0]
    payload = enc[pos + 4 : pos + 4 + 65]
    assert payload[0] == 0x00  # 8-bit, table id 0
    assert list(payload[1:]) == QUANT_LUMA[ZIGZAG].tolist()


def test_sof0_dimensions_golden():
    enc = encode_jpeg(np.zeros((33, 41, 3), np.uint8))
    pos = 2
    while struct.unpack_from(">H", enc, pos)[0] != 0xFFC0:
        pos += 2 + struct.unpack_from(">H", enc, pos + 2)[0]
    prec, h, w, nc = struct.unpack_from(">BHHB", enc, pos + 4)
    assert (prec, h, w, nc) == (8, 33, 41, 3)


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------


def test_uniform_color_roundtrips_exactly():
    """A uniform image is DC-only; quantized DC of a flat block
    reconstructs the exact level at q>=50 for in-gamut colors."""
    for color in ([0, 0, 0], [255, 255, 255], [200, 64, 130]):
        img = np.full((16, 24, 3), color, np.uint8)
        dec = decode_jpeg(encode_jpeg(img, 90))
        assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 1, color


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("dri", [0, 3])
def test_gradient_roundtrip_psnr(subsample, dri):
    img = _gradient(70, 70)
    dec = decode_jpeg(encode_jpeg(img, 90, subsample=subsample, restart_interval=dri))
    assert dec.shape == img.shape
    floor = 45.0 if subsample == "444" else 40.0
    assert _psnr(dec, img) > floor


def test_noise_roundtrip_odd_dims():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, 95))
    assert dec.shape == (37, 53, 3)
    assert _psnr(dec, img) > 30.0


def test_restart_interval_resets_predictors():
    """DRI output must equal the no-DRI output exactly (same
    quantized coefficients, same IDCT) — restarts only re-frame the
    entropy stream."""
    img = _gradient(48, 32)
    a = decode_jpeg(encode_jpeg(img, 80, restart_interval=1))
    b = decode_jpeg(encode_jpeg(img, 80))
    assert np.array_equal(a, b)


def test_quality_monotone_size():
    img = _gradient(64, 64)
    sizes = [len(encode_jpeg(img, q)) for q in (10, 50, 95)]
    assert sizes == sorted(sizes)


# ---------------------------------------------------------------------------
# dispatch + meta
# ---------------------------------------------------------------------------


def test_sniff_and_decode_image_dispatch():
    img = _gradient(24, 16)
    enc = encode_jpeg(img, 92)
    assert sniff_format(enc) == "jpeg"
    dec = decode_image(enc)
    assert dec.shape == (24, 16, 3)
    assert image_meta(enc) == (16, 24, "jpeg")
    assert jpeg_meta(enc) == (16, 24, "jpeg")


# ---------------------------------------------------------------------------
# loud errors
# ---------------------------------------------------------------------------


def test_progressive_rejected():
    enc = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    pos = 2
    while struct.unpack_from(">H", enc, pos)[0] != 0xFFC0:
        pos += 2 + struct.unpack_from(">H", enc, pos + 2)[0]
    enc[pos + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ImageFormatError, match="non-baseline"):
        decode_jpeg(bytes(enc))


def test_not_a_jpeg_rejected():
    with pytest.raises(ImageFormatError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_oversize_frame_rejected():
    enc = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    pos = 2
    while struct.unpack_from(">H", enc, pos)[0] != 0xFFC0:
        pos += 2 + struct.unpack_from(">H", enc, pos + 2)[0]
    struct.pack_into(">HH", enc, pos + 5, 65535, 65535)
    with pytest.raises(ImageFormatError, match="px cap"):
        decode_jpeg(bytes(enc))


def test_truncated_entropy_rejected():
    enc = encode_jpeg(_gradient(32, 32), 85)
    with pytest.raises(ImageFormatError):
        decode_jpeg(enc[: len(enc) // 2])


def test_bad_quality_rejected():
    with pytest.raises(ImageFormatError, match="quality"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), 0)
    with pytest.raises(ImageFormatError, match="subsample"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), 50, subsample="422")


def test_malformed_marker_raises_image_format_error():
    """Truncated/length-corrupted marker segments must surface as
    ImageFormatError, never raw struct.error/IndexError (the contract
    decode_avi's frame wrapper relies on)."""
    import numpy as np

    enc = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    pos = 2
    while struct.unpack_from(">H", enc, pos)[0] != 0xFFC0:
        pos += 2 + struct.unpack_from(">H", enc, pos + 2)[0]
    truncated = bytes(enc[: pos + 6])  # SOF header cut mid-fields
    with pytest.raises(ImageFormatError):
        decode_jpeg(truncated)
    with pytest.raises(ImageFormatError):
        jpeg_meta(truncated)
    # length field claiming more bytes than remain
    bad = bytearray(enc)
    struct.pack_into(">H", bad, pos + 2, 60000)
    with pytest.raises(ImageFormatError):
        decode_jpeg(bytes(bad))
