"""GIF89a codec (functions/gifcodec.py): golden header bytes, LZW
round-trips through width growth and the 4096 dictionary reset,
interlace, transparency compositing, disposal methods, and the real
frame-sampling operator."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sstable_migrator_spark.functions.gifcodec import (
    GifFormatError,
    _lzw_encode,
    decode_gif,
    encode_gif,
)

PAL7 = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
     [255, 255, 0], [0, 255, 255], [255, 255, 255]],
    dtype=np.uint8,
)


def test_golden_header_bytes():
    img = PAL7[np.zeros((2, 3), dtype=int)]  # all black 3x2
    gif = encode_gif([img], [100])
    assert gif[:6] == b"GIF89a"
    w, h, packed, bg, aspect = struct.unpack_from("<HHBBB", gif, 6)
    assert (w, h) == (3, 2)
    assert packed & 0x80  # global color table present
    assert bg == 0 and aspect == 0
    assert gif[-1:] == b"\x3b"  # trailer
    # graphic control extension present with the delay in centiseconds
    i = gif.index(b"\x21\xf9")
    assert gif[i + 2] == 4  # block size
    (delay_cs,) = struct.unpack_from("<H", gif, i + 4)
    assert delay_cs == 10


def test_animation_roundtrip():
    rng = np.random.RandomState(11)
    frames = [PAL7[rng.randint(0, 7, size=(13, 17))] for _ in range(5)]
    out = decode_gif(encode_gif(frames, [20, 30, 40, 50, 60]))
    assert [f["delay_ms"] for f in out] == [20, 30, 40, 50, 60]
    for a, b in zip(frames, out):
        assert (a == b["pixels"]).all()


def test_lzw_width_growth_and_dict_reset():
    """300x400 of 256 random colors forces codes past every width bump
    and through the 4096-entry dictionary reset."""
    rng = np.random.RandomState(5)
    pal = np.arange(256 * 3, dtype=np.uint8).reshape(256, 3)
    img = pal[rng.randint(0, 256, size=(300, 400))]
    got = decode_gif(encode_gif([img]))[0]["pixels"]
    assert (got == img).all()


def test_interlaced_frame_decodes():
    """Hand-assemble an interlaced frame (file rows in 8/8-4-2 pass
    order) and expect the de-interlaced image."""
    h, w = 8, 4
    img_idx = np.arange(h * w, dtype=np.uint8).reshape(h, w) % 7
    # interlace file order for h=8: rows 0, 4, 2 6, 1 3 5 7
    order = [0, 4, 2, 6, 1, 3, 5, 7]
    file_rows = img_idx[order]
    lzw = _lzw_encode(file_rows.tobytes(), 3)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 2, 0, 0)  # 8-entry table
    table = np.zeros((8, 3), dtype=np.uint8)
    table[:7] = PAL7
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlace flag
    out += bytes([3])
    out += bytes([len(lzw)]) + lzw + b"\x00"
    out += b"\x3b"
    got = decode_gif(bytes(out))[0]["pixels"]
    assert (got == PAL7[img_idx]).all()


def _manual_two_frame(disposal: int, transparent: int | None):
    """Frame 1: full 4x4 of color 1. Frame 2: 2x2 patch at (1,1) of
    color 2 with optional transparent index 3 holes."""
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 2, 0, 0)
    table = np.zeros((8, 3), dtype=np.uint8)
    table[:7] = PAL7
    out += table.tobytes()
    # frame 1: GCE disposal, then full canvas of color 1
    flags = (disposal << 2) | (1 if transparent is not None else 0)
    out += b"\x21\xf9\x04" + bytes([flags]) + struct.pack("<H", 10) + bytes(
        [transparent or 0]
    ) + b"\x00"
    f1 = np.full((4, 4), 1, dtype=np.uint8)
    lzw1 = _lzw_encode(f1.tobytes(), 3)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
    out += bytes([3]) + bytes([len(lzw1)]) + lzw1 + b"\x00"
    # frame 2: 2x2 patch at (1,1): [[2, T],[T, 2]] where T = transparent
    out += b"\x21\xf9\x04" + bytes([flags]) + struct.pack("<H", 10) + bytes(
        [transparent or 0]
    ) + b"\x00"
    t = transparent if transparent is not None else 2
    f2 = np.array([[2, t], [t, 2]], dtype=np.uint8)
    lzw2 = _lzw_encode(f2.tobytes(), 3)
    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    out += bytes([3]) + bytes([len(lzw2)]) + lzw2 + b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_transparency_shows_prior_canvas():
    frames = decode_gif(_manual_two_frame(disposal=1, transparent=3))
    assert len(frames) == 2
    c2 = frames[1]["pixels"]
    # patch diagonal painted color 2; transparent holes keep color 1
    assert (c2[1, 1] == PAL7[2]).all() and (c2[2, 2] == PAL7[2]).all()
    assert (c2[1, 2] == PAL7[1]).all() and (c2[2, 1] == PAL7[1]).all()
    assert (c2[0, 0] == PAL7[1]).all()  # untouched canvas


def test_disposal_background_clears_region():
    """Disposal 2 after frame 1 restores the frame's region to
    transparent background (black canvas) before frame 2 draws."""
    frames = decode_gif(_manual_two_frame(disposal=2, transparent=None))
    c2 = frames[1]["pixels"]
    # frame 1 covered the whole canvas and was disposed to background,
    # so outside frame 2's opaque pixels the canvas is black again
    assert (c2[0, 0] == 0).all()
    assert (c2[1, 1] == PAL7[2]).all()


def test_disposal_previous_raises():
    with pytest.raises(NotImplementedError, match="disposal"):
        decode_gif(_manual_two_frame(disposal=3, transparent=None))


def test_malformed_rejected():
    with pytest.raises(GifFormatError, match="not a GIF"):
        decode_gif(b"PNG\x00\x00\x00")
    with pytest.raises(GifFormatError, match="256"):
        pal = np.arange(257 * 3 % 256, dtype=np.uint8)
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, size=(30, 30, 3), dtype=np.uint8)
        img[0, 0] = [1, 2, 3]  # ensure > 256 distinct very likely
        encode_gif([img])


def test_sample_frames_real_decode(spark):
    """sample_frames(real_decode=True): a 3-frame GIF at 100ms delays
    sampled every 100ms yields one row per frame with real pixel
    features; every_ms=150 skips frames by timeline."""
    import pandas as pd

    from sstable_migrator_spark.operators.multimodal import sample_frames

    frames = [PAL7[np.full((6, 8), c, dtype=int)] for c in (1, 2, 3)]
    gif = encode_gif(frames, [100, 100, 100])
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [9],
                "kind": ["video"],
                "payload": [bytearray(gif)],
                "meta": [{"width": 8, "height": 6, "duration_ms": 300,
                          "codec": "gif"}],
            }
        )
    )
    rows = sample_frames(media, every_ms=100, real_decode=True).collect()
    assert [r["frame_index"] for r in rows] == [0, 1, 2]
    assert all(r["width"] == 8 and r["height"] == 6 for r in rows)
    # frame 0 is pure red: feature[0] = mean of R channel = 1.0
    assert rows[0]["feature"][0] == pytest.approx(1.0)
    assert rows[0]["feature"][2] == pytest.approx(0.0)  # no blue
    rows150 = sample_frames(media, every_ms=150, real_decode=True).collect()
    assert [r["frame_ts_ms"] for r in rows150] == [0, 150]
    assert [r["frame_index"] for r in rows150] == [0, 1]


def test_gce_scopes_single_frame():
    """A GCE governs only the NEXT image block (GIF89a): frame 2
    without its own GCE must treat frame 1's transparent index as an
    ordinary opaque color."""
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x80 | 2, 0, 0)
    table = np.zeros((8, 3), dtype=np.uint8)
    table[:7] = PAL7
    out += table.tobytes()
    # frame 1: GCE with transparent index 3, canvas of color 1
    out += b"\x21\xf9\x04\x01" + struct.pack("<H", 10) + bytes([3]) + b"\x00"
    lzw1 = _lzw_encode(np.full((2, 2), 1, np.uint8).tobytes(), 3)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    out += bytes([3]) + bytes([len(lzw1)]) + lzw1 + b"\x00"
    # frame 2: NO GCE, all pixels index 3 — must paint opaque color 3
    lzw2 = _lzw_encode(np.full((2, 2), 3, np.uint8).tobytes(), 3)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    out += bytes([3]) + bytes([len(lzw2)]) + lzw2 + b"\x00"
    out += b"\x3b"
    frames = decode_gif(bytes(out))
    assert (frames[1]["pixels"] == PAL7[3]).all()
    assert frames[1]["delay_ms"] == 0  # delay not inherited either


def test_delay_count_mismatch_rejected():
    """Fewer delays than frames used to silently drop trailing frames."""
    import pytest

    frames = [PAL7[np.zeros((4, 4), dtype=int)] for _ in range(3)]
    with pytest.raises(GifFormatError, match="delays"):
        encode_gif(frames, [10, 20])
    # centisecond quantization is documented: 105 ms floors to 100 ms
    out = decode_gif(encode_gif(frames, [105, 110, 115]))
    assert [f["delay_ms"] for f in out] == [100, 110, 110]


def test_empty_delays_list_rejected():
    """An explicitly EMPTY delays list must hit the mismatch guard,
    not silently default to 100 ms."""
    import pytest

    frames = [PAL7[np.zeros((4, 4), dtype=int)] for _ in range(3)]
    with pytest.raises(GifFormatError, match="delays"):
        encode_gif(frames, [])
