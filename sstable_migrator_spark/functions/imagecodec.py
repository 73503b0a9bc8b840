"""Dependency-free image codec for the multimodal operators.

The multimodal brief calls for decode / feature-extract / resize over
opaque binary columns. This container ships no PIL/opencv, so the
previous round stubbed the codec behind ``DecoderUnavailable``. This
module makes the decode step REAL for the formats that need only the
standard library + numpy:

- PNG (stdlib zlib): bit depth 8; color types gray / RGB / palette /
  gray+alpha / RGBA; all five scanline filters (None/Sub/Up/Average/
  Paeth); Adam7 interlace (seven independently-filtered sub-images
  scattered back onto the pass grids).
- PPM (P6) / PGM (P5), maxval 255 — the classic uncompressed formats.
- BMP: 24/32-bit uncompressed bottom-up Windows DIB.
- JPEG: baseline JFIF via functions.jpegcodec (Annex K tables,
  canonical Huffman, 4:4:4 / 4:2:2 / 4:2:0, restart markers);
  progressive raises loudly.

If PIL happens to be importable it is preferred (wider coverage);
everything below is the guaranteed fallback. Decoders return
``(H, W, 3) uint8`` numpy arrays; encoders exist for PNG and PPM so
resize can re-emit a self-describing payload.

Execution shape: these run inside Arrow-batched ``mapInPandas`` only
(operators.multimodal); nothing here touches a SparkSession.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class ImageFormatError(ValueError):
    """Unsupported or malformed image payload."""


# --------------------------------------------------------------------------
# sniffing
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(data: bytes) -> str | None:
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] in (b"P5", b"P6"):
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return None


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        yield ctype, chunk
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. ``raw`` is the decompressed stream of
    ``height * (1 + stride)`` bytes; returns (height, stride) uint8."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ImageFormatError(f"unknown PNG filter {ftype}")
        cur = cur.astype(np.uint8)
        out[y] = cur
        prev = cur
    return out


# Adam7 pass grids (PNG spec 4.5.2): (x0, y0, dx, dy) per pass
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _deinterlace_adam7(
    raw: np.ndarray, width: int, height: int, channels: int
) -> np.ndarray:
    """Adam7: seven consecutive sub-images, each filtered independently
    with its own scanline stride; pixels scatter back onto the
    (x0 + i*dx, y0 + j*dy) grid."""
    out = np.zeros((height, width, channels), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        stride = pw * channels
        need = ph * (1 + stride)
        if pos + need > len(raw):
            raise ImageFormatError("IDAT size mismatch (interlaced)")
        sub = _unfilter(raw[pos : pos + need], ph, stride, channels)
        pos += need
        out[y0::dy, x0::dx] = sub.reshape(ph, pw, channels)
    if pos != len(raw):
        raise ImageFormatError("IDAT size mismatch (interlaced)")
    return out


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ImageFormatError("not a PNG")
    width = height = -1
    bit_depth = color_type = interlace = 0
    palette = None
    idat = b""
    for ctype, chunk in _png_chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
    if width < 0:
        raise ImageFormatError("missing IHDR")
    if bit_depth != 8:
        raise ImageFormatError(f"unsupported bit depth {bit_depth}")
    if interlace not in (0, 1):
        raise ImageFormatError(f"unknown interlace method {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ImageFormatError(f"unsupported color type {color_type}")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if interlace:
        px = _deinterlace_adam7(raw, width, height, channels)
    else:
        stride = width * channels
        if len(raw) != height * (1 + stride):
            raise ImageFormatError("IDAT size mismatch")
        px = _unfilter(raw, height, stride, channels).reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ImageFormatError("palette image without PLTE")
        return palette[px[:, :, 0]]
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if color_type == 6:
        return px[:, :, :3].copy()
    return px


def encode_png(arr: np.ndarray) -> bytes:
    """RGB uint8 -> PNG, color type 2, filter 0 rows."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ImageFormatError("encode_png expects (H, W, 3)")
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# PPM / PGM
# --------------------------------------------------------------------------


def decode_ppm(data: bytes) -> np.ndarray:
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ImageFormatError("not a binary PPM/PGM")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ImageFormatError(f"maxval {maxval} unsupported")
    channels = 3 if magic == b"P6" else 1
    need = width * height * channels
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    px = px.reshape(height, width, channels)
    return np.repeat(px, 3, axis=2) if channels == 1 else px.copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ImageFormatError("encode_ppm expects (H, W, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ImageFormatError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ImageFormatError("BITMAPCOREHEADER unsupported")
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ImageFormatError(f"BMP bpp={bpp} compression={compression} unsupported")
    flip = height > 0
    height = abs(height)
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3
    rows = []
    for y in range(height):
        row = np.frombuffer(data, np.uint8, width * nch, pixel_off + y * row_bytes)
        rows.append(row.reshape(width, nch)[:, :3][:, ::-1])  # BGR(A) -> RGB
    px = np.stack(rows)
    return px[::-1] if flip else px


# --------------------------------------------------------------------------
# dispatch, meta, resize
# --------------------------------------------------------------------------


def decode_image(data: bytes) -> np.ndarray:
    """Binary payload -> (H, W, 3) uint8. Prefers PIL when importable
    (JPEG etc.); otherwise the pure decoders above."""
    fmt = sniff_format(data)
    try:  # optional fast/wide path; ANY failure falls through to the
        # pure decoders so the contract stays ImageFormatError, not a
        # PIL-specific exception, and PIL-rejected-but-valid payloads
        # still get a second chance
        import io

        from PIL import Image  # noqa: PLC0415

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    except Exception:  # noqa: BLE001 — ImportError or PIL decode failure
        pass
    if fmt == "png":
        return decode_png(data)
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "jpeg":
        from sstable_migrator_spark.functions.jpegcodec import decode_jpeg

        return decode_jpeg(data)
    raise ImageFormatError("unrecognized image payload")


def image_meta(data: bytes) -> tuple[int, int, str]:
    """Cheap header-only (width, height, codec) sniff — no pixel decode."""
    fmt = sniff_format(data)
    if fmt == "png":
        for ctype, chunk in _png_chunks(data):
            if ctype == b"IHDR":
                w, h = struct.unpack(">II", chunk[:8])
                return w, h, "png"
        raise ImageFormatError("missing IHDR")
    if fmt == "ppm":
        # header-only: parse the three ASCII fields, never touch pixels
        fields, pos = [], 2
        while len(fields) < 2:
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":  # comment line
                pos = data.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(data[start:pos]))
        w, h = fields[0], fields[1]
        return w, h, "ppm"
    if fmt == "bmp":
        w, h = struct.unpack_from("<ii", data, 18)
        return w, abs(h), "bmp"
    if fmt == "jpeg":
        from sstable_migrator_spark.functions.jpegcodec import jpeg_meta

        return jpeg_meta(data)
    raise ImageFormatError("unrecognized image payload")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pure numpy indexing)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]


def image_features(arr: np.ndarray, dim: int = 8) -> list[float]:
    """Deterministic real-pixel feature vector: per-channel means and
    stds (6), then mean-pooled grayscale cells to fill up to ``dim``."""
    f = arr.astype(np.float32) / 255.0
    feats = [float(f[:, :, c].mean()) for c in range(3)]
    feats += [float(f[:, :, c].std()) for c in range(3)]
    if dim > 6:
        gray = f.mean(axis=2)
        cells = dim - 6
        # pool the grayscale into `cells` horizontal bands; an image
        # with fewer rows than bands would yield empty splits whose
        # mean is NaN — empty bands contribute 0.0 instead
        bands = np.array_split(gray, cells, axis=0)
        feats += [float(b.mean()) if b.size else 0.0 for b in bands]
    return feats[:dim]
