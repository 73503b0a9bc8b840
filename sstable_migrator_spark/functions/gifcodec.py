"""Dependency-free GIF89a codec: animated frames in, animated frames out.

The third from-scratch binary codec (after imagecodec's PNG/PPM/BMP and
audiocodec's WAV): GIF is the one animated-image/"video" container
whose entire stack — block framing, palettes, and LZW entropy coding —
is public, stdlib-feasible, and small. With it, the multimodal
frame-sampling path (operators/multimodal.py ``sample_frames``) decodes
real frames instead of planning over metadata.

Implemented per the published GIF89a specification:

- Header + Logical Screen Descriptor (u16 LE canvas dims, packed
  global-color-table bits), global/local color tables of 2^(size+1)
  entries.
- Blocks: Graphic Control Extension (disposal method, transparency
  index, centisecond delay), generic extensions skipped by sub-block
  framing, Image Descriptor (frame offset/dims, local table,
  interlace), trailer.
- LZW decompression with variable code width (min+1 .. 12 bits, LSB
  bit order), clear/end codes, dictionary reset; the encoder emits the
  same stream greedily.
- Frame compositing over the canvas: disposal 0/1 (leave), 2 (restore
  background = transparent), and transparency holes showing the prior
  canvas. Disposal 3 (restore-previous) raises — honest stub for a
  mode virtually absent from real corpora.
- Interlaced frames reorder rows through the four-pass pattern
  (8/8 from 0, 8/8 from 4, 4/4 from 2, 2/2 from 1).

The encoder writes full-canvas frames with one global color table
(<=256 distinct colors across the animation) — the simplest valid
GIF89a an independent decoder must accept, which is exactly what the
round-trip tests demand.
"""

from __future__ import annotations

import io
import struct

import numpy as np

__all__ = ["GifFormatError", "decode_gif", "encode_gif"]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class GifFormatError(ValueError):
    pass


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """giflib-compatible timing: a running slot counter advances for
    EVERY code read after a clear — one ahead of the entries actually
    defined, because the encoder defines each entry one code earlier
    than the decoder can — and the code width bumps when that counter
    reaches 2^width."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width, slot
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        slot = end + 1

    width = min_code_size + 1
    slot = end + 1
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                if code >= len(table):
                    raise GifFormatError("first code not in table")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                if len(table) < 4096:
                    table.append(entry)
            else:
                raise GifFormatError(f"LZW code {code} beyond table")
            out += entry
            prev = entry
            slot += 1
            if slot >= (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return out
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # mirror the decoder exactly: it bumps width after APPENDING
            # when len(table) == 1<<width, and its table size equals our
            # post-increment next_code
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _sub_blocks(data: bytes, off: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        n = data[off]
        off += 1
        if n == 0:
            return b"".join(chunks), off
        chunks.append(data[off : off + n])
        off += n


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(data: bytes) -> list[dict]:
    """GIF bytes -> list of frames ``{'delay_ms', 'pixels' (H,W,3
    uint8)}`` — each frame is the fully composited canvas at that point
    of the animation, matching what a viewer displays."""
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise GifFormatError("not a GIF")
    width, height, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    off = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = np.frombuffer(data[off : off + 3 * n], np.uint8).reshape(n, 3)
        off += 3 * n
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    shown = np.zeros((height, width), dtype=bool)  # transparent background
    frames: list[dict] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    while off < len(data):
        block = data[off]
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[off]
            off += 1
            payload, off = _sub_blocks(data, off)
            if label == 0xF9:  # graphic control
                flags = payload[0]
                (delay_cs,) = struct.unpack_from("<H", payload, 1)
                delay_ms = delay_cs * 10
                disposal = (flags >> 2) & 0x7
                transparent = payload[3] if flags & 1 else None
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown block 0x{block:02x}")
        # image descriptor
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, off)
        off += 9
        table = global_table
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            table = np.frombuffer(data[off : off + 3 * n], np.uint8).reshape(n, 3)
            off += 3 * n
        if table is None:
            raise GifFormatError("frame without any color table")
        min_code = data[off]
        off += 1
        lzw, off = _sub_blocks(data, off)
        idx = np.frombuffer(
            _lzw_decode(lzw, min_code, fw * fh), np.uint8
        )
        if idx.size < fw * fh:
            raise GifFormatError("LZW stream short of pixel count")
        rows = idx[: fw * fh].reshape(fh, fw)
        if fpacked & 0x40:
            rows = _deinterlace(rows)
        if disposal == 3:
            raise NotImplementedError("disposal method 3 (restore previous)")
        region = canvas[top : top + fh, left : left + fw]
        region_shown = shown[top : top + fh, left : left + fw]
        if transparent is not None:
            opaque = rows != transparent
        else:
            opaque = np.ones_like(rows, dtype=bool)
        region[opaque] = table[rows[opaque]]
        region_shown[opaque] = True
        frames.append({"delay_ms": delay_ms, "pixels": canvas.copy()})
        if disposal == 2:  # restore to background (transparent)
            region[...] = 0
            region_shown[...] = False
        # a Graphic Control Extension scopes ONLY the next rendering
        # block (GIF89a spec): reset so a following frame WITHOUT its
        # own GCE is opaque, undelayed, leave-in-place
        delay_ms = 0
        transparent = None
        disposal = 0
    if not frames:
        raise GifFormatError("no image data")
    return frames


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_gif(frames: list[np.ndarray], delays_ms: list[int] | None = None) -> bytes:
    """Full-canvas RGB frames -> animated GIF89a with one global color
    table (<=256 distinct colors across all frames).

    Delays are stored in GIF's native centisecond field, so a delay is
    floored to a multiple of 10 ms (``decode(encode(frames, [105]))``
    reports 100 ms). ``delays_ms`` must carry exactly one delay per
    frame — a shorter list used to silently drop the trailing frames."""
    if not frames:
        raise GifFormatError("no frames")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise GifFormatError("all frames must share the canvas shape")
    if delays_ms is None:  # `or` would silently default an EMPTY list
        delays_ms = [100] * len(frames)
    if len(delays_ms) != len(frames):
        raise GifFormatError(
            f"{len(delays_ms)} delays for {len(frames)} frames; "
            "delays_ms must have one entry per frame"
        )
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stacked, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise GifFormatError(f"{len(palette)} distinct colors; GIF caps at 256")
    size_bits = max(1, int(len(palette) - 1).bit_length())
    n_entries = 1 << size_bits
    table = np.zeros((n_entries, 3), dtype=np.uint8)
    table[: len(palette)] = palette

    out = io.BytesIO()
    out.write(b"GIF89a")
    out.write(struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0))
    out.write(table.tobytes())
    per_frame = inverse.reshape(len(frames), h * w)
    min_code = max(2, size_bits)
    for i, (findex, delay) in enumerate(zip(per_frame, delays_ms)):
        out.write(b"\x21\xf9\x04")
        out.write(struct.pack("<BHB", 0x04, delay // 10, 0))  # disposal 1
        out.write(b"\x00")
        out.write(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
        out.write(bytes([min_code]))
        lzw = _lzw_encode(findex.astype(np.uint8).tobytes(), min_code)
        for boff in range(0, len(lzw), 255):
            chunk = lzw[boff : boff + 255]
            out.write(bytes([len(chunk)]) + chunk)
        out.write(b"\x00")
    out.write(b"\x3b")
    return out.getvalue()
