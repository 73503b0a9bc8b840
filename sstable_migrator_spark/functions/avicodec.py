"""Dependency-free AVI (RIFF) container codec for MJPEG video.

Closes the multimodal brief's "video" modality with a fully public
stack: AVI is a plain RIFF container (the same chunk grammar
functions.audiocodec already parses for WAV), and Motion-JPEG frames
are ordinary baseline JPEGs (functions.jpegcodec). Together they give
a real, verifiable video decode path — no H.264 & friends, which stay
out of stdlib reach and raise loudly upstream.

- ``encode_avi_mjpeg``: frames -> RIFF('AVI ') with hdrl (avih +
  vids strl, fccHandler 'MJPG'), movi '00dc' chunks (one JPEG per
  frame, even-padded), and an idx1 index — the classic AVI 1.0
  layout every player reads.
- ``decode_avi``: chunk-walk the container, decode each video frame
  via the JPEG codec, return ``[{pixels, delay_ms}]`` — the same
  contract as gifcodec.decode_gif, so frame-sampling logic is shared.
  Per the MJPEG convention (OpenDML), frames MAY omit their Huffman
  tables; jpegcodec falls back to the Annex K defaults.
- ``avi_meta``: header-only (width, height, fps, n_frames, codec) —
  no frame decode.

Verified like the other binary codecs: golden container layout,
lossless-bounded round-trips through the JPEG layer, loud errors on
foreign codecs, and mutation fuzzing (tests/test_fuzz_decoders.py).

Execution shape: runs only inside Arrow-batched ``mapInPandas``
(operators.multimodal); nothing here touches a SparkSession.
"""

from __future__ import annotations

import struct

import numpy as np

from sstable_migrator_spark.functions.imagecodec import ImageFormatError
from sstable_migrator_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

__all__ = [
    "AviFormatError",
    "avi_meta",
    "decode_avi",
    "encode_avi_dib",
    "encode_avi_mjpeg",
]


class AviFormatError(ValueError):
    """Unsupported or malformed AVI payload."""


_MAX_FRAMES = 100_000  # allocation guard for corrupted headers


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _check_frames(frames: list[np.ndarray], fps: float) -> tuple[int, int]:
    if not frames:
        raise AviFormatError("no frames")
    if fps <= 0:
        raise AviFormatError("fps must be positive")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise AviFormatError("all frames must share the canvas shape")
    return h, w


def _build_container(
    blobs: list[bytes],
    w: int,
    h: int,
    fps: float,
    handler: bytes,
    compression: bytes,
    bitcount: int,
    size_image: int | None = None,
) -> bytes:
    """AVI 1.0 assembly shared by the MJPG and DIB encoders: hdrl
    (avih + one vids strl), movi 00dc chunks, idx1 index."""
    usec_per_frame = int(round(1_000_000 / fps))
    max_bytes = max(len(b) for b in blobs)

    avih = struct.pack(
        "<14I",
        usec_per_frame,          # dwMicroSecPerFrame
        int(max_bytes * fps),    # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        len(blobs),              # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_bytes,               # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,        # dwWidth, dwHeight, dwReserved[4]
    )
    strh = (
        b"vids" + handler
        + struct.pack(
            "<10I",
            0, 0, 0,                      # dwFlags, wPrio+wLang, dwInitialFrames
            1000,                          # dwScale
            int(round(fps * 1000)),        # dwRate (fps = rate/scale)
            0,                             # dwStart
            len(blobs),                    # dwLength (in frames)
            max_bytes,                     # dwSuggestedBufferSize
            0xFFFFFFFF,                    # dwQuality (default)
            0,                             # dwSampleSize (0: varying)
        )
        + struct.pack("<4h", 0, 0, w, h)   # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, bitcount, compression,
        # BI_RGB decoders treat biSizeImage as authoritative — it must
        # be the real (stride-padded) frame size, not w*h*bytes
        size_image if size_image is not None else w * h * (bitcount // 8),
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = bytearray()
    index = bytearray()
    for b in blobs:
        # idx1 offsets point at the chunk fourcc, relative to the
        # 'movi' list-type fourcc position
        offset = 4 + len(movi_payload)
        index += b"00dc" + struct.pack("<III", 0x10, offset, len(b))
        movi_payload += _chunk(b"00dc", b)
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = _chunk(b"idx1", bytes(index))

    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: float = 10.0, quality: int = 85
) -> bytes:
    """Full-canvas RGB frames -> AVI 1.0 with one MJPG video stream."""
    h, w = _check_frames(frames, fps)
    jpegs = [encode_jpeg(f, quality) for f in frames]
    return _build_container(jpegs, w, h, fps, b"MJPG", b"MJPG", 24)


def encode_avi_dib(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """Full-canvas RGB frames -> AVI 1.0 with one raw BI_RGB (DIB)
    stream: bottom-up BGR rows padded to 4-byte stride — LOSSLESS,
    the uncompressed twin of the MJPG encoder."""
    h, w = _check_frames(frames, fps)
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    blobs = []
    for f in frames:
        rows = [f[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1)]
        blobs.append(b"".join(rows))
    return _build_container(
        blobs, w, h, fps, b"DIB ", b"\x00\x00\x00\x00", 24,
        size_image=stride * h,
    )


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _iter_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size); sizes are validated
    against the enclosing extent so truncation fails loudly."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + size > end:
            raise AviFormatError(f"chunk {fourcc!r} overruns its parent")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # even padding


def _parse_header(data: bytes) -> dict:
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviFormatError("not a RIFF AVI")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    info: dict = {
        "width": 0, "height": 0, "usec_per_frame": 0,
        "n_frames": 0, "handler": b"", "compression": b"",
        "scale": 0, "rate": 0, "movi": None, "stream_no": None,
        "bitcount": 24,
    }
    video_stream = -1
    for fourcc, start, size in _iter_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = data[start : start + 4]
        if ltype == b"movi":
            info["movi"] = (start + 4, start + size)
        elif ltype == b"hdrl":
            stream_idx = -1
            for f2, s2, z2 in _iter_chunks(data, start + 4, start + size):
                if f2 == b"avih" and z2 >= 40:
                    (
                        info["usec_per_frame"], _, _, _, info["n_frames"],
                        _, _, _, info["width"], info["height"],
                    ) = struct.unpack_from("<10I", data, s2)
                elif f2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    stream_idx += 1
                    for f3, s3, z3 in _iter_chunks(data, s2 + 4, s2 + z2):
                        if f3 == b"strh" and z3 >= 48:
                            fcc_type = data[s3 : s3 + 4]
                            if fcc_type == b"vids" and video_stream < 0:
                                video_stream = stream_idx
                                info["handler"] = data[s3 + 4 : s3 + 8]
                                info["scale"], info["rate"] = struct.unpack_from(
                                    "<II", data, s3 + 20
                                )
                        elif f3 == b"strf" and z3 >= 40 and stream_idx == video_stream:
                            (info["bitcount"],) = struct.unpack_from(
                                "<H", data, s3 + 14
                            )
                            info["compression"] = data[s3 + 16 : s3 + 20]
    if info["movi"] is None:
        raise AviFormatError("missing movi list")
    if video_stream < 0:
        raise AviFormatError("no video stream")
    if info["n_frames"] > _MAX_FRAMES:
        raise AviFormatError(f"frame count {info['n_frames']} exceeds cap")
    info["stream_no"] = video_stream
    return info


def _codec_fourcc(info: dict) -> bytes:
    """The video codec fourcc: strf biCompression when it carries one,
    else the strh handler. biCompression = 0 (BI_RGB, uncompressed
    DIB) is four NUL bytes — truthy, so a plain ``or`` fallback never
    fires; treat NUL/blank as unset."""
    comp = info["compression"]
    if comp.strip(b"\x00 "):
        return comp
    handler = info["handler"]
    if handler.strip(b"\x00 "):
        return handler
    return b"DIB "  # BI_RGB with no handler: raw DIB frames


def avi_meta(data: bytes) -> dict:
    """Header-only metadata — no frame decode."""
    info = _parse_header(data)
    fps = (
        info["rate"] / info["scale"]
        if info["scale"]
        else (1_000_000 / info["usec_per_frame"] if info["usec_per_frame"] else 0.0)
    )
    return {
        "width": int(info["width"]),
        "height": int(info["height"]),
        "n_frames": int(info["n_frames"]),
        "fps": float(fps),
        "codec": _codec_fourcc(info).decode("ascii", "replace").strip().lower(),
    }


def _decode_dib_frame(buf: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """One BI_RGB frame: bottom-up BGR(A) rows, stride padded to 4."""
    if w <= 0 or h <= 0:
        # np.stack over zero rows would raise a bare ValueError for a
        # crafted zero-dimension header; fail as a format error
        raise AviFormatError(f"DIB frame geometry {w}x{h} invalid")
    if bpp not in (24, 32):
        raise AviFormatError(f"DIB bpp={bpp} unsupported")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    if len(buf) < stride * h:
        raise AviFormatError("DIB frame smaller than its geometry")
    rows = []
    for y in range(h):
        r = np.frombuffer(buf, np.uint8, w * nch, y * stride).reshape(w, nch)
        rows.append(r[:, :3][:, ::-1])  # BGR(A) -> RGB
    return np.stack(rows)[::-1]  # bottom-up


def decode_avi(data: bytes) -> list[dict]:
    """AVI bytes -> ``[{pixels: (H, W, 3) uint8, delay_ms: int}]``
    (the gifcodec contract). Motion-JPEG and raw BI_RGB (DIB) video
    streams; anything else raises AviFormatError naming the codec."""
    info = _parse_header(data)
    codec = _codec_fourcc(info).upper()
    is_mjpg = codec in (b"MJPG", b"JPEG", b"DMB1")
    is_dib = not is_mjpg and (
        not info["compression"].strip(b"\x00 ") or codec.strip() == b"DIB"
    )
    if not (is_mjpg or is_dib):
        raise AviFormatError(
            f"video codec {codec!r} unsupported: Motion-JPEG and raw DIB "
            "decode dependency-free (H.264 & friends are not stdlib-feasible)"
        )
    fps = (
        info["rate"] / info["scale"]
        if info["scale"]
        else (1_000_000 / info["usec_per_frame"] if info["usec_per_frame"] else 10.0)
    )
    if fps <= 0:
        raise AviFormatError("non-positive frame rate")
    delay_ms = max(int(round(1000.0 / fps)), 1)
    want = b"%02ddc" % info["stream_no"], b"%02ddb" % info["stream_no"]
    frames = []
    start, end = info["movi"]
    for fourcc, s, z in _iter_chunks(data, start, end):
        if fourcc == b"LIST" and data[s : s + 4] == b"rec ":
            inner = list(_iter_chunks(data, s + 4, s + z))
        else:
            inner = [(fourcc, s, z)]
        for f2, s2, z2 in inner:
            if f2 in want and z2 > 0:
                if is_mjpg:
                    try:
                        px = decode_jpeg(data[s2 : s2 + z2])
                    except ImageFormatError as e:
                        raise AviFormatError(f"frame {len(frames)}: {e}") from e
                else:
                    px = _decode_dib_frame(
                        data[s2 : s2 + z2],
                        info["width"], info["height"], info["bitcount"],
                    )
                frames.append({"pixels": px, "delay_ms": delay_ms})
                if len(frames) > _MAX_FRAMES:
                    raise AviFormatError("frame count exceeds cap")
    if not frames:
        raise AviFormatError("movi list holds no video frames")
    return frames
