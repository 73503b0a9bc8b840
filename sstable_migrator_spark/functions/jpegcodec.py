"""Dependency-free baseline JPEG (JFIF) codec.

Closes the last real-image-decode gap in the multimodal path
(functions.imagecodec covers PNG/PPM/BMP; PIL is not in this
container, and a web-scale corpus is mostly JPEG). Implements the
ITU-T T.81 BASELINE process from the public spec:

- encoder: BT.601 full-range RGB->YCbCr, 4:4:4 (no subsampling),
  8x8 orthonormal DCT (one numpy einsum over all blocks), Annex K
  quantization tables scaled by the libjpeg quality convention,
  Annex K Huffman tables, byte-stuffed entropy stream, JFIF APP0.
- decoder: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS marker parse; canonical
  Huffman decode with 0xFF00 unstuffing and RSTn handling; arbitrary
  sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0) with
  replication upsampling; batched IDCT (einsum, not per-block loops);
  grayscale (1-component) and YCbCr (3-component) scans. Progressive
  (SOF2), arithmetic coding, and 12-bit precision raise
  ImageFormatError loudly.

The encoder/decoder pair is verified the way the other binary codecs
are: structural golden bytes (marker layout, Annex K table payloads),
exact round-trips on DC-only images (uniform color survives
quantization exactly), PSNR-bounded round-trips on gradients/noise,
Huffman-table self-checks (prefix-free, canonical), and mutation
fuzzing (tests/test_fuzz_decoders.py) — decode never hangs or
corrupts silently, it raises ImageFormatError.

Execution shape: runs only inside Arrow-batched ``mapInPandas``
(operators.multimodal); nothing here touches a SparkSession.
"""

from __future__ import annotations

import struct

import numpy as np

from sstable_migrator_spark.functions.imagecodec import ImageFormatError

__all__ = ["decode_jpeg", "encode_jpeg", "jpeg_meta"]

# decode-side allocation guard (16.7 MP); raise if a corpus genuinely
# carries larger frames
_MAX_PIXELS = 1 << 24

# ---------------------------------------------------------------------------
# Annex K tables (ITU-T T.81 / public libjpeg constants)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# (bits[1..16], values) per table — Annex K.3
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II basis: forward F = C @ b @ C.T, inverse b = C.T @ F @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
        )


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality convention: 1..100 -> table scaling."""
    if not 1 <= quality <= 100:
        raise ImageFormatError(f"quality {quality} out of 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Symbol -> (code, length), canonical JPEG assignment (C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    # negative amplitudes are stored one's-complement (F.1.2.1)
    return v if v >= 0 else v + (1 << size) - 1


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (N, 8, 8) blocks in
    raster MCU order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_block(bw: _BitWriter, zz, pred: int, dc_tab, ac_tab) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dc_tab[size]
    bw.write(code, length)
    if size:
        bw.write(_amplitude(diff, size), size)
    run = 0
    nz = np.nonzero(zz)[0]
    last_nz = int(nz.max()) if len(nz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, length = ac_tab[0x00]  # EOB
                bw.write(code, length)
                break
            run += 1
            if run == 16:
                code, length = ac_tab[0xF0]  # ZRL
                bw.write(code, length)
                run = 0
            continue
        size = _category(v)
        code, length = ac_tab[(run << 4) | size]
        bw.write(code, length)
        bw.write(_amplitude(v, size), size)
        run = 0
    return dc


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes. ``subsample`` is
    '444' (no chroma subsampling) or '420' (2x2 box-averaged chroma,
    the web default); ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs (what camera/streaming encoders do
    for error resilience)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ImageFormatError("encode_jpeg expects (H, W, 3)")
    if subsample not in ("444", "420"):
        raise ImageFormatError(f"subsample {subsample!r}: use '444' or '420'")
    h, w, _ = arr.shape
    if h == 0 or w == 0:
        raise ImageFormatError("empty image")
    # BT.601 full-range RGB -> YCbCr
    f = arr.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qy = _scaled_quant(QUANT_LUMA, quality).reshape(8, 8)
    qc = _scaled_quant(QUANT_CHROMA, quality).reshape(8, 8)

    ys, cs = (1, 1) if subsample == "444" else (2, 1)  # luma/chroma factors
    mcu_px = 8 * ys  # MCU edge in luma pixels
    mcux = (w + mcu_px - 1) // mcu_px
    mcuy = (h + mcu_px - 1) // mcu_px

    def _plane_blocks(plane: np.ndarray, factor: int, q: np.ndarray) -> np.ndarray:
        """Pad to the MCU grid, DCT+quantize, return (nby, nbx, 64)
        zigzag blocks."""
        if factor < ys:  # chroma in 420: 2x2 box average first
            ph2, pw2 = (plane.shape[0] + 1) & ~1, (plane.shape[1] + 1) & ~1
            p = np.pad(
                plane,
                ((0, ph2 - plane.shape[0]), (0, pw2 - plane.shape[1])),
                mode="edge",
            )
            plane = p.reshape(ph2 // 2, 2, pw2 // 2, 2).mean(axis=(1, 3))
        nby, nbx = mcuy * factor, mcux * factor
        padded = np.pad(
            plane,
            ((0, nby * 8 - plane.shape[0]), (0, nbx * 8 - plane.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = _blocks_of(padded)
        coef = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
        quant = np.round(coef / q).astype(np.int32)
        return quant.reshape(-1, 64)[:, ZIGZAG].reshape(nby, nbx, 64)

    planes = [
        _plane_blocks(y, ys, qy),
        _plane_blocks(cb, cs, qc),
        _plane_blocks(cr, cs, qc),
    ]
    factors = [ys, cs, cs]

    dc_y = _canonical_codes(*DC_LUMA)
    ac_y = _canonical_codes(*AC_LUMA)
    dc_c = _canonical_codes(*DC_CHROMA)
    ac_c = _canonical_codes(*AC_CHROMA)
    tables = [(dc_y, ac_y), (dc_c, ac_c), (dc_c, ac_c)]

    bw = _BitWriter()
    pred = [0, 0, 0]
    entropy = bytearray()
    n_mcu = mcux * mcuy
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            entropy += bw.out
            entropy += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            bw = _BitWriter()
            pred = [0, 0, 0]
        my, mx = divmod(m, mcux)
        for ci in range(3):
            fac = factors[ci]
            dc_tab, ac_tab = tables[ci]
            for by in range(fac):
                for bx in range(fac):
                    zz = planes[ci][my * fac + by, mx * fac + bx]
                    pred[ci] = _encode_block(bw, zz, pred[ci], dc_tab, ac_tab)
    bw.flush()
    entropy += bw.out

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    sf_y = (ys << 4) | ys
    sf_c = (cs << 4) | cs
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qy.reshape(64)[ZIGZAG].tolist()))
    out += seg(0xFFDB, b"\x01" + bytes(qc.reshape(64)[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, sf_y, 0, 2, sf_c, 1, 3, sf_c, 1])  # id, HxV, quant table
    out += seg(0xFFC0, sof)
    for tc_th, (bits, vals) in (
        (0x00, DC_LUMA), (0x10, AC_LUMA), (0x01, DC_CHROMA), (0x11, AC_CHROMA)
    ):
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing. Stops at any non-stuffing marker; RSTn is consumed by
    the caller via ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ImageFormatError("entropy stream exhausted at marker")
        if self.pos >= len(self.data):
            raise ImageFormatError("truncated entropy stream")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ImageFormatError("truncated entropy stream")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = 0xFF00 | nxt
                raise ImageFormatError("entropy stream exhausted at marker")
        self._acc = (self._acc << 8) | byte
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (DRI intervals)."""
        self._acc = 0
        self._n = 0
        if self.marker is not None:
            m = self.marker
            self.marker = None
            if not 0xFFD0 <= m <= 0xFFD7:
                raise ImageFormatError(f"expected RSTn, found {m:#x}")
            return
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return
        raise ImageFormatError("expected RSTn marker")


class _HuffTree:
    """Canonical-code decoder: (first_code, first_value_index) per
    length — O(bits-in-code) lookup without a 64K table."""

    def __init__(self, bits: list[int], values: list[int]):
        if len(values) != sum(bits):
            raise ImageFormatError("DHT count/value mismatch")
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_idx = [0] * 17
        self.values = values
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.val_idx[length] = k
                self.min_code[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.max_code[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            if self.max_code[length] >= code >= self.min_code[length]:
                return self.values[self.val_idx[length] + code - self.min_code[length]]
        raise ImageFormatError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _find_sof(data: bytes) -> tuple[int, int, int, list[tuple[int, int, int, int]]]:
    """Walk markers to the frame header. Returns (h, w, precision,
    [(comp_id, hs, vs, quant_id)])."""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ImageFormatError("marker desync")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", data, pos + 2)
        if marker == 0xC0 or marker == 0xC1:
            prec, h, w, nc = struct.unpack_from(">BHHB", data, pos + 4)
            comps = []
            for i in range(nc):
                cid, hv, qid = struct.unpack_from(
                    ">BBB", data, pos + 9 + i * 3
                )
                comps.append((cid, hv >> 4, hv & 0xF, qid))
            return h, w, prec, comps
        if marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageFormatError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        pos += 2 + length
    raise ImageFormatError("missing SOF0")


def _wrap_malformed(fn, data: bytes):
    """Hold the error contract: ANY structural failure surfaces as
    ImageFormatError, never a raw struct.error/IndexError from a
    truncated or length-corrupted marker segment."""
    try:
        return fn(data)
    except ImageFormatError:
        raise
    except (struct.error, IndexError) as e:
        raise ImageFormatError(f"malformed JPEG: {e}") from e


def jpeg_meta(data: bytes) -> tuple[int, int, str]:
    """Header-only (width, height, 'jpeg') — no entropy decode."""

    def _meta(d):
        if d[:3] != b"\xff\xd8\xff":
            raise ImageFormatError("not a JPEG")
        h, w, _, _ = _find_sof(d)
        return w, h, "jpeg"

    return _wrap_malformed(_meta, data)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, 3) uint8 RGB."""
    return _wrap_malformed(_decode_jpeg, data)


def _decode_jpeg(data: bytes) -> np.ndarray:  # noqa: PLR0912, PLR0915
    if data[:3] != b"\xff\xd8\xff":
        raise ImageFormatError("not a JPEG")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTree] = {}
    huff_ac: dict[int, _HuffTree] = {}
    frame = None  # (h, w, comps)
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ImageFormatError("marker desync")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9:  # EOI before SOS
            raise ImageFormatError("no scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                o += 1
                if pq != 0:
                    raise ImageFormatError("16-bit quant tables unsupported")
                if o + 64 > len(body):
                    raise ImageFormatError("truncated DQT")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(body[o : o + 64], dtype=np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                o += 64
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline/ext sequential)
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ImageFormatError(f"{prec}-bit precision unsupported")
            if nc not in (1, 3):
                raise ImageFormatError(f"{nc}-component scan unsupported")
            if h * w > _MAX_PIXELS:
                # allocation guard: a corrupted/hostile header must not
                # drive a multi-GB coefficient allocation
                raise ImageFormatError(f"frame {w}x{h} exceeds {_MAX_PIXELS} px cap")
            comps = []
            for i in range(nc):
                cid, hv, qid = struct.unpack_from(">BBB", body, 6 + i * 3)
                hs, vs = hv >> 4, hv & 0xF
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise ImageFormatError(f"sampling {hs}x{vs} unsupported")
                comps.append({"id": cid, "hs": hs, "vs": vs, "q": qid})
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageFormatError(f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported")
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                o += 1
                if o + 16 > len(body):
                    raise ImageFormatError("truncated DHT")
                bits = list(body[o : o + 16])
                o += 16
                n = sum(bits)
                if o + n > len(body):
                    raise ImageFormatError("truncated DHT values")
                vals = list(body[o : o + n])
                o += n
                tree = _HuffTree(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tree
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ImageFormatError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + i * 2], body[2 + i * 2]
                scan.append((cs, tt >> 4, tt & 0xF))
            return _decode_scan(
                data, pos + 2 + length, frame, scan, quant,
                huff_dc, huff_ac, restart_interval,
            )
        pos += 2 + length
    raise ImageFormatError("missing SOS")


def _decode_scan(  # noqa: PLR0912, PLR0915
    data: bytes,
    pos: int,
    frame,
    scan,
    quant,
    huff_dc,
    huff_ac,
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ImageFormatError("zero-size frame")
    if len(scan) != len(comps):
        raise ImageFormatError("scan/frame component mismatch")
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ImageFormatError(f"scan references unknown component {cs}")
        c = by_id[cs]
        if c["q"] not in quant:
            raise ImageFormatError(f"missing quant table {c['q']}")
        # MJPEG convention (OpenDML): frames may omit DHT entirely —
        # tables 0/1 then default to the Annex K standard tables
        if td not in huff_dc and td in (0, 1):
            huff_dc[td] = _HuffTree(*(DC_LUMA if td == 0 else DC_CHROMA))
        if ta not in huff_ac and ta in (0, 1):
            huff_ac[ta] = _HuffTree(*(AC_LUMA if ta == 0 else AC_CHROMA))
        if td not in huff_dc or ta not in huff_ac:
            raise ImageFormatError("missing Huffman table")
        order.append((c, huff_dc[td], huff_ac[ta], quant[c["q"]]))

    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    if len(comps) == 1:
        # non-interleaved single-component scan: MCU = one block
        hmax = vmax = 1
        c = comps[0]
        c["hs"] = c["vs"] = 1
        mcux = (w + 7) // 8
        mcuy = (h + 7) // 8

    # per-component coefficient storage, (blocks_y, blocks_x, 8, 8)
    store = []
    for c, _, _, _ in order:
        store.append(
            np.zeros((mcuy * c["vs"], mcux * c["hs"], 8, 8), dtype=np.float64)
        )

    br = _BitReader(data, pos)
    pred = [0] * len(order)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            pred = [0] * len(order)
        my, mx = divmod(m, mcux)
        for ci, (c, dct, act, q) in enumerate(order):
            for by in range(c["vs"]):
                for bx in range(c["hs"]):
                    zz = np.zeros(64, dtype=np.int64)
                    size = dct.decode(br)
                    if size > 11:
                        raise ImageFormatError("DC size out of range")
                    diff = _extend(br.bits(size), size) if size else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = act.decode(br)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ImageFormatError("AC run past block end")
                        zz[k] = _extend(br.bits(s), s)
                        k += 1
                    blk = np.zeros(64, dtype=np.float64)
                    blk[ZIGZAG] = zz
                    store[ci][my * c["vs"] + by, mx * c["hs"] + bx] = (
                        blk.reshape(8, 8) * q
                    )

    planes = []
    for (c, _, _, _), blocks in zip(order, store):
        nby, nbx = blocks.shape[:2]
        flat = blocks.reshape(-1, 8, 8)
        # inverse: b[x,y] = sum_uv C[u,x] F[u,v] C[v,y]  (b = C.T @ F @ C)
        px = np.einsum("ux,nuv,vy->nxy", _C, flat, _C)
        px = px.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        px = np.clip(px + 128.0, 0, 255)
        # upsample subsampled chroma by replication, then crop
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            px = np.repeat(np.repeat(px, ry, axis=0), rx, axis=1)
        planes.append(px[:h, :w])

    if len(planes) == 1:
        y = planes[0].astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
