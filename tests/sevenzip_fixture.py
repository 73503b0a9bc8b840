"""Test-only 7z archive *writer* for fixture generation.

Emits spec-conformant archives (single folder, LZMA1 or Copy coder,
one substream per non-empty member, optional LZMA-compressed header)
so the production extractor (sstable_migrator_spark.sources.sevenzip)
is exercised against real binary layouts without the external ``7z``
tool the reference shells out to.
"""

from __future__ import annotations

import lzma
import struct
import zlib

_SIGNATURE = b"7z\xbc\xaf\x27\x1c"

_LZMA1_FILTER = {
    "id": lzma.FILTER_LZMA1,
    "dict_size": 1 << 20,
    "lc": 3,
    "lp": 0,
    "pb": 2,
}
# props byte = (pb*5 + lp)*9 + lc, then dict_size LE32
_LZMA1_PROPS = bytes([(2 * 5 + 0) * 9 + 3]) + struct.pack("<I", 1 << 20)


def _num(v: int) -> bytes:
    """7z variable-length number; 0xFF + 8 LE bytes is the universal form."""
    if v < 0x80:
        return bytes([v])
    return b"\xff" + struct.pack("<Q", v)


def _bit_vector(bits: list[bool]) -> bytes:
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            if bit:
                b |= 0x80 >> j
        out.append(b)
    return bytes(out)


def _streams_info(
    pack_pos: int, packed_sizes: list[int], unpacked: int,
    substream_sizes: list[int] | None, coder: str,
) -> bytes:
    out = b"\x06"  # kPackInfo
    out += _num(pack_pos) + _num(len(packed_sizes))
    out += b"\x09" + b"".join(_num(s) for s in packed_sizes)  # kSize
    out += b"\x00"  # kEnd
    out += b"\x07\x0b" + _num(1) + b"\x00"  # kUnpackInfo kFolder 1 internal
    if coder == "lzma1":
        out += _num(1)  # one coder
        out += bytes([0x03 | 0x20]) + b"\x03\x01\x01"  # id len 3 + attrs
        out += _num(len(_LZMA1_PROPS)) + _LZMA1_PROPS
    else:  # copy
        out += _num(1) + bytes([0x01]) + b"\x00"
    out += b"\x0c" + _num(unpacked)  # kCodersUnpackSize
    out += b"\x00"  # kEnd of UnpackInfo
    if substream_sizes is not None:
        out += b"\x08"  # kSubStreamsInfo
        out += b"\x0d" + _num(len(substream_sizes))  # kNumUnpackStream
        out += b"\x09" + b"".join(_num(s) for s in substream_sizes[:-1])
        out += b"\x00"
    out += b"\x00"  # kEnd of StreamsInfo
    return out


def build_7z(
    members: dict[str, bytes], coder: str = "lzma1", encoded_header: bool = False
) -> bytes:
    """Build a 7z archive from ``{name: content}`` (dict order kept)."""
    names = list(members)
    datas = [members[n] for n in names]
    empty = [len(d) == 0 for d in datas]
    non_empty = [d for d in datas if d]

    payload = b"".join(non_empty)
    if coder == "lzma1":
        packed = lzma.compress(
            payload, format=lzma.FORMAT_RAW, filters=[_LZMA1_FILTER]
        )
    else:
        packed = payload

    header = b"\x01"  # kHeader
    header += b"\x04"  # kMainStreamsInfo
    header += _streams_info(
        0, [len(packed)], len(payload), [len(d) for d in non_empty], coder
    )
    header += b"\x05" + _num(len(names))  # kFilesInfo
    if any(empty):
        bv = _bit_vector(empty)
        header += b"\x0e" + _num(len(bv)) + bv  # kEmptyStream
        ev = _bit_vector([True] * sum(empty))
        header += b"\x0f" + _num(len(ev)) + ev  # kEmptyFile
    names_blob = b"\x00" + "".join(n + "\x00" for n in names).encode("utf-16-le")
    header += b"\x11" + _num(len(names_blob)) + names_blob  # kName
    header += b"\x00"  # kEnd FilesInfo
    header += b"\x00"  # kEnd Header

    body = packed
    if encoded_header:
        hpacked = lzma.compress(
            header, format=lzma.FORMAT_RAW, filters=[_LZMA1_FILTER]
        )
        top = b"\x17" + _streams_info(
            len(body), [len(hpacked)], len(header), None, "lzma1"
        )
        body += hpacked
    else:
        top = header

    next_header = top
    start_header = struct.pack(
        "<QQI", len(body), len(next_header), zlib.crc32(next_header)
    )
    return (
        _SIGNATURE
        + b"\x00\x04"
        + struct.pack("<I", zlib.crc32(start_header))
        + start_header
        + body
        + next_header
    )
