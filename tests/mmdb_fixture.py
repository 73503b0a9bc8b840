"""Test-only MaxMind DB *writer* for fixture generation.

Builds a spec-conformant .mmdb byte string from ``(cidr, prefix_len,
record)`` entries so the production reader
(sstable_migrator_spark.sources.mmdb) can be exercised without real
MaxMind files (absent from the reference repo too —
.MISSING_LARGE_BLOBS). Supports record sizes 24/28/32 and ip_version
4/6 (IPv4 entries in a v6 tree are placed under the ::/96 subtree, as
the spec prescribes). Writer lives in tests/ deliberately: production
code only ever *reads* mmdb.
"""

from __future__ import annotations

import struct
from typing import Any

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"


def _encode_int(value: int, type_code: int) -> bytes:
    payload = b""
    v = value
    while v:
        payload = bytes([v & 0xFF]) + payload
        v >>= 8
    if type_code in (5, 6):  # uint16 / uint32 — basic types
        return bytes([(type_code << 5) | len(payload)]) + payload
    # uint64/uint128 are extended types
    return bytes([len(payload), type_code - 7]) + payload


def encode_value(value: Any) -> bytes:
    if isinstance(value, bool):
        return bytes([(0 << 5) | (1 if value else 0), 14 - 7])
    if isinstance(value, str):
        raw = value.encode("utf-8")
        if len(raw) < 29:
            return bytes([(2 << 5) | len(raw)]) + raw
        if len(raw) < 29 + 256:
            return bytes([(2 << 5) | 29, len(raw) - 29]) + raw
        raise NotImplementedError("fixture strings are short")
    if isinstance(value, float):
        return bytes([(3 << 5) | 8]) + struct.pack(">d", value)
    if isinstance(value, bytes):
        return bytes([(4 << 5) | len(value)]) + value
    if isinstance(value, int):
        if value < 0:
            raise NotImplementedError("fixture ints are unsigned")
        if value < 1 << 16:
            return _encode_int(value, 5)
        if value < 1 << 32:
            return _encode_int(value, 6)
        return _encode_int(value, 9)
    if isinstance(value, dict):
        out = bytes([(7 << 5) | len(value)])
        for k, v in value.items():
            out += encode_value(str(k)) + encode_value(v)
        return out
    if isinstance(value, (list, tuple)):
        out = bytes([(0 << 5) | len(value), 11 - 7])
        for v in value:
            out += encode_value(v)
        return out
    raise NotImplementedError(f"fixture type {type(value)}")


class _Node:
    __slots__ = ("left", "right", "number")

    def __init__(self):
        self.left: _Node | int | None = None  # int => data record index
        self.right: _Node | int | None = None
        self.number = -1


def _insert(root: _Node, bits: int, depth: int, total_bits: int, rec_idx: int) -> None:
    node = root
    for i in range(depth - 1):
        bit = (bits >> (total_bits - 1 - i)) & 1
        child = node.right if bit else node.left
        if isinstance(child, int):
            raise ValueError("overlapping networks in fixture")
        if child is None:
            child = _Node()
            if bit:
                node.right = child
            else:
                node.left = child
        node = child
    last = (bits >> (total_bits - depth)) & 1
    if last:
        node.right = rec_idx
    else:
        node.left = rec_idx


def _pack_node(left: int, right: int, record_size: int) -> bytes:
    if record_size == 24:
        return left.to_bytes(3, "big") + right.to_bytes(3, "big")
    if record_size == 28:
        return (
            (left & 0xFFFFFF).to_bytes(3, "big")
            + bytes([((left >> 24) << 4) | (right >> 24)])
            + (right & 0xFFFFFF).to_bytes(3, "big")
        )
    return left.to_bytes(4, "big") + right.to_bytes(4, "big")


def build_mmdb(
    networks: list[tuple[int, int, Any]],
    database_type: str = "GeoLite2-City",
    record_size: int = 32,
    ip_version: int = 4,
) -> bytes:
    """``networks``: list of (ipv4_network_start, prefix_len, record)."""
    root = _Node()
    records: list[Any] = []
    for start, plen, rec in networks:
        if ip_version == 6:
            # ::/96-mapped IPv4: 96 zero bits then the IPv4 bits
            bits = start >> (32 - plen)
            _insert(root, bits, 96 + plen, 96 + plen, len(records))
        else:
            bits = start >> (32 - plen)
            _insert(root, bits, plen, plen, len(records))
        records.append(rec)

    # number internal nodes (preorder)
    nodes: list[_Node] = []

    def _number(n: _Node) -> None:
        n.number = len(nodes)
        nodes.append(n)
        for child in (n.left, n.right):
            if isinstance(child, _Node):
                _number(child)

    _number(root)
    node_count = len(nodes)

    # serialize data section (dedup identical records)
    data = b""
    offsets: dict[int, int] = {}
    blobs: dict[bytes, int] = {}
    for idx, rec in enumerate(records):
        blob = encode_value(rec)
        if blob in blobs:
            offsets[idx] = blobs[blob]
        else:
            blobs[blob] = len(data)
            offsets[idx] = len(data)
            data += blob

    def _record_value(child: _Node | int | None) -> int:
        if child is None:
            return node_count
        if isinstance(child, _Node):
            return child.number
        return node_count + 16 + offsets[child]

    tree = b"".join(
        _pack_node(_record_value(n.left), _record_value(n.right), record_size)
        for n in nodes
    )

    metadata = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": 1700000000,
        "database_type": database_type,
        "description": {"en": "test fixture"},
        "ip_version": ip_version,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": record_size,
    }
    return tree + b"\x00" * 16 + data + _METADATA_MARKER + encode_value(metadata)


def city_record(country: str, city: str) -> dict:
    return {
        "city": {"geoname_id": 1, "names": {"en": city}},
        "country": {"geoname_id": 2, "iso_code": country, "names": {"en": country}},
    }


def asn_record(asn: int, org: str) -> dict:
    return {
        "autonomous_system_number": asn,
        "autonomous_system_organization": org,
    }
