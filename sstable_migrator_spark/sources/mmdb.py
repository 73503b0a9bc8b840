"""MaxMind DB (.mmdb) binary reader -> GeoIP range dimensions (SURVEY S9).

The reference opens ``geocity.mmdb`` / ``geoasn.mmdb`` with the MaxMind
Java reader and a 262k-entry cache (App.java:254-266) and does per-row
point lookups inside its ingest loop (App.java:377-380,423-425). The
Spark-first shape is different: a lookup table is a *dimension*, so we
decode the whole binary search tree ONCE on the driver into the existing
``(net_start, net_end, ...)`` range schema and broadcast it into the
bucketed range join (operators.ingest.geoip_enrich). No per-row reader
calls, no cache tuning — the broadcast hash join IS the cache.

This is a dependency-free implementation of the public MaxMind DB file
format spec (https://maxmind.github.io/MaxMind-DB/): binary search tree
(24/28/32-bit records), data section with the 9 field types + pointers,
and the metadata map found after the ``\\xab\\xcd\\xefMaxMind.com``
marker. IPv6 databases are handled by descending the 96 zero bits to
the IPv4-mapped subtree, matching what every MaxMind client does for
IPv4 lookups.

Scale note: GeoLite2-City has ~4M networks — a few hundred MB as a
driver-side pandas frame, well within broadcast-dim territory next to a
100 TB fact table. Adjacent ranges with identical payloads are merged
during the tree walk, which typically shrinks the dim well below the
raw network count.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from sstable_migrator_spark import schemas

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SECTION_SEPARATOR = 16


class MMDBFormatError(ValueError):
    """Raised when the buffer is not a well-formed MaxMind DB file."""


class _Decoder:
    """Decoder for the MaxMind DB data section format."""

    def __init__(self, buf: bytes, base: int):
        self.buf = buf
        self.base = base

    def decode(self, offset: int) -> tuple[Any, int]:
        """Decode one field at absolute ``offset``; return (value, next)."""
        buf = self.buf
        ctrl = buf[offset]
        offset += 1
        ftype = ctrl >> 5

        if ftype == 1:  # pointer — size bits are part of the pointer
            psz = (ctrl >> 3) & 0x3
            v = ctrl & 0x7
            if psz == 0:
                ptr = (v << 8) | buf[offset]
                offset += 1
            elif psz == 1:
                ptr = ((v << 16) | (buf[offset] << 8) | buf[offset + 1]) + 2048
                offset += 2
            elif psz == 2:
                ptr = (
                    (v << 24)
                    | (buf[offset] << 16)
                    | (buf[offset + 1] << 8)
                    | buf[offset + 2]
                ) + 526336
                offset += 3
            else:
                ptr = int.from_bytes(buf[offset : offset + 4], "big")
                offset += 4
            value, _ = self.decode(self.base + ptr)
            return value, offset

        if ftype == 0:  # extended type
            ftype = 7 + buf[offset]
            offset += 1

        size = ctrl & 0x1F
        if size == 29:
            size = 29 + buf[offset]
            offset += 1
        elif size == 30:
            size = 285 + int.from_bytes(buf[offset : offset + 2], "big")
            offset += 2
        elif size == 31:
            size = 65821 + int.from_bytes(buf[offset : offset + 3], "big")
            offset += 3

        if ftype == 2:  # utf8 string
            return buf[offset : offset + size].decode("utf-8"), offset + size
        if ftype == 3:  # double
            if size != 8:
                raise MMDBFormatError(f"double with size {size}")
            return struct.unpack(">d", buf[offset : offset + 8])[0], offset + 8
        if ftype == 4:  # bytes
            return bytes(buf[offset : offset + size]), offset + size
        if ftype in (5, 6, 9, 10):  # uint16/32/64/128
            return int.from_bytes(buf[offset : offset + size], "big"), offset + size
        if ftype == 7:  # map
            out: dict[str, Any] = {}
            for _ in range(size):
                key, offset = self.decode(offset)
                out[key], offset = self.decode(offset)
            return out, offset
        if ftype == 8:  # int32 (stored minimally, two's complement at 4 bytes)
            v = int.from_bytes(buf[offset : offset + size], "big")
            if size == 4 and v >= 1 << 31:
                v -= 1 << 32
            return v, offset + size
        if ftype == 11:  # array
            arr = []
            for _ in range(size):
                item, offset = self.decode(offset)
                arr.append(item)
            return arr, offset
        if ftype == 14:  # boolean — value lives in the size bits
            return bool(size), offset
        if ftype == 15:  # float
            if size != 4:
                raise MMDBFormatError(f"float with size {size}")
            return struct.unpack(">f", buf[offset : offset + 4])[0], offset + 4
        raise MMDBFormatError(f"unsupported field type {ftype}")


class MMDBReader:
    """Minimal reader: metadata, point lookup, and full IPv4 range walk."""

    def __init__(self, source: str | bytes):
        if isinstance(source, bytes):
            self.buf = source
        else:
            with open(source, "rb") as f:
                self.buf = f.read()

        marker_at = self.buf.rfind(_METADATA_MARKER)
        if marker_at < 0:
            raise MMDBFormatError("metadata marker not found")
        meta_dec = _Decoder(self.buf, marker_at + len(_METADATA_MARKER))
        self.metadata, _ = meta_dec.decode(marker_at + len(_METADATA_MARKER))

        self.node_count = int(self.metadata["node_count"])
        self.record_size = int(self.metadata["record_size"])
        if self.record_size not in (24, 28, 32):
            raise MMDBFormatError(f"record_size {self.record_size}")
        self.ip_version = int(self.metadata.get("ip_version", 6))
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self.data_base = self.tree_size + _DATA_SECTION_SEPARATOR
        self._decoder = _Decoder(self.buf, self.data_base)
        self._ipv4_root = self._find_ipv4_root()

    # -- search tree ---------------------------------------------------

    def _record(self, node: int, side: int) -> int:
        """Read record ``side`` (0=left, 1=right) of ``node``."""
        buf = self.buf
        off = node * self.node_bytes
        if self.record_size == 24:
            off += side * 3
            return (buf[off] << 16) | (buf[off + 1] << 8) | buf[off + 2]
        if self.record_size == 28:
            if side == 0:
                return (
                    ((buf[off + 3] & 0xF0) << 20)
                    | (buf[off] << 16)
                    | (buf[off + 1] << 8)
                    | buf[off + 2]
                )
            return (
                ((buf[off + 3] & 0x0F) << 24)
                | (buf[off + 4] << 16)
                | (buf[off + 5] << 8)
                | buf[off + 6]
            )
        off += side * 4
        return int.from_bytes(buf[off : off + 4], "big")

    def _find_ipv4_root(self) -> int:
        """IPv6 trees embed IPv4 under 96 leading zero bits (::/96)."""
        node = 0
        if self.ip_version == 6:
            for _ in range(96):
                if node >= self.node_count:
                    break
                node = self._record(node, 0)
        return node

    def _data_at(self, record: int) -> Any:
        file_off = self.tree_size + (record - self.node_count)
        if file_off < self.data_base:
            raise MMDBFormatError(f"record {record} points into the separator")
        value, _ = self._decoder.decode(file_off)
        return value

    # -- public API ----------------------------------------------------

    def lookup(self, ip: int) -> Any | None:
        """Point lookup of an IPv4 address given as a uint32."""
        node = self._ipv4_root
        for depth in range(31, -1, -1):
            if node >= self.node_count:
                break
            node = self._record(node, (ip >> depth) & 1)
        if node == self.node_count:
            return None
        return self._data_at(node)

    def iter_ranges(self, merge_adjacent: bool = True) -> Iterator[tuple[int, int, Any]]:
        """Yield ``(net_start, net_end, record)`` over the IPv4 space in
        ascending address order. With ``merge_adjacent`` (default),
        adjacent ranges carrying an identical payload are merged (the
        tree splits CIDR-aligned; real data has many sibling leaves
        with equal records); pass False to recover the raw CIDR-aligned
        leaves as stored."""
        decoded: dict[int, Any] = {}  # record -> decoded payload (dedup cache)
        pending: tuple[int, int, Any] | None = None
        # iterative DFS, left first => ascending order
        stack: list[tuple[int, int, int]] = [(self._ipv4_root, 0, 0)]
        while stack:
            node, prefix, depth = stack.pop()
            if node == self.node_count:  # empty subtree
                continue
            if node > self.node_count:  # data leaf
                start = prefix << (32 - depth) if depth < 32 else prefix
                end = start + (1 << (32 - depth)) - 1 if depth < 32 else start
                if node not in decoded:
                    decoded[node] = self._data_at(node)
                rec = decoded[node]
                if (
                    merge_adjacent
                    and pending
                    and pending[1] + 1 == start
                    and pending[2] == rec
                ):
                    pending = (pending[0], end, rec)
                else:
                    if pending:
                        yield pending
                    pending = (start, end, rec)
                continue
            if depth >= 32:
                raise MMDBFormatError("tree deeper than 32 bits under IPv4 root")
            # push right then left so left pops first
            stack.append((self._record(node, 1), (prefix << 1) | 1, depth + 1))
            stack.append((self._record(node, 0), prefix << 1, depth + 1))
        if pending:
            yield pending


def _get(rec: Any, *path: str, default: Any = None) -> Any:
    for key in path:
        if not isinstance(rec, dict) or key not in rec:
            return default
        rec = rec[key]
    return rec


def load_geoip_city(spark: SparkSession, path: str | bytes) -> DataFrame:
    """GeoIP2/GeoLite2 City mmdb -> the GEOIP_CITY range dim used by
    ``operators.ingest.geoip_enrich`` (drop-in for the synthetic dim)."""
    reader = MMDBReader(path)
    rows = []
    for start, end, rec in reader.iter_ranges():
        country = _get(rec, "country", "iso_code") or _get(
            rec, "registered_country", "iso_code", default=""
        )
        city = _get(rec, "city", "names", "en", default="")
        rows.append((start, end, str(country or ""), str(city or "")))
    return spark.createDataFrame(rows, schemas.GEOIP_CITY)


def load_geoip_asn(spark: SparkSession, path: str | bytes) -> DataFrame:
    """GeoLite2 ASN mmdb -> the GEOIP_ASN range dim."""
    reader = MMDBReader(path)
    rows = []
    for start, end, rec in reader.iter_ranges():
        asn = _get(rec, "autonomous_system_number", default=0)
        org = _get(rec, "autonomous_system_organization", default="")
        rows.append((start, end, int(asn or 0), str(org or "")))
    return spark.createDataFrame(rows, schemas.GEOIP_ASN)
