"""RFC 1035 DNS wire-format codec (SURVEY T4), stdlib-only.

The reference's resolution stage shells out to puredns/massdns
(daily_certstream_download.sh:107-108); the protocol those tools speak
is plain RFC 1035 UDP messages. This module implements that wire
format — header, question, resource records, and name compression —
so the resolver boundary (operators/resolve.py) can run the REAL
protocol through any injected byte transport (a UDP socket in a
deployment, canned bytes in tests). No sockets live here: encoding/
decoding is pure and deterministic, the I/O stays at the edge exactly
like the reference keeps massdns outside its JVM.

Supported rdata: A, AAAA, CNAME, NS, PTR, MX, TXT. Compression
pointers are followed on read (with loop protection) and emitted for
the answer-name-equals-question-name case on write — the shape every
real resolver response uses.
"""

from __future__ import annotations

import struct

QTYPE = {"A": 1, "NS": 2, "CNAME": 5, "PTR": 12, "MX": 15, "TXT": 16, "AAAA": 28}
_QTYPE_REV = {v: k for k, v in QTYPE.items()}
CLASS_IN = 1

# header flag fields
FLAG_QR = 0x8000  # response
FLAG_RD = 0x0100  # recursion desired
FLAG_RA = 0x0080  # recursion available
RCODE_NOERROR = 0
RCODE_NXDOMAIN = 3


class DnsWireError(ValueError):
    pass


def encode_name(name: str) -> bytes:
    """domain -> length-prefixed label sequence (RFC 1035 §3.1)."""
    name = name.rstrip(".")
    if not name:
        return b"\x00"
    out = b""
    for label in name.split("."):
        raw = label.encode("idna") if any(ord(c) > 127 for c in label) else label.encode("ascii")
        if not 1 <= len(raw) <= 63:
            raise DnsWireError(f"label length {len(raw)} outside 1..63: {label!r}")
        out += bytes([len(raw)]) + raw
    if len(out) + 1 > 255:
        raise DnsWireError("encoded name exceeds 255 octets")
    return out + b"\x00"


def read_name(data: bytes, off: int) -> tuple[str, int]:
    """Decode a (possibly compressed) name; returns (name, next_offset).
    Pointer chains are loop-protected via a visited-offset set."""
    labels: list[str] = []
    jumped = False
    next_off = off
    seen: set[int] = set()
    while True:
        if off >= len(data):
            raise DnsWireError("truncated name")
        ln = data[off]
        if ln & 0xC0 == 0xC0:  # compression pointer
            if off + 1 >= len(data):
                raise DnsWireError("truncated pointer")
            ptr = ((ln & 0x3F) << 8) | data[off + 1]
            if ptr in seen:
                raise DnsWireError("pointer loop")
            seen.add(ptr)
            if not jumped:
                next_off = off + 2
                jumped = True
            off = ptr
            continue
        if ln == 0:
            if not jumped:
                next_off = off + 1
            return ".".join(labels), next_off
        if ln > 63:
            raise DnsWireError(f"bad label length {ln}")
        off += 1
        labels.append(data[off : off + ln].decode("ascii", "replace"))
        off += ln


def build_query(name: str, qtype: str = "A", qid: int = 0x1234, rd: bool = True) -> bytes:
    """One-question query message (what massdns sends per name)."""
    flags = FLAG_RD if rd else 0
    header = struct.pack(">HHHHHH", qid & 0xFFFF, flags, 1, 0, 0, 0)
    return header + encode_name(name) + struct.pack(">HH", QTYPE[qtype], CLASS_IN)


def _encode_rdata(rtype: str, value: str) -> bytes:
    if rtype == "A":
        parts = [int(p) for p in value.split(".")]
        if len(parts) != 4 or any(not 0 <= p <= 255 for p in parts):
            raise DnsWireError(f"bad A rdata {value!r}")
        return bytes(parts)
    if rtype == "AAAA":
        import ipaddress

        return ipaddress.IPv6Address(value).packed
    if rtype in ("CNAME", "NS", "PTR"):
        return encode_name(value)
    if rtype == "MX":
        pref, host = value.split(" ", 1)
        return struct.pack(">H", int(pref)) + encode_name(host)
    if rtype == "TXT":
        raw = value.encode("utf-8")
        if len(raw) > 255:
            raise DnsWireError("TXT string > 255 octets")
        return bytes([len(raw)]) + raw
    raise DnsWireError(f"unsupported rtype {rtype}")


def _decode_rdata(data: bytes, off: int, rdlen: int, rtype: int) -> str:
    body = data[off : off + rdlen]
    name = _QTYPE_REV.get(rtype)
    if name == "A" and rdlen == 4:
        return ".".join(str(b) for b in body)
    if name == "AAAA" and rdlen == 16:
        import ipaddress

        return str(ipaddress.IPv6Address(body))
    if name in ("CNAME", "NS", "PTR"):
        return read_name(data, off)[0]
    if name == "MX" and rdlen >= 3:
        pref = struct.unpack(">H", body[:2])[0]
        return f"{pref} {read_name(data, off + 2)[0]}"
    if name == "TXT" and rdlen >= 1:
        return body[1 : 1 + body[0]].decode("utf-8", "replace")
    return body.hex()


def build_response(
    query: bytes,
    answers: list[tuple[str, int, str]],
    rcode: int = RCODE_NOERROR,
) -> bytes:
    """Build a response to ``query``: echoes qid + question, appends
    ``answers`` as ``(rtype, ttl, value)`` records whose names point at
    the question name via a compression pointer (offset 12) — the
    layout every recursive resolver emits. Test/fixture side of the
    codec; a real deployment receives these bytes from the network."""
    qid, _flags, qd, _an, _ns, _ar = struct.unpack(">HHHHHH", query[:12])
    if qd != 1:
        raise DnsWireError("expected one-question query")
    _qname, qend = read_name(query, 12)
    question = query[12 : qend + 4]
    flags = FLAG_QR | FLAG_RD | FLAG_RA | (rcode & 0xF)
    out = struct.pack(">HHHHHH", qid, flags, 1, len(answers), 0, 0) + question
    for rtype, ttl, value in answers:
        rdata = _encode_rdata(rtype, value)
        out += (
            b"\xc0\x0c"  # name = pointer to question name at offset 12
            + struct.pack(">HHIH", QTYPE[rtype], CLASS_IN, ttl, len(rdata))
            + rdata
        )
    return out


def parse_message(data: bytes) -> dict:
    """Parse header + question + answer sections. Returns
    ``{"qid", "is_response", "rcode", "questions": [(name, rtype)],
    "answers": [{"name", "rtype", "ttl", "value"}]}`` (authority /
    additional records are skipped — massdns triples only need
    answers)."""
    if len(data) < 12:
        raise DnsWireError("message shorter than header")
    qid, flags, qd, an, _ns, _ar = struct.unpack(">HHHHHH", data[:12])
    off = 12
    questions = []
    for _ in range(qd):
        qname, off = read_name(data, off)
        qtype, _qclass = struct.unpack(">HH", data[off : off + 4])
        off += 4
        questions.append((qname, _QTYPE_REV.get(qtype, str(qtype))))
    answers = []
    for _ in range(an):
        rname, off = read_name(data, off)
        rtype, _rclass, ttl, rdlen = struct.unpack(">HHIH", data[off : off + 10])
        off += 10
        answers.append(
            {
                "name": rname,
                "rtype": _QTYPE_REV.get(rtype, str(rtype)),
                "ttl": ttl,
                "value": _decode_rdata(data, off, rdlen, rtype),
            }
        )
        off += rdlen
    return {
        "qid": qid,
        "is_response": bool(flags & FLAG_QR),
        "rcode": flags & 0xF,
        "questions": questions,
        "answers": answers,
    }
