"""RFC 1035 wire codec + wire_resolver boundary (SURVEY T4): the
protocol massdns speaks, with the socket kept at the edge."""

from __future__ import annotations

import pytest

from sstable_migrator_spark.functions.dnswire import (
    RCODE_NXDOMAIN,
    DnsWireError,
    build_query,
    build_response,
    encode_name,
    parse_message,
    read_name,
)


def test_query_roundtrip():
    q = build_query("www.example.com", qtype="A", qid=0xBEEF)
    msg = parse_message(q)
    assert msg["qid"] == 0xBEEF and not msg["is_response"]
    assert msg["questions"] == [("www.example.com", "A")]


def test_response_answers_with_compression():
    q = build_query("cdn.example.org", qtype="A", qid=7)
    r = build_response(
        q,
        [("CNAME", 300, "edge.example.net"), ("A", 60, "192.0.2.7")],
    )
    msg = parse_message(r)
    assert msg["is_response"] and msg["qid"] == 7 and msg["rcode"] == 0
    # the answer names decode through the compression pointer
    assert [a["name"] for a in msg["answers"]] == ["cdn.example.org"] * 2
    assert msg["answers"][0] == {
        "name": "cdn.example.org", "rtype": "CNAME", "ttl": 300,
        "value": "edge.example.net",
    }
    assert msg["answers"][1]["value"] == "192.0.2.7"


def test_rdata_types_roundtrip():
    q = build_query("x.example", qid=1)
    r = build_response(
        q,
        [
            ("AAAA", 30, "2001:db8::1"),
            ("MX", 30, "10 mail.example.com"),
            ("TXT", 30, "v=spf1 -all"),
            ("NS", 30, "ns1.example.com"),
        ],
    )
    vals = {a["rtype"]: a["value"] for a in parse_message(r)["answers"]}
    assert vals == {
        "AAAA": "2001:db8::1",
        "MX": "10 mail.example.com",
        "TXT": "v=spf1 -all",
        "NS": "ns1.example.com",
    }


def test_malformed_guards():
    with pytest.raises(DnsWireError):
        encode_name("a" * 64 + ".example")  # label > 63
    with pytest.raises(DnsWireError):
        parse_message(b"\x00\x01")  # shorter than header
    # pointer loop: name at offset 12 pointing at itself
    evil = bytes(12) + b"\xc0\x0c"
    with pytest.raises(DnsWireError):
        read_name(evil, 12)


def test_wire_resolver_end_to_end(spark):
    """resolve_domains runs the REAL protocol through a canned byte
    transport: query bytes in, response bytes out, massdns triples."""
    from sstable_migrator_spark.operators.resolve import resolve_domains, wire_resolver

    zone = {
        "a.example.com": [("A", 60, "198.51.100.1")],
        "b.example.com": [("CNAME", 60, "cdn.example.net")],
        "gone.example.com": None,  # NXDOMAIN
    }

    def transport(query: bytes) -> bytes:
        name = parse_message(query)["questions"][0][0]
        recs = zone[name]
        if recs is None:
            return build_response(query, [], rcode=RCODE_NXDOMAIN)
        return build_response(query, recs)

    domains = spark.createDataFrame(
        [(d,) for d in zone], "domain string"
    )
    out = {
        r["domain"]: (r["record_type"], r["ip"])
        for r in resolve_domains(domains, resolver=wire_resolver(transport)).collect()
    }
    assert out == {
        "a.example.com": ("A", "198.51.100.1"),
        "b.example.com": ("CNAME", "cdn.example.net"),
    }


def test_udp_transport_loopback_roundtrip():
    """Integration: wire_resolver over the real UDP socket transport
    against a loopback server speaking canned RFC 1035 responses."""
    import socket
    import threading

    from sstable_migrator_spark.functions.dnswire import (
        RCODE_NXDOMAIN,
        build_response,
        parse_message,
    )
    from sstable_migrator_spark.operators.resolve import udp_transport, wire_resolver

    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    srv.settimeout(5.0)

    canned = {
        "a.example.com": [("A", 300, "10.1.2.3")],
        "alias.example.com": [("CNAME", 300, "cdn.example.net")],
    }

    def serve(n):
        for _ in range(n):
            data, addr = srv.recvfrom(4096)
            q = parse_message(data)
            name = q["questions"][0][0]
            if name in canned:
                srv.sendto(build_response(data, canned[name]), addr)
            else:
                srv.sendto(build_response(data, [], rcode=RCODE_NXDOMAIN), addr)

    t = threading.Thread(target=serve, args=(3,), daemon=True)
    t.start()
    try:
        resolve = wire_resolver(
            udp_transport("127.0.0.1", port, timeout_s=2.0, enabled=True)
        )
        assert resolve("a.example.com") == ("A", "10.1.2.3")
        assert resolve("alias.example.com") == ("CNAME", "cdn.example.net")
        assert resolve("gone.example.com") is None
    finally:
        t.join(timeout=5)
        srv.close()


def test_udp_transport_disabled_by_default(monkeypatch):
    import pytest

    from sstable_migrator_spark.operators.resolve import udp_transport

    monkeypatch.delenv("SPARK_GRAFT_DNS_UDP", raising=False)
    with pytest.raises(RuntimeError, match="disabled by default"):
        udp_transport("127.0.0.1", 5353)
    monkeypatch.setenv("SPARK_GRAFT_DNS_UDP", "1")
    udp_transport("127.0.0.1", 5353)  # flag set -> constructs fine


def test_udp_transport_timeout_raises():
    """No server listening: transport must retry then raise TimeoutError,
    never hang or return garbage."""
    import socket

    import pytest

    from sstable_migrator_spark.operators.resolve import udp_transport

    # reserve a port with no reader
    hole = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    hole.bind(("127.0.0.1", 0))
    port = hole.getsockname()[1]
    hole.close()  # closed -> datagrams dropped, no response ever
    t = udp_transport("127.0.0.1", port, timeout_s=0.2, retries=1, enabled=True)
    with pytest.raises(TimeoutError):
        t(b"\x00\x01" + b"\x00" * 10)
