"""Vendored protobuf runtime shim: wire-contract details beyond what
the pyspark state client exercises — auto-vivified submessage
mutation, packed repeated scalars, presence semantics."""

from __future__ import annotations

import sys

import pytest

from sstable_migrator_spark.streaming.protoshim import SHIM_DIR, ensure_protobuf


@pytest.fixture(scope="module")
def rt():
    ensure_protobuf()
    if SHIM_DIR not in sys.path and "google" not in sys.modules:
        sys.path.insert(0, SHIM_DIR)
    from google.protobuf import _shim_runtime as rt  # shim-only module

    return rt


def _make_classes(rt):
    inner = rt.MessageDescriptor("Inner", "t.Inner")
    f = rt.FieldDescriptor()
    f.name, f.number, f.type = "value", 1, rt.T_INT64
    inner.fields = [f]
    outer = rt.MessageDescriptor("Outer", "t.Outer")
    g = rt.FieldDescriptor()
    g.name, g.number, g.type, g.type_name = "inner", 1, rt.T_MESSAGE, ".t.Inner"
    d = rt.FieldDescriptor()
    d.name, d.number, d.type, d.label = "ds", 2, rt.T_DOUBLE, rt.LABEL_REPEATED
    outer.fields = [g, d]
    reg = {}
    rt.build_message_class(inner, reg)
    rt.build_message_class(outer, reg)
    rt.resolve_message_fields(reg)
    return reg["t.Inner"][1], reg["t.Outer"][1]


def test_autovivified_submessage_serializes(rt):
    _, Outer = _make_classes(rt)
    m = Outer()
    m.inner.value = 5            # mutation through attribute access
    assert m.HasField("inner")
    blob = m.SerializeToString()
    back = Outer()
    back.ParseFromString(blob)
    assert back.inner.value == 5
    # a merely-ACCESSED child stays absent
    m2 = Outer()
    _ = m2.inner.value
    assert not m2.HasField("inner")
    assert m2.SerializeToString() == b""


def test_packed_repeated_doubles_parse(rt):
    import struct as s

    _, Outer = _make_classes(rt)
    # peer-encoded packed form: field 2, wire type 2, two LE doubles
    payload = s.pack("<dd", 1.5, -2.25)
    blob = bytes([0x12, len(payload)]) + payload
    m = Outer()
    m.ParseFromString(blob)
    assert list(m.ds) == [1.5, -2.25]
    # unpacked form (wt=1 per element) parses too
    blob2 = bytes([0x11]) + s.pack("<d", 3.5) + bytes([0x11]) + s.pack("<d", 4.5)
    m2 = Outer()
    m2.ParseFromString(blob2)
    assert list(m2.ds) == [3.5, 4.5]
