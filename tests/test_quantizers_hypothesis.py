"""Property tests for the integer quantizer family (q16 surprisal,
quantile log buckets, HyperLogLogPlus codec, murmur2) — the primitives
every hash-exact operator of rounds 4-5 leans on."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from sstable_migrator_spark.operators.lm import q16_surprisal_int
from sstable_migrator_spark.sinks.sstable_format import _HLLP, murmur2_64


@settings(max_examples=300, deadline=None)
@given(
    num=st.integers(min_value=1, max_value=1 << 50),
    den=st.integers(min_value=1, max_value=1 << 50),
)
def test_q16_bounds_and_monotonicity(num, den):
    if num > den:
        num, den = den, num
    q = q16_surprisal_int(num, den)
    true = 16 * math.log2(den / num)
    # linear-mantissa approximation bound (0.086 log2 units * 16) plus
    # the floor of the integer division
    assert true - 2.5 <= q <= true + 2.5
    assert q >= 0
    # monotone in den (a rarer event can never quantize as less
    # surprising by more than the approximation's one-step wobble)
    if den < 1 << 50:
        assert q16_surprisal_int(num, den * 2) >= q


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_murmur2_64_range_and_determinism(data):
    h = murmur2_64(data)
    assert 0 <= h < 1 << 64
    assert murmur2_64(data) == h
    # appending a byte must change the hash (length is mixed in)
    assert murmur2_64(data + b"\x00") != h


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(min_size=1, max_size=16), min_size=0, max_size=300))
def test_hllp_roundtrip_and_merge_property(keys):
    est = _HLLP()
    for k in keys:
        est.offer_key(k)
    # serialize/parse identity
    back = _HLLP.parse(est.serialize())
    assert bytes(back.regs) == bytes(est.regs)
    # merging two halves by register max equals the whole
    a, b = _HLLP(), _HLLP()
    for i, k in enumerate(keys):
        (a if i % 2 else b).offer_key(k)
    merged = bytes(max(x, y) for x, y in zip(a.regs, b.regs))
    assert merged == bytes(est.regs)
    # estimate sane on the distinct count
    n = len(set(keys))
    got = est.estimate()
    assert got == 0 if n == 0 else abs(got - n) <= max(0.1 * n, 4)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 62)))
def test_log_bucket_lower_bound_python_model(v):
    """Driver-side model of quantiles.log_bucket/bucket_lower_bound:
    bucket is monotone, lower bound <= v, relative error <= 1/16,
    exact below 16 (the column-form agreement is pinned separately in
    test_sketches on sampled values)."""
    if v <= 0:
        bucket = 0
    else:
        msb = v.bit_length() - 1
        frac = (
            (v >> (msb - 4)) & 15 if msb >= 4 else (v << (4 - msb)) & 15
        )
        bucket = 16 * msb + frac + 1
    if bucket == 0:
        lo = 0
    else:
        b = bucket - 1
        m, f = b // 16, b % 16
        lo = (16 + f) << (m - 4) if m >= 4 else (16 + f) >> (4 - m)
    assert lo <= v
    if v >= 16:
        assert (v - lo) * 16 <= v
    else:
        assert lo == v
