"""Property tests for the training-order integer formulas — pure
driver-side twins of the column math in operators/packing.py (the
Spark plumbing is pinned by tests/test_packing.py; these sweep the
FORMULAS across random shapes the fixtures can't enumerate)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _picks(x: int, n: int, total: int) -> int:
    """Twin of systematic_sample's picks(): number of midpoint grid
    points p_j = ((2j+1)*total) // (2n), j in [0, n), that are < x."""
    a = 2 * n * x - total
    if a <= 0:
        return 0
    return min(n, (a + 2 * total - 1) // (2 * total))


@settings(max_examples=300, deadline=None)
@given(
    weights=st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=200),
    n=st.integers(min_value=1, max_value=500),
)
def test_systematic_picks_sum_exactly_n(weights, n):
    total = sum(weights)
    grid = [((2 * j + 1) * total) // (2 * n) for j in range(n)]
    # closed form == brute-force point counting, and draws total n
    incl = 0
    drawn = 0
    for w in weights:
        excl, incl = incl, incl + w
        cnt = _picks(incl, n, total) - _picks(excl, n, total)
        brute = sum(1 for p in grid if excl <= p < incl)
        assert cnt == brute
        assert cnt <= (w * n) // total + 1  # proportionality bound
        drawn += cnt
    assert drawn == n


@settings(max_examples=300, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=200),
    s=st.integers(min_value=1, max_value=4096),
)
def test_packing_span_formulas_cover_exactly(lens, s):
    """start/end/offset integer formulas tile the token stream with no
    gap, no overlap, and every sequence except the last exactly full."""
    total = sum(lens)
    n_seqs = -(-total // s)
    fill = [0] * n_seqs
    excl = 0
    for n_tok in lens:
        start_seq = excl // s
        end_seq = (excl + n_tok - 1) // s
        off = excl % s
        assert start_seq * s + off == excl
        assert start_seq <= end_seq < n_seqs
        # the doc's span in each sequence it touches
        for q in range(start_seq, end_seq + 1):
            lo = max(0, q * s - excl)
            hi = min(n_tok, (q + 1) * s - excl)
            assert hi > lo
            fill[q] += hi - lo
        excl += n_tok
    assert all(f == s for f in fill[:-1])
    assert 0 < fill[-1] <= s
    assert sum(fill) == total
