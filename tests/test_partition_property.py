"""Property-based tests for degree-aware range partitioning (pure numpy,
no Ray): boundary arrays must cover the vertex range monotonically and
keep per-partition workload within one max-item of the even share, for
arbitrary degree distributions including extreme hub skew."""
import numpy as np
from hypothesis import given, settings, strategies as st

from kkray.graph.partition import VERTEX_UNIT_COST, degree_aware_boundaries


@settings(max_examples=50, deadline=None)
@given(
    v=st.integers(min_value=0, max_value=500),
    parts=st.integers(min_value=1, max_value=16),
    hub=st.integers(min_value=0, max_value=1_000_000),
    dseed=st.integers(min_value=0, max_value=10_000),
)
def test_degree_aware_boundaries_invariants(v, parts, hub, dseed):
    rng = np.random.Generator(np.random.Philox(dseed))
    deg = rng.integers(0, 50, v).astype(np.int64)
    if v:
        deg[rng.integers(0, v)] += hub  # one arbitrarily heavy vertex
    b = degree_aware_boundaries(deg, parts)
    assert b[0] == 0 and b[-1] == v
    assert np.all(np.diff(b) >= 0)  # monotone: every vertex owned once
    if v == 0:
        return
    work = deg + VERTEX_UNIT_COST
    total = int(work.sum())
    share = total / max(1, len(b) - 1)
    max_item = int(work.max())
    for p in range(len(b) - 1):
        w = int(work[b[p] : b[p + 1]].sum())
        # a cut can overshoot its target by at most the item it landed on
        assert w <= share + max_item + 1, (p, w, share, max_item)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=3000),
    hi=st.sampled_from([10, 1000, 1 << 20, 1 << 33]),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_sort2_equals_lexsort(n, hi, seed):
    """sort2's composite-key fast path (and its >=2^31 lexsort fallback)
    must order identically to np.lexsort((secondary, primary))."""
    from kkray.utils import sort2

    rng = np.random.Generator(np.random.Philox(seed))
    p = rng.integers(0, hi, n)
    s = rng.integers(0, hi, n)
    got = sort2(p, s)
    exp = np.lexsort((s, p))
    # orders may differ on fully-equal key pairs only; compare the keys
    assert np.array_equal(p[got], p[exp]) and np.array_equal(s[got], s[exp])
