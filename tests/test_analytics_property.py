"""Property-based tests (hypothesis) for the iterative analytics kernels.

Randomized graphs, partition counts, and heavy-vertex split thresholds
drive the sharded gather-scatter engine; results are compared against the
pure-numpy oracles in graphgen.py. This extends the fixed-parametrized
tests in test_analytics.py with randomized structure — including the
ghost-slice hub-splitting path, which the fixed tests only exercise on
hand-built graphs (test_hub_split.py).
"""
import numpy as np
from hypothesis import given, settings, strategies as st

from kkray.graph import Graph
from kkray.analytics import (
    bfs_distances,
    connected_components,
    kcore,
    label_propagation,
    pagerank,
    sssp,
    triangle_count,
)

from graphgen import (
    bfs_oracle,
    cc_oracle,
    kcore_oracle,
    lp_oracle,
    pagerank_oracle,
    random_edges,
    sssp_oracle,
)


@settings(max_examples=5, deadline=None)
@given(
    v=st.integers(min_value=4, max_value=60),
    e=st.integers(min_value=5, max_value=400),
    parts=st.integers(min_value=1, max_value=5),
    gseed=st.integers(min_value=0, max_value=10_000),
)
def test_directed_analytics_match_oracles(ray_session, v, e, parts, gseed):
    src, dst = random_edges(v, e, seed=gseed, undirected=False)
    if len(src) == 0:
        return
    rng = np.random.Generator(np.random.Philox(gseed + 1))
    w = (rng.random(len(src)) * 4 + 0.5).round(3)
    source = int(src[0])
    with Graph.from_arrays(src, dst, weight=w, num_parts=parts, v_num=v) as g:
        pr = pagerank(g, damping=0.85, max_iters=300, tol=1e-13)
        hops = bfs_distances(g, source)
        costs = sssp(g, source)
    assert np.allclose(pr, pagerank_oracle(src, dst, v, iters=400), atol=1e-8)
    assert abs(pr.sum() - 1.0) < 1e-8
    assert np.array_equal(hops, bfs_oracle(src, dst, v, source))
    assert np.array_equal(costs, sssp_oracle(src, dst, w, v, source), equal_nan=True)


@settings(max_examples=4, deadline=None)
@given(
    v=st.integers(min_value=4, max_value=50),
    e=st.integers(min_value=5, max_value=300),
    parts=st.integers(min_value=1, max_value=5),
    split=st.sampled_from([2, 3, 8]),
    gseed=st.integers(min_value=0, max_value=10_000),
)
def test_split_graph_analytics_match_oracles(ray_session, v, e, parts, split, gseed):
    """Heavy-vertex (ghost-slice) splitting is supported by exactly the
    scatter-gather kernels that fold hub contributions: PageRank, CC, LP.
    Randomized split thresholds must leave their results identical to the
    unsplit oracles."""
    src, dst = random_edges(v, e, seed=gseed, undirected=True)
    if len(src) == 0:
        return
    with Graph.from_arrays(
        src, dst, num_parts=parts, v_num=v, split_threshold=split
    ) as g:
        pr = pagerank(g, damping=0.85, max_iters=300, tol=1e-13)
        labels = connected_components(g)
        lp = label_propagation(g, iters=3)
    assert np.allclose(pr, pagerank_oracle(src, dst, v, iters=400), atol=1e-8)
    assert np.array_equal(labels, cc_oracle(src, dst, v))
    assert np.array_equal(lp, lp_oracle(src, dst, v, 3))


def test_single_partition_cc_lp_indegrees(ray_session):
    """Regression (found by the split-graph property test): at num_parts=1,
    ``options(num_returns=1)`` hands the driver ONE ref to the scatter's
    unsplit 1-tuple — CC, LP, and in_degrees crashed on any
    single-partition graph."""
    src, dst = random_edges(40, 120, seed=5, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=1, v_num=40) as g:
        assert np.array_equal(connected_components(g), cc_oracle(src, dst, 40))
        assert np.array_equal(label_propagation(g, iters=3), lp_oracle(src, dst, 40, 3))
        assert np.array_equal(g.in_degrees(), np.bincount(dst, minlength=40))


@settings(max_examples=5, deadline=None)
@given(
    v=st.integers(min_value=4, max_value=60),
    e=st.integers(min_value=5, max_value=300),
    parts=st.integers(min_value=1, max_value=5),
    iters=st.integers(min_value=1, max_value=4),
    k=st.integers(min_value=2, max_value=4),
    gseed=st.integers(min_value=0, max_value=10_000),
)
def test_undirected_analytics_match_oracles(ray_session, v, e, parts, iters, k, gseed):
    src, dst = random_edges(v, e, seed=gseed, undirected=True)
    if len(src) == 0:
        return
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
        labels = connected_components(g)
        lp = label_propagation(g, iters=iters)
        tris = triangle_count(g)
        core = kcore(g, k)
    assert np.array_equal(labels, cc_oracle(src, dst, v))
    assert np.array_equal(lp, lp_oracle(src, dst, v, iters))
    from graphgen import triangle_oracle

    assert tris == triangle_oracle(src, dst, v)
    assert np.array_equal(core, kcore_oracle(src, dst, v, k))
