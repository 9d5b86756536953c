"""Property-based test (hypothesis) for the sharded second-order walk mesh.

Randomized graphs and (p, q) settings drive the full query-forwarding
mesh (local-continue, bounds, appendix, parking); for every produced path
we assert the walk invariants that hold for ANY correct sampler:
equal-dist start vertices, every consecutive pair is a real edge, walks
reach full length unless they hit a zero-out-degree sink, and the same
seed reproduces the identical path set.
"""
import numpy as np
from hypothesis import given, settings, strategies as st

from kkray.graph import Graph
from kkray.walk import deepwalk, mh_walk, node2vec, ppr_walk
from kkray.walk.engine import paths_to_numpy

from graphgen import random_edges


@settings(max_examples=4, deadline=None)
@given(
    v=st.integers(min_value=5, max_value=40),
    e=st.integers(min_value=10, max_value=250),
    parts=st.integers(min_value=1, max_value=4),
    p=st.sampled_from([0.25, 1.0, 4.0]),
    q=st.sampled_from([0.25, 1.0, 4.0]),
    gseed=st.integers(min_value=0, max_value=10_000),
    wseed=st.integers(min_value=0, max_value=10_000),
)
def test_node2vec_walk_invariants(ray_session, v, e, parts, p, q, gseed, wseed):
    src, dst = random_edges(v, e, seed=gseed, undirected=False)
    if len(src) == 0:
        return
    edge_set = set(zip(src.tolist(), dst.tolist()))
    outdeg = np.bincount(src, minlength=v)
    length = 6
    walkers = 24
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
        p1 = paths_to_numpy(node2vec(g, walker_num=walkers, p=p, q=q, length=length, seed=wseed))
        p2 = paths_to_numpy(node2vec(g, walker_num=walkers, p=p, q=q, length=length, seed=wseed))
    assert set(p1) == set(range(walkers))
    for wid, path in p1.items():
        assert path[0] == wid % v  # equal-dist start (reference i % v_num)
        for a, b in zip(path[:-1], path[1:]):
            assert (int(a), int(b)) in edge_set, (wid, a, b)
        if len(path) < length + 1:  # early stop only at a sink
            assert outdeg[path[-1]] == 0, (wid, path[-1])
        assert np.array_equal(p1[wid], p2[wid])  # same seed -> same path


@settings(max_examples=4, deadline=None)
@given(
    v=st.integers(min_value=5, max_value=40),
    e=st.integers(min_value=10, max_value=250),
    parts=st.integers(min_value=1, max_value=4),
    weighted=st.booleans(),
    gseed=st.integers(min_value=0, max_value=10_000),
    wseed=st.integers(min_value=0, max_value=10_000),
)
def test_first_order_walk_invariants(ray_session, v, e, parts, weighted, gseed, wseed):
    """Deepwalk / PPR / Metropolis-Hastings on randomized sharded graphs:
    equal-dist starts, real-edge transitions (MH may also STAY on a
    reject), sink-only truncation, and seed determinism."""
    src, dst = random_edges(v, e, seed=gseed, undirected=True)
    if len(src) == 0:
        return
    rng = np.random.Generator(np.random.Philox(gseed + 7))
    w = (rng.random(len(src)) * 3 + 0.25).round(3) if weighted else None
    edge_set = set(zip(src.tolist(), dst.tolist()))
    outdeg = np.bincount(src, minlength=v)
    length = 6
    walkers = 24
    with Graph.from_arrays(src, dst, weight=w, num_parts=parts, v_num=v) as g:
        dw1 = paths_to_numpy(deepwalk(g, walker_num=walkers, length=length, weighted=weighted, seed=wseed))
        dw2 = paths_to_numpy(deepwalk(g, walker_num=walkers, length=length, weighted=weighted, seed=wseed))
        pp = paths_to_numpy(ppr_walk(g, walker_num=walkers, terminate_prob=0.3, weighted=weighted, seed=wseed))
        mh = paths_to_numpy(mh_walk(g, walker_num=walkers, length=length, seed=wseed)) if not weighted else {}
    for wid, path in dw1.items():
        assert path[0] == wid % v
        for a, b in zip(path[:-1], path[1:]):
            assert (int(a), int(b)) in edge_set, ("deepwalk", wid, a, b)
        if len(path) < length + 1:
            assert outdeg[path[-1]] == 0
        assert np.array_equal(path, dw2[wid])
    for wid, path in pp.items():
        assert path[0] == wid % v
        for a, b in zip(path[:-1], path[1:]):
            assert (int(a), int(b)) in edge_set, ("ppr", wid, a, b)
    for wid, path in mh.items():
        assert path[0] == wid % v
        for a, b in zip(path[:-1], path[1:]):  # reject = stay re-emits cur
            assert a == b or (int(a), int(b)) in edge_set, ("mh", wid, a, b)
        if len(path) < length + 1:
            assert outdeg[path[-1]] == 0
