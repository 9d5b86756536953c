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
from kkray.walk import node2vec
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
