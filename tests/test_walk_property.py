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
from kkray.walk import deepwalk, metapath_walk, mh_walk, node2vec, ppr_walk
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


@settings(max_examples=4, deadline=None)
@given(
    v=st.integers(min_value=5, max_value=35),
    e=st.integers(min_value=15, max_value=250),
    parts=st.integers(min_value=1, max_value=4),
    ntypes=st.integers(min_value=1, max_value=4),
    schemes=st.lists(
        st.lists(st.integers(min_value=1, max_value=15), min_size=1, max_size=4),
        min_size=1,
        max_size=3,
    ),
    gseed=st.integers(min_value=0, max_value=10_000),
    wseed=st.integers(min_value=0, max_value=10_000),
)
def test_metapath_walk_invariants(ray_session, v, e, parts, ntypes, schemes, gseed, wseed):
    """Randomized edge types and scheme bitmasks: every consumed edge's
    type must be allowed at the walker's cyclic scheme position; a walk
    truncates early ONLY when the current vertex has no out-edge of an
    allowed type; same seed replays identically."""
    tmask_all = (1 << ntypes) - 1
    schemes = [[m & tmask_all or 1 for m in s] for s in schemes]
    src, dst = random_edges(v, e, seed=gseed, undirected=True)
    if len(src) == 0:
        return
    rng = np.random.Generator(np.random.Philox(gseed + 3))
    et = rng.integers(0, ntypes, len(src)).astype(np.int32)
    etype_of = {(int(a), int(b)): int(t) for a, b, t in zip(src, dst, et)}
    # out-neighbour type bitmask per vertex, for the stuck-only-truncation check
    vmask = np.zeros(v, dtype=np.int64)
    for a, t in zip(src.tolist(), et.tolist()):
        vmask[a] |= 1 << t
    length = 6
    walkers = 24
    with Graph.from_arrays(src, dst, etype=et, num_parts=parts, v_num=v) as g:
        p1 = paths_to_numpy(metapath_walk(g, walker_num=walkers, schemes=schemes, length=length, seed=wseed))
        p2 = paths_to_numpy(metapath_walk(g, walker_num=walkers, schemes=schemes, length=length, seed=wseed))
    S = len(schemes)
    for wid, path in p1.items():
        assert path[0] == wid % v
        sch = schemes[wid % S]
        for i in range(len(path) - 1):
            t = etype_of[(int(path[i]), int(path[i + 1]))]
            assert (1 << t) & sch[i % len(sch)], (wid, i, t, sch)
        if len(path) < length + 1:  # stuck: no out-edge of the allowed type
            pos = (len(path) - 1) % len(sch)
            assert not (vmask[path[-1]] & sch[pos]), (wid, path[-1], sch[pos])
        assert np.array_equal(path, p2[wid])


@settings(max_examples=4, deadline=None)
@given(
    v=st.integers(min_value=5, max_value=40),
    e=st.integers(min_value=10, max_value=250),
    workers=st.integers(min_value=1, max_value=4),
    p=st.sampled_from([0.25, 1.0, 4.0]),
    q=st.sampled_from([0.25, 1.0, 4.0]),
    gseed=st.integers(min_value=0, max_value=10_000),
    wseed=st.integers(min_value=0, max_value=10_000),
)
def test_walker_pool_invariants(ray_session, v, e, workers, p, q, gseed, wseed):
    """Same invariants on the replicated WalkerPool path (zero-exchange
    walks over one plasma-shared CSR): equal-dist starts, real edges,
    sink-only truncation, seed determinism — for deepwalk AND node2vec."""
    from kkray.graph import WalkerPool

    src, dst = random_edges(v, e, seed=gseed, undirected=False)
    if len(src) == 0:
        return
    edge_set = set(zip(src.tolist(), dst.tolist()))
    outdeg = np.bincount(src, minlength=v)
    length = 6
    walkers = 24
    with WalkerPool.from_arrays(src, dst, num_workers=workers, v_num=v) as wp:
        d1 = paths_to_numpy(deepwalk(wp, walker_num=walkers, length=length, seed=wseed))
        n1 = paths_to_numpy(node2vec(wp, walker_num=walkers, p=p, q=q, length=length, seed=wseed))
        n2 = paths_to_numpy(node2vec(wp, walker_num=walkers, p=p, q=q, length=length, seed=wseed))
    for paths in (d1, n1):
        assert set(paths) == set(range(walkers))
        for wid, path in paths.items():
            assert path[0] == wid % v
            for a, b in zip(path[:-1], path[1:]):
                assert (int(a), int(b)) in edge_set, (wid, a, b)
            if len(path) < length + 1:
                assert outdeg[path[-1]] == 0, (wid, path[-1])
    for wid in n1:
        assert np.array_equal(n1[wid], n2[wid])
