"""Heavy-vertex splitting: results must be identical to the unsplit build
(the north_rule skew-handling mechanism — hub adjacency dealt across all
shards, per-superstep hub-value broadcast, partial-sum combine)."""
import numpy as np
import pytest

from kkray.graph import Graph
from kkray.analytics import connected_components, label_propagation, pagerank

from graphgen import cc_oracle, lp_oracle, pagerank_oracle, random_edges


def _skewed_graph(v, e, seed, hub_deg=200):
    src, dst = random_edges(v, e, seed, undirected=True)
    rng = np.random.Generator(np.random.Philox(seed + 1))
    hub_dst = rng.integers(1, v, hub_deg)
    hub_dst = hub_dst[hub_dst != 0][:hub_deg]
    src = np.concatenate([src, np.zeros(len(hub_dst), dtype=np.int64), hub_dst])
    dst = np.concatenate([dst, hub_dst, np.zeros(len(hub_dst), dtype=np.int64)])
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def test_pagerank_split_matches_unsplit_and_oracle(ray_session):
    v = 300
    src, dst = _skewed_graph(v, 1200, seed=3)
    with Graph.from_arrays(src, dst, num_parts=4, v_num=v) as g0:
        plain = pagerank(g0, max_iters=40, tol=None)
    with Graph.from_arrays(src, dst, num_parts=4, v_num=v, split_threshold=50) as g1:
        assert len(g1.hub_vids) >= 1  # the hub actually split
        split = pagerank(g1, max_iters=40, tol=None)
    assert np.allclose(plain, split, atol=1e-12)
    exp = pagerank_oracle(src, dst, v, iters=40, tol=0)
    assert np.allclose(split, exp, atol=1e-10)


def test_cc_and_lp_split_match(ray_session):
    v = 200
    src, dst = _skewed_graph(v, 400, seed=9)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v, split_threshold=40) as g:
        assert len(g.hub_vids) >= 1
        cc = connected_components(g)
        lp = label_propagation(g, iters=4)
    assert np.array_equal(cc, cc_oracle(src, dst, v))
    assert np.array_equal(lp, lp_oracle(src, dst, v, 4))


def test_walks_refuse_split_graph(ray_session):
    v = 100
    src, dst = _skewed_graph(v, 300, seed=11)
    from kkray.walk import deepwalk

    with Graph.from_arrays(src, dst, num_parts=3, v_num=v, split_threshold=30) as g:
        with pytest.raises(Exception):
            deepwalk(g, walker_num=10, length=3)


def test_split_dangling_hub_not_misclassified(ray_session):
    # hub's CSR degree is 0 after splitting; it must NOT count as dangling
    src = np.concatenate([np.zeros(60, dtype=np.int64), [1]])
    dst = np.concatenate([np.arange(1, 61, dtype=np.int64), [0]])
    v = 62  # vertex 61 isolated+dangling
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v, split_threshold=10) as g:
        got = pagerank(g, max_iters=30, tol=None)
    exp = pagerank_oracle(src, dst, v, iters=30, tol=0)
    assert np.allclose(got, exp, atol=1e-12)
