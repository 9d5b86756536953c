"""Replicated WalkerPool must match the sharded Graph's walk semantics
(same distributions, same path integrity) with zero exchange."""
import numpy as np

from kkray.graph import WalkerPool
from kkray.walk import deepwalk, node2vec, ppr_walk
from kkray.walk.engine import paths_to_numpy

from graphgen import random_edges


def test_pool_deepwalk_distribution(ray_session):
    v, e = 30, 250
    src, dst = random_edges(v, e, seed=5, undirected=True)
    with WalkerPool.from_arrays(src, dst, num_workers=4, v_num=v) as g:
        paths = paths_to_numpy(deepwalk(g, walker_num=3000, length=12, seed=11))
    assert len(paths) == 3000
    # equal start + analytic transition check
    m = np.zeros((v, v))
    adj = np.zeros((v, v))
    for a, b in zip(src, dst):
        adj[a, b] = 1
    for wid, p in paths.items():
        assert p[0] == wid % v
        for i in range(len(p) - 1):
            m[p[i], p[i + 1]] += 1
    analytic = adj / np.maximum(adj.sum(axis=1, keepdims=True), 1)
    from test_walks import _check_rows

    _check_rows(m, analytic)


def test_pool_node2vec_and_ppr(ray_session):
    v, e = 25, 150
    src, dst = random_edges(v, e, seed=31, undirected=True)
    es = set(zip(src.tolist(), dst.tolist()))
    with WalkerPool.from_arrays(src, dst, num_workers=3, v_num=v) as g:
        pn = paths_to_numpy(node2vec(g, walker_num=300, p=0.5, q=2.0, length=8, seed=3))
        assert len(pn) == 300
        for p in pn.values():
            for i in range(len(p) - 1):
                assert (int(p[i]), int(p[i + 1])) in es
        pp = paths_to_numpy(ppr_walk(g, walker_num=3000, terminate_prob=0.25, seed=7))
    lens = np.array([len(x) - 1 for x in pp.values()])
    assert abs(lens.mean() - 3.0) < 0.3


def test_pool_weighted_sampling(ray_session):
    v, e = 20, 120
    src, dst = random_edges(v, e, seed=8, undirected=True)
    w = (np.random.Generator(np.random.Philox(9)).random(len(src)) * 4 + 1).astype(np.float64)
    m = np.zeros((v, v))
    exp = np.zeros((v, v))
    for a, b, ww in zip(src, dst, w):
        exp[a, b] = ww
    exp = exp / np.maximum(exp.sum(axis=1, keepdims=True), 1e-12)
    with WalkerPool.from_arrays(src, dst, weight=w, num_workers=4, v_num=v) as g:
        paths = paths_to_numpy(deepwalk(g, walker_num=4000, length=10, weighted=True, seed=13))
    for p in paths.values():
        for i in range(len(p) - 1):
            m[p[i], p[i + 1]] += 1
    from test_walks import _check_rows

    _check_rows(m, exp, min_samples=400)
