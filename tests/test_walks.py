"""Walk-distribution tests — the reference's signature verification
technique (reference src/tests/test_walk.hpp:73-118): build the empirical
transition matrix from collected paths, normalize rows, compare against the
analytic matrix with a tolerance bound plus an exact support (zero/nonzero)
check. Plus path-integrity (test_path.cpp:180-235) and determinism checks.
"""
import numpy as np
import pytest

from kkray.graph import Graph
from kkray.walk import deepwalk, metapath_walk, mh_walk, node2vec, ppr_walk
from kkray.walk.apps import scheme_from_type_sequence
from kkray.walk.engine import paths_to_numpy

from graphgen import random_edges


def _weights_for(src, dst, seed):
    rng = np.random.Generator(np.random.Philox(seed))
    return (rng.random(len(src)) * 4 + 1).astype(np.float64)


def _analytic_first_order(src, dst, w, v):
    m = np.zeros((v, v))
    for a, b, ww in zip(src, dst, w):
        m[a, b] += ww
    rows = m.sum(axis=1, keepdims=True)
    return np.divide(m, rows, out=np.zeros_like(m), where=rows > 0)


def _empirical(paths, v):
    m = np.zeros((v, v))
    for p in paths.values():
        for i in range(len(p) - 1):
            m[p[i], p[i + 1]] += 1
    return m


def _check_rows(emp_counts, analytic, min_samples=300):
    """Variance-scaled L1 bound per row (the reference's sum-of-squares
    variance bound, test_walk.hpp:73-118): E[L1] ~ sqrt(2k/(pi n)) for a
    k-support multinomial with n samples; allow 3x."""
    rows = emp_counts.sum(axis=1)
    checked = 0
    for u in np.flatnonzero(rows >= min_samples):
        emp = emp_counts[u] / rows[u]
        k = int((analytic[u] > 0).sum())
        tol = max(0.1, 3.0 * np.sqrt(2 * k / (np.pi * rows[u])))
        assert np.abs(emp - analytic[u]).sum() < tol, f"row {u}: L1={np.abs(emp-analytic[u]).sum():.3f} tol={tol:.3f}"
        # support check: impossible transitions must never occur
        assert not np.any((analytic[u] == 0) & (emp > 0)), f"row {u}: support violation"
        checked += 1
    assert checked > 0
    return checked


@pytest.mark.parametrize("weighted", [False, True])
def test_first_order_transition_matrix(ray_session, weighted):
    v, e = 30, 250
    src, dst = random_edges(v, e, seed=5, undirected=True)
    w = _weights_for(src, dst, 6) if weighted else None
    with Graph.from_arrays(src, dst, weight=w, num_parts=3, v_num=v) as g:
        paths = paths_to_numpy(deepwalk(g, walker_num=4000, length=12, weighted=weighted, seed=11))
    analytic = _analytic_first_order(src, dst, w if weighted else np.ones(len(src)), v)
    emp = _empirical(paths, v)
    _check_rows(emp, analytic)


def test_alias_sampler_matches_cdf_distribution(ray_session):
    v, e = 25, 160
    src, dst = random_edges(v, e, seed=8, undirected=True)
    w = _weights_for(src, dst, 9)
    from kkray.walk.spec import TransitionSpec, WalkerSpec
    from kkray.walk.engine import random_walk

    analytic = _analytic_first_order(src, dst, w, v)
    with Graph.from_arrays(src, dst, weight=w, num_parts=3, v_num=v) as g:
        for sampler in ("cdf", "alias"):
            paths = paths_to_numpy(
                random_walk(
                    g,
                    WalkerSpec(3000, "equal"),
                    TransitionSpec(kind="truncated", length=10, weighted=True, sampler=sampler),
                    seed=13,
                )
            )
            _check_rows(_empirical(paths, v), analytic)


def test_ppr_termination_geometry(ray_session):
    v, e = 40, 400
    src, dst = random_edges(v, e, seed=21, undirected=True)
    tp = 1.0 / 5
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        paths = paths_to_numpy(ppr_walk(g, walker_num=6000, terminate_prob=tp, seed=17))
    lens = np.array([len(p) - 1 for p in paths.values()])
    mean = lens.mean()
    expect = (1 - tp) / tp  # geometric mean steps
    assert abs(mean - expect) < 0.25, (mean, expect)
    # memorylessness: P(len>=2 | len>=1) ~ 1-tp
    ge1 = (lens >= 1).sum()
    ge2 = (lens >= 2).sum()
    assert abs(ge2 / ge1 - (1 - tp)) < 0.03


import pytest as _pytest


@_pytest.mark.parametrize("p_,q_", [(0.5, 2.0), (0.25, 4.0)])
def test_node2vec_second_order_matrix(ray_session, p_, q_):
    """Both cases have 1/p > max(1, 1/q), exercising the outlier-appendix
    sampling path (reference node2vec.hpp:47-106); the sampled distribution
    must match the exact second-order transition matrix either way."""
    v, e = 18, 60
    src, dst = random_edges(v, e, seed=31, undirected=True)
    nbrs = [set() for _ in range(v)]
    for a, b in zip(src, dst):
        nbrs[a].add(b)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        paths = paths_to_numpy(node2vec(g, walker_num=20000, p=p_, q=q_, length=6, seed=37))
    # empirical second-order counts keyed (prev, cur) -> next
    counts: dict = {}
    for pth in paths.values():
        for i in range(len(pth) - 2):
            u, vv, x = int(pth[i]), int(pth[i + 1]), int(pth[i + 2])
            counts.setdefault((u, vv), {}).setdefault(x, 0)
        for i in range(len(pth) - 2):
            u, vv, x = int(pth[i]), int(pth[i + 1]), int(pth[i + 2])
            counts[(u, vv)][x] += 1
    checked = 0
    for (u, vv), nxt in counts.items():
        n = sum(nxt.values())
        if n < 400:
            continue
        weights = {}
        for x in nbrs[vv]:
            if x == u:
                weights[x] = 1.0 / p_
            elif x in nbrs[u]:
                weights[x] = 1.0
            else:
                weights[x] = 1.0 / q_
        tot = sum(weights.values())
        l1 = 0.0
        for x, wgt in weights.items():
            l1 += abs(nxt.get(x, 0) / n - wgt / tot)
        assert l1 < 0.15, f"state ({u},{vv}): L1={l1:.3f}"
        for x in nxt:
            assert x in weights, f"impossible transition {u}->{vv}->{x}"
        checked += 1
    assert checked >= 5


@_pytest.mark.parametrize("p_,q_", [(0.25, 2.0), (2.0, 0.5)])
def test_node2vec_weighted_second_order_matrix(ray_session, p_, q_):
    """Weighted second-order walks: (0.25, 2.0) has 1/p > max(1, 1/q) and
    exercises the WEIGHTED outlier-appendix (reference node2vec.hpp:66-84 —
    appendix area w(cur->prev) * (1/p - ub2), return edge located by the
    composite-key lower_bound); (2.0, 0.5) exercises the folded-bound
    weighted path. Either way the sampled distribution must match the
    exact w(v,x)*alpha_pq(u,x) transition matrix."""
    v, e = 18, 60
    src, dst = random_edges(v, e, seed=33, undirected=True)
    w = _weights_for(src, dst, 34)
    wmap = {(int(a), int(b)): float(ww) for a, b, ww in zip(src, dst, w)}
    nbrs = [set() for _ in range(v)]
    for a, b in zip(src, dst):
        nbrs[a].add(b)
    # 60k walkers: the worst-state L1 over ~100 (prev,cur) states is a
    # max-statistic — at 20k one state can sit at ~0.17 by pure sampling
    # noise (verified 1/sqrt(n) decay, no bias); 3x walkers puts the
    # noise floor well under the 0.15 bar
    with Graph.from_arrays(src, dst, weight=w, num_parts=3, v_num=v) as g:
        paths = paths_to_numpy(
            node2vec(g, walker_num=60000, p=p_, q=q_, length=6, weighted=True, seed=39)
        )
    counts: dict = {}
    for pth in paths.values():
        for i in range(len(pth) - 2):
            u, vv, x = int(pth[i]), int(pth[i + 1]), int(pth[i + 2])
            counts.setdefault((u, vv), {}).setdefault(x, 0)
            counts[(u, vv)][x] += 1
    checked = 0
    for (u, vv), nxt in counts.items():
        n = sum(nxt.values())
        if n < 400:
            continue
        weights = {}
        for x in nbrs[vv]:
            if x == u:
                alpha = 1.0 / p_
            elif x in nbrs[u]:
                alpha = 1.0
            else:
                alpha = 1.0 / q_
            weights[x] = wmap[(vv, x)] * alpha
        tot = sum(weights.values())
        l1 = sum(abs(nxt.get(x, 0) / n - wgt / tot) for x, wgt in weights.items())
        assert l1 < 0.15, f"state ({u},{vv}): L1={l1:.3f}"
        for x in nxt:
            assert x in weights, f"impossible transition {u}->{vv}->{x}"
        checked += 1
    assert checked >= 5


def test_alias_table_mass_conservation():
    """The vectorized closed-form Vose build must place EXACTLY the scaled
    weight mass on every outcome within every adjacency slice (a stronger
    check than sampling): prob in [0,1], alias within the slice, and
    per-outcome mass prob[b] + sum(1-prob[b'] over alias[b']==b) == scaled."""
    from kkray.graph.shard_walk import build_alias_tables

    rng = np.random.default_rng(77)
    for trial in range(60):
        nv = int(rng.integers(1, 10))
        deg = rng.integers(0, 9, nv)
        indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
        E = int(indptr[-1])
        w = rng.pareto(1.2, E) + 1e-6 if trial % 2 else rng.random(E) + 1e-6
        prob, alias = build_alias_tables(indptr, w)
        for vv in range(nv):
            s, e = int(indptr[vv]), int(indptr[vv + 1])
            d = e - s
            if d == 0:
                continue
            mass = np.zeros(d)
            for b in range(s, e):
                assert s <= alias[b] < e
                assert -1e-12 <= prob[b] <= 1 + 1e-12
                mass[b - s] += prob[b]
                mass[alias[b] - s] += 1.0 - prob[b]
            assert np.allclose(mass, w[s:e] * d / w[s:e].sum(), atol=1e-9)


def test_metapath_scheme_legality_and_distribution(ray_session):
    v, e, T = 30, 400, 3
    src, dst = random_edges(v, e, seed=41, undirected=True)
    rng = np.random.Generator(np.random.Philox(43))
    et = rng.integers(0, T, len(src)).astype(np.int32)
    etype_of = {(int(a), int(b)): int(t) for a, b, t in zip(src, dst, et)}
    schemes = [scheme_from_type_sequence([0, 1, 2]), scheme_from_type_sequence([2, 0])]
    with Graph.from_arrays(src, dst, etype=et, num_parts=3, v_num=v) as g:
        paths = paths_to_numpy(metapath_walk(g, walker_num=3000, schemes=schemes, length=9, seed=47))
    # every consumed edge type must follow the walker's scheme cyclically
    for wid, pth in paths.items():
        seq = [s for s in (schemes[wid % 2])]
        for i in range(len(pth) - 1):
            t = etype_of[(int(pth[i]), int(pth[i + 1]))]
            assert (1 << t) & seq[i % len(seq)], f"walker {wid} step {i}: type {t} not allowed"


def test_path_integrity_and_determinism(ray_session):
    v, e = 35, 300
    src, dst = random_edges(v, e, seed=51, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=4, v_num=v) as g:
        ds = deepwalk(g, walker_num=500, length=15, seed=3, return_dataset=True)
        fp = ds.to_pandas()
        # every (walker, step) exactly once, steps contiguous from 0
        for wid, grp in fp.groupby("walker_id"):
            steps = np.sort(grp["step"].to_numpy())
            assert np.array_equal(steps, np.arange(len(steps)))
        p1 = paths_to_numpy(deepwalk(g, walker_num=300, length=10, seed=7))
        p2 = paths_to_numpy(deepwalk(g, walker_num=300, length=10, seed=7))
        p3 = paths_to_numpy(deepwalk(g, walker_num=300, length=10, seed=8))
    assert all(np.array_equal(p1[w], p2[w]) for w in p1)  # same seed -> identical
    assert any(not np.array_equal(p1[w], p3[w]) for w in p1)  # different seed -> differs


def test_uniform_start_and_custom_start(ray_session):
    v, e = 30, 200
    src, dst = random_edges(v, e, seed=61, undirected=True)
    starts = np.array([3, 7, 11], dtype=np.int64)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        paths = paths_to_numpy(deepwalk(g, walker_num=90, length=3, start=starts, seed=5))
    for wid, pth in paths.items():
        assert pth[0] == starts[wid % 3]


def test_walker_stuck_at_sink(ray_session):
    # zero-out-degree vertex terminates the walk (reference walk.hpp:956-960)
    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    with Graph.from_arrays(src, dst, num_parts=2, v_num=3) as g:
        paths = paths_to_numpy(deepwalk(g, walker_num=3, length=10))
    assert np.array_equal(paths[0], [0, 1, 2])
    assert np.array_equal(paths[1], [1, 2])
    assert np.array_equal(paths[2], [2])


# ------------------------- Metropolis-Hastings ------------------------- #
def _analytic_mh(src, dst, v):
    """MH chain targeting uniform: P(u->v) = min(1, deg u/deg v)/deg u per
    neighbour, P(u->u) = leftover rejection mass (stay)."""
    deg = np.bincount(src, minlength=v).astype(float)
    m = np.zeros((v, v))
    for a, b in zip(src, dst):
        m[a, b] += min(1.0, deg[a] / deg[b]) / deg[a]
    for u in range(v):
        if deg[u] > 0:
            stay = 1.0 - m[u].sum()
            m[u, u] += stay if stay > 1e-12 else 0.0
    return m


def test_mh_transition_matrix_sharded(ray_session):
    """Sharded path: candidate degrees come from the routed degree
    exchange (engine mh setup); empirical one-step matrix — including the
    reject=stay diagonal — must match the analytic MH kernel."""
    v, e = 30, 250
    src, dst = random_edges(v, e, seed=23, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        paths = paths_to_numpy(mh_walk(g, walker_num=4000, length=12, seed=13))
    analytic = _analytic_mh(src, dst, v)
    emp = _empirical(paths, v)
    _check_rows(emp, analytic)


def test_mh_stationary_uniform_pool(ray_session):
    """Pool path (local degree lookup, no exchange): long-run visit
    frequencies over a connected undirected graph approach UNIFORM — the
    property that distinguishes MH from the simple walk's deg(v)/2E bias."""
    from kkray.graph import WalkerPool

    v = 20
    # a star (hub 0) + ring: sharply non-uniform degrees
    ring_s = np.arange(v, dtype=np.int64)
    ring_d = (ring_s + 1) % v
    star_s = np.zeros(v - 1, dtype=np.int64)
    star_d = np.arange(1, v, dtype=np.int64)
    s = np.concatenate([ring_s, ring_d, star_s, star_d])
    d = np.concatenate([ring_d, ring_s, star_d, star_s])
    pairs = np.unique(np.stack([s, d], axis=1), axis=0)
    s, d = pairs[:, 0], pairs[:, 1]
    with WalkerPool.from_arrays(s, d, num_workers=3, v_num=v) as g:
        paths = paths_to_numpy(mh_walk(g, walker_num=400, length=250, seed=29))
    counts = np.zeros(v)
    burn = 50  # drop the (uniform-start) transient
    for p in paths.values():
        vs, cs = np.unique(p[burn:], return_counts=True)
        counts[vs] += cs
    freq = counts / counts.sum()
    # uniform target: every vertex near 1/v (hub 0 NOT over-represented)
    assert np.abs(freq - 1.0 / v).max() < 0.3 / v, freq
    # contrast: the simple-walk bias would put deg(0)/2E ~ 3x mass on the hub
    deg = np.bincount(s, minlength=v)
    assert freq[0] < 1.5 / v < deg[0] / deg.sum()


@_pytest.mark.parametrize("cap", [0, 10_000])
def test_node2vec_adjacency_piggyback_matrix(ray_session, cap):
    """The adjacency-piggyback path (adj_cap high enough to cover every
    vertex) must sample the SAME second-order transition matrix as the
    default query-forwarding mesh — membership answered from the shipped
    neighbour list instead of at prev's owner, identical acceptance law."""
    v, e = 18, 60
    src, dst = random_edges(v, e, seed=31, undirected=True)
    nbrs = [set() for _ in range(v)]
    for a, b in zip(src, dst):
        nbrs[a].add(b)
    p_, q_ = 0.5, 2.0
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        paths = paths_to_numpy(
            node2vec(g, walker_num=20000, p=p_, q=q_, length=6, seed=41, adj_cap=cap)
        )
    counts: dict = {}
    for pth in paths.values():
        for i in range(len(pth) - 2):
            u, vv, x = int(pth[i]), int(pth[i + 1]), int(pth[i + 2])
            counts.setdefault((u, vv), {}).setdefault(x, 0)
            counts[(u, vv)][x] += 1
    checked = 0
    for (u, vv), nxt in counts.items():
        n = sum(nxt.values())
        if n < 400:
            continue
        weights = {}
        for x in nbrs[vv]:
            weights[x] = (1.0 / p_) if x == u else (1.0 if x in nbrs[u] else 1.0 / q_)
        tot = sum(weights.values())
        l1 = sum(abs(nxt.get(x, 0) / n - wgt / tot) for x, wgt in weights.items())
        assert l1 < 0.15, f"cap={cap} state ({u},{vv}): L1={l1:.3f}"
        for x in nxt:
            assert x in weights, f"impossible transition {u}->{vv}->{x}"
        checked += 1
    assert checked >= 5
