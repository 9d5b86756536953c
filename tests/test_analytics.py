"""Iterative analytics vs pure-python oracles (SURVEY.md §5 carry-over:
PageRank allclose 1e-6+, CC/LP exact, triangles exact)."""
import numpy as np
import pytest

from kkray.graph import Graph
from kkray.analytics import connected_components, label_propagation, pagerank, triangle_count

from graphgen import cc_oracle, lp_oracle, pagerank_oracle, random_edges, triangle_oracle


@pytest.mark.parametrize("v,e,parts", [(50, 120, 3), (300, 2000, 4), (1000, 8000, 7)])
def test_pagerank_matches_power_iteration(ray_session, v, e, parts):
    src, dst = random_edges(v, e, seed=v)
    with Graph.from_arrays(src, dst, num_parts=parts) as g:
        got = pagerank(g, damping=0.85, max_iters=200, tol=1e-12)
    exp = pagerank_oracle(src, dst, v)
    assert np.allclose(got, exp, atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-8


def test_pagerank_with_dangling_and_isolated(ray_session):
    # explicit dangling sink + isolated vertex (v=5 never referenced)
    src = np.array([0, 1, 2, 0], dtype=np.int64)
    dst = np.array([1, 2, 3, 3], dtype=np.int64)
    v = 6
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        got = pagerank(g, max_iters=300, tol=1e-13)
    exp = pagerank_oracle(src, dst, v, iters=500)
    assert np.allclose(got, exp, atol=1e-9)


@pytest.mark.parametrize("v,e,parts", [(60, 50, 3), (500, 700, 5)])
def test_connected_components_exact(ray_session, v, e, parts):
    src, dst = random_edges(v, e, seed=7 + v, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
        got = connected_components(g)
    exp = cc_oracle(src, dst, v)
    assert np.array_equal(got, exp)


@pytest.mark.parametrize("v,e,iters", [(40, 100, 3), (200, 900, 5)])
def test_label_propagation_exact(ray_session, v, e, iters):
    src, dst = random_edges(v, e, seed=13 + v, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=4, v_num=v) as g:
        got = label_propagation(g, iters=iters)
    exp = lp_oracle(src, dst, v, iters)
    assert np.array_equal(got, exp)


@pytest.mark.parametrize("v,e,parts", [(30, 120, 1), (30, 120, 3), (150, 1500, 4), (400, 6000, 6)])
def test_triangle_count_exact(ray_session, v, e, parts):
    src, dst = random_edges(v, e, seed=29 + v, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
        got = triangle_count(g)
    assert got == triangle_oracle(src, dst, v)


@pytest.mark.parametrize("v,e,parts", [(30, 120, 1), (30, 120, 3), (150, 1500, 4), (400, 6000, 6)])
def test_local_clustering_exact(ray_session, v, e, parts):
    from kkray.analytics import local_clustering

    from graphgen import local_tri_oracle

    src, dst = random_edges(v, e, seed=29 + v, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
        tri, cc = local_clustering(g, chunk_pairs=1 << 8)  # force multi-chunk streaming
        deg = g.out_degrees()
    exp = local_tri_oracle(src, dst, v)
    assert np.array_equal(tri, exp)
    exp_cc = np.where(deg >= 2, 2.0 * exp / np.maximum(deg * (deg - 1), 1), 0.0)
    assert np.allclose(cc, exp_cc)
    # corner credits are consistent with the global count
    assert tri.sum() == 3 * triangle_oracle(src, dst, v)


@pytest.mark.parametrize("v,e,parts", [(30, 120, 1), (150, 1500, 4), (400, 6000, 6)])
def test_degree_assortativity_matches_corrcoef(ray_session, v, e, parts):
    from kkray.analytics import degree_assortativity

    src, dst = random_edges(v, e, seed=31 + v, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
        got = degree_assortativity(g)
    deg = np.bincount(src, minlength=v)  # out-degree of the expansion == undirected degree
    exp = np.corrcoef(deg[src], deg[dst])[0, 1]
    assert np.isclose(got, exp, atol=1e-12)


def test_degree_aware_boundaries_balance():
    from kkray.graph import degree_aware_boundaries

    deg = np.zeros(1000, dtype=np.int64)
    deg[0] = 100_000  # extreme hub
    b = degree_aware_boundaries(deg, 8)
    assert b[0] == 0 and b[-1] == 1000
    assert np.all(np.diff(b) >= 0)
    # hub isolated into a narrow partition
    assert b[1] <= 2


def test_empty_graph(ray_session):
    from kkray.analytics import bfs_distances, hits, kcore, sssp

    e0 = np.empty(0, dtype=np.int64)
    with Graph.from_arrays(e0, e0, num_parts=2, v_num=4) as g:
        r = pagerank(g, max_iters=5)
        assert np.allclose(r, 0.25)
        assert triangle_count(g) == 0
        assert bfs_distances(g, 0).tolist() == [0, -1, -1, -1]
        assert kcore(g, k=1).tolist() == [0, 0, 0, 0]
        auth, hub = hits(g, iters=3)
        assert np.allclose(auth, 0) and np.allclose(hub, 0)
    with Graph.from_arrays(e0, e0, num_parts=2, v_num=4, weight=np.empty(0)) as g:
        got = sssp(g, 0)
        assert got[0] == 0.0 and np.isinf(got[1:]).all()


def test_in_degrees_and_map_vertices(ray_session):
    from kkray.graph import Graph

    src, dst = random_edges(120, 900, seed=77)
    with Graph.from_arrays(src, dst, num_parts=4, v_num=120) as g:
        indeg = g.in_degrees()
        assert np.array_equal(indeg, np.bincount(dst, minlength=120))
        # process_vertices parity: global sum of a per-vertex function
        total = g.map_vertices(lambda vids, deg: deg * 2.0)
        assert total == 2.0 * len(src)
        nonzero = g.map_vertices(lambda vids, deg: (deg > 0).astype(float))
        assert nonzero == float(len(np.unique(src)))


# ---------------- HITS / BFS / k-core (beyond-reference ops) ----------------
from kkray.analytics import bfs_distances, hits, kcore  # noqa: E402

from graphgen import bfs_oracle, hits_oracle, kcore_oracle  # noqa: E402


@pytest.mark.parametrize("v,e,parts", [(60, 300, 1), (60, 300, 3), (500, 4000, 5)])
def test_hits_matches_power_iteration(ray_session, v, e, parts):
    src, dst = random_edges(v, e, seed=3 + v)
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
        auth, hub = hits(g, iters=6)
    ea, eh = hits_oracle(src, dst, v, iters=6)
    assert np.allclose(auth, ea, atol=1e-9)
    assert np.allclose(hub, eh, atol=1e-9)


@pytest.mark.parametrize("v,e,parts", [(60, 150, 1), (60, 150, 4), (800, 3000, 5)])
def test_bfs_distances_exact(ray_session, v, e, parts):
    src, dst = random_edges(v, e, seed=17 + v)
    source = int(src[0])
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
        got = bfs_distances(g, source)
    assert np.array_equal(got, bfs_oracle(src, dst, v, source))


def test_bfs_distance_cap(ray_session):
    # path graph 0->1->2->3->4: cap at 2 supersteps leaves 3,4 unreached
    src = np.array([0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 4], dtype=np.int64)
    with Graph.from_arrays(src, dst, num_parts=2, v_num=5) as g:
        got = bfs_distances(g, 0, max_iters=2)
    assert got.tolist() == [0, 1, 2, -1, -1]


@pytest.mark.parametrize("v,e,parts,k", [(50, 200, 1, 3), (50, 200, 3, 3), (400, 3000, 5, 6)])
def test_kcore_exact(ray_session, v, e, parts, k):
    src, dst = random_edges(v, e, seed=29 + v, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
        got = kcore(g, k=k)
    exp = kcore_oracle(src, dst, v, k)
    assert np.array_equal(got, exp)
    assert 0 < exp.sum() < v  # the fixture must exercise both outcomes


@pytest.mark.parametrize("v,e,parts", [(60, 300, 1), (300, 2000, 4)])
def test_pagerank_weighted_matches_oracle(ray_session, v, e, parts):
    from graphgen import pagerank_w_oracle

    src, dst = random_edges(v, e, seed=37 + v)
    rng = np.random.Generator(np.random.Philox(v))
    w = rng.integers(1, 6, len(src)).astype(np.float64)
    exp = pagerank_w_oracle(src, dst, w, v, iters=10)
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v, weight=w) as g:
        # fixed-iteration bundle fast path
        assert np.allclose(pagerank(g, max_iters=10, tol=None, weighted=True), exp, atol=1e-12)
        # per-superstep scatter/gather path (tol set)
        assert np.allclose(
            pagerank(g, max_iters=10, tol=1e-30, weighted=True), exp, atol=1e-12
        )
    # all-equal weights degenerate to the unweighted kernel
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v, weight=np.ones(len(src))) as g:
        got_w = pagerank(g, max_iters=10, tol=None, weighted=True)
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
        got_u = pagerank(g, max_iters=10, tol=None)
    assert np.allclose(got_w, got_u, atol=1e-12)


@pytest.mark.parametrize("v,e,parts", [(60, 300, 1), (300, 2000, 4), (1000, 8000, 7)])
def test_sssp_matches_bellman_ford(ray_session, v, e, parts):
    from kkray.analytics import sssp
    from graphgen import sssp_oracle

    src, dst = random_edges(v, e, seed=41 + v)
    rng = np.random.Generator(np.random.Philox(v + 1))
    w = (rng.random(len(src)) * 4 + 0.5).round(3)
    exp = sssp_oracle(src, dst, w, v, int(src[0]))
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v, weight=w) as g:
        got = sssp(g, int(src[0]))
    assert np.array_equal(got, exp, equal_nan=True)


def test_sssp_hop_cap(ray_session):
    # 0->1->2 (cost 1+1) vs direct 0->2 (cost 5): one round keeps the
    # direct edge's 5, two rounds find the cheaper 2-hop path
    src = np.array([0, 1, 0], dtype=np.int64)
    dst = np.array([1, 2, 2], dtype=np.int64)
    w = np.array([1.0, 1.0, 5.0])
    with Graph.from_arrays(src, dst, num_parts=2, v_num=3, weight=w) as g:
        one = sssp_import()(g, 0, max_iters=1)
    with Graph.from_arrays(src, dst, num_parts=2, v_num=3, weight=w) as g:
        two = sssp_import()(g, 0, max_iters=2)
    assert one.tolist() == [0.0, 1.0, 5.0]
    assert two.tolist() == [0.0, 1.0, 2.0]


def sssp_import():
    from kkray.analytics import sssp

    return sssp


@pytest.mark.parametrize("v,e,parts", [(60, 300, 1), (300, 2000, 4)])
def test_pagerank_personalized_matches_oracle(ray_session, v, e, parts):
    from graphgen import pagerank_p_oracle

    src, dst = random_edges(v, e, seed=53 + v)
    seeds = np.array([0, 3, 7], dtype=np.int64)
    exp = pagerank_p_oracle(src, dst, v, seeds, iters=10)
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
        # bundle fast path and the per-superstep path
        assert np.allclose(pagerank(g, max_iters=10, tol=None, seeds=seeds), exp, atol=1e-12)
        assert np.allclose(pagerank(g, max_iters=10, tol=1e-30, seeds=seeds), exp, atol=1e-12)
    # mass concentrates on/near the seeds and still sums to 1
    assert abs(exp.sum() - 1.0) < 1e-9
    assert exp[seeds].sum() > 3.0 / v


def test_pagerank_weighted_multigraph_duplicate_edges(ray_session):
    """Duplicate (src,dst) entries are independent weighted edges — the
    flow must equal the oracle fed the same duplicated rows."""
    from graphgen import pagerank_w_oracle

    src = np.array([0, 0, 0, 1, 2, 2], dtype=np.int64)  # 0->1 twice
    dst = np.array([1, 1, 2, 2, 0, 1], dtype=np.int64)
    w = np.array([1.0, 3.0, 2.0, 1.0, 4.0, 0.5])
    exp = pagerank_w_oracle(src, dst, w, 3, iters=20)
    with Graph.from_arrays(src, dst, num_parts=2, v_num=3, weight=w) as g:
        got = pagerank(g, max_iters=20, tol=None, weighted=True)
    assert np.allclose(got, exp, atol=1e-12)
