"""Checkpoint/resume equivalence (SURVEY.md §5: run N supersteps == run
N/2, kill, resume N/2) and the Dataset build path round-trip."""
import numpy as np
import pyarrow as pa
import ray.data

from kkray.ckpt import CheckpointManager
from kkray.graph import Graph
from kkray.analytics import connected_components, pagerank

from graphgen import pagerank_oracle, random_edges


def test_pagerank_checkpoint_resume_equivalence(ray_session, tmp_path):
    v, e = 200, 1200
    src, dst = random_edges(v, e, seed=99)
    # full run: 10 fixed iterations
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        full = pagerank(g, max_iters=10, tol=None)
    # interrupted run: 5 iterations, checkpointed, then a fresh Graph resumes
    ck = CheckpointManager(str(tmp_path), "pr")
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        pagerank(g, max_iters=5, tol=None, checkpoint=ck)
    assert ck.latest_complete() == 4
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        resumed = pagerank(g, max_iters=10, tol=None, checkpoint=ck, resume=True)
    assert np.allclose(full, resumed, atol=0, rtol=0)  # bit-identical replay


def test_pagerank_weighted_resume_keeps_kernel(ray_session, tmp_path):
    """Regression (ADVICE r3 high): resume must rebuild the weighted /
    personalized mode state on the fresh actors — a resumed weighted run
    used to silently fall back to the unweighted kernel."""
    rng = np.random.default_rng(7)
    v, e = 150, 900
    src, dst = random_edges(v, e, seed=17)
    w = rng.uniform(0.5, 3.0, size=len(src))
    with Graph.from_arrays(src, dst, weight=w, num_parts=3, v_num=v) as g:
        full = pagerank(g, max_iters=10, tol=None, weighted=True)
    ck = CheckpointManager(str(tmp_path), "prw")
    with Graph.from_arrays(src, dst, weight=w, num_parts=3, v_num=v) as g:
        pagerank(g, max_iters=5, tol=None, weighted=True, checkpoint=ck)
    with Graph.from_arrays(src, dst, weight=w, num_parts=3, v_num=v) as g:
        resumed = pagerank(g, max_iters=10, tol=None, weighted=True, checkpoint=ck, resume=True)
    assert np.allclose(full, resumed, atol=0, rtol=0)
    # mode mismatch between checkpoint and resume request fails loudly
    with Graph.from_arrays(src, dst, weight=w, num_parts=3, v_num=v) as g:
        try:
            pagerank(g, max_iters=10, tol=None, weighted=False, checkpoint=ck, resume=True)
            assert False, "expected lineage mode mismatch to raise"
        except ValueError:
            pass


def test_pagerank_personalized_resume_and_seed_validation(ray_session, tmp_path):
    v, e = 120, 700
    src, dst = random_edges(v, e, seed=23)
    seeds = [3, 11, 40]
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        full = pagerank(g, max_iters=8, tol=None, seeds=np.array(seeds))
    ck = CheckpointManager(str(tmp_path), "prp")
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        pagerank(g, max_iters=4, tol=None, seeds=np.array(seeds), checkpoint=ck)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        resumed = pagerank(g, max_iters=8, tol=None, seeds=np.array(seeds), checkpoint=ck, resume=True)
    assert np.allclose(full, resumed, atol=0, rtol=0)
    assert abs(full.sum() - 1.0) < 1e-9  # no teleport-mass leak
    # out-of-range seeds raise at the driver (ADVICE r3: pr_init silently dropped them)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        try:
            pagerank(g, max_iters=2, tol=None, seeds=np.array([5, v + 10]))
            assert False, "expected out-of-range seed to raise"
        except ValueError:
            pass


def test_checkpoint_manifest_is_commit_point(ray_session, tmp_path):
    ck = CheckpointManager(str(tmp_path), "x")
    ck.save(0, [(0, np.arange(4.0))], metrics={"m": 1}, lineage={"op": "t"})
    # a later, incomplete superstep (no manifest) must be ignored
    import os

    os.makedirs(ck._iter_dir(1), exist_ok=True)
    assert ck.latest_complete() == 0
    parts, manifest = ck.load(0)
    assert manifest["lineage"]["op"] == "t"
    assert np.array_equal(parts[0][1], np.arange(4.0))


def test_cc_resume(ray_session, tmp_path):
    v, e = 150, 130
    src, dst = random_edges(v, e, seed=3, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        full = connected_components(g)
    ck = CheckpointManager(str(tmp_path), "cc")
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        connected_components(g, max_iters=2, checkpoint=ck, checkpoint_every=1)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        resumed = connected_components(g, checkpoint=ck, resume=True)
    assert np.array_equal(full, resumed)


def test_graph_from_dataset_matches_from_arrays(ray_session):
    v, e = 300, 2500
    src, dst = random_edges(v, e, seed=17)
    tbl = pa.table({"src": pa.array(src, pa.uint64()), "dst": pa.array(dst, pa.uint64())})
    ds = ray.data.from_arrow(tbl).repartition(5)
    with Graph.from_dataset(ds, num_parts=4, v_num=v) as g1:
        r1 = pagerank(g1, max_iters=30, tol=None)
    exp = pagerank_oracle(src, dst, v, iters=30, tol=0)
    assert np.allclose(r1, exp, atol=1e-12)
    assert g1.e_num == len(src)


def _paths_df(out):
    df = out.to_pandas().sort_values("walker_id").reset_index(drop=True)
    df["path"] = df["path"].map(list)
    return df


def test_walk_checkpoint_resume_first_order(ray_session, tmp_path):
    """Kill-and-resume mid-walk reproduces the uninterrupted run
    bit-identically (frontier+footprint checkpoint, north_rule)."""
    from kkray.ckpt import CheckpointManager
    from kkray.walk.engine import random_walk
    from kkray.walk.spec import TransitionSpec, WalkerSpec

    v = 60
    src, dst = random_edges(v, 400, seed=9, undirected=True)
    ws = WalkerSpec(120, "equal")
    ts = TransitionSpec(kind="truncated", length=12)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        full = _paths_df(random_walk(g, ws, ts, seed=5))
    ck = CheckpointManager(str(tmp_path), "walk")
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        random_walk(g, ws, ts, seed=5, checkpoint=ck, checkpoint_every=1, max_supersteps=2)
    assert ck.latest_complete() is not None
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        resumed = _paths_df(random_walk(g, ws, ts, seed=5, checkpoint=ck, resume=True))
    assert list(full["walker_id"]) == list(resumed["walker_id"])
    assert all(a == b for a, b in zip(full["path"], resumed["path"]))


def test_walk_checkpoint_resume_node2vec(ray_session, tmp_path):
    from kkray.ckpt import CheckpointManager
    from kkray.walk.engine import random_walk
    from kkray.walk.spec import Node2vecSpec, WalkerSpec

    v = 40
    src, dst = random_edges(v, 300, seed=11, undirected=True)
    ws = WalkerSpec(80, "equal")
    ts = Node2vecSpec(p=0.5, q=2.0, length=10)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        full = _paths_df(random_walk(g, ws, ts, seed=6))
    ck = CheckpointManager(str(tmp_path), "n2v")
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        random_walk(g, ws, ts, seed=6, checkpoint=ck, checkpoint_every=2, max_supersteps=4)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        resumed = _paths_df(random_walk(g, ws, ts, seed=6, checkpoint=ck, resume=True))
    assert list(full["walker_id"]) == list(resumed["walker_id"])
    assert all(a == b for a, b in zip(full["path"], resumed["path"]))


def test_walk_checkpoint_mid_mesh_node2vec(ray_session, tmp_path):
    """Second-order checkpoints land BETWEEN stepA and stepB (mid-mesh):
    the dump carries the parked proposals (darts included) and the
    in-flight stepA emigrant batches, the walk itself is untouched (pure
    snapshot), and a killed run resumes bit-identically — including the
    RNG-free respond/stepB half-superstep replayed from the parked table."""
    from kkray.ckpt import CheckpointManager
    from kkray.walk.engine import random_walk
    from kkray.walk.spec import Node2vecSpec, WalkerSpec

    v = 40
    src, dst = random_edges(v, 260, seed=15, undirected=True)
    ws = WalkerSpec(100, "equal")
    # heavy parking: remote prev + wide (lo2,hi2]; adj_cap=0 disables the
    # adjacency piggyback so the query-forwarding fallback (the path this
    # test checkpoints mid-flight) actually carries the walkers
    ts = Node2vecSpec(p=0.5, q=4.0, length=12, adj_cap=0)
    with Graph.from_arrays(src, dst, num_parts=4, v_num=v) as g:
        full = _paths_df(random_walk(g, ws, ts, seed=21))
    ck = CheckpointManager(str(tmp_path), "n2v_mid")
    with Graph.from_arrays(src, dst, num_parts=4, v_num=v) as g:
        random_walk(g, ws, ts, seed=21, checkpoint=ck, checkpoint_every=2, max_supersteps=5)
    last = ck.latest_complete()
    assert last is not None
    # prove the checkpoint really landed mid-mesh with walkers parked
    found_parked = False
    for it in range(last + 1):
        try:
            parts, _ = ck.load_tables(it)
        except Exception:
            continue
        for t in parts:
            pk = t.get("parked")
            if pk is not None and pk.num_rows:
                found_parked = True
                assert "dart" in pk.column_names
    assert found_parked, "no checkpoint captured parked walkers — test graph too easy"
    with Graph.from_arrays(src, dst, num_parts=4, v_num=v) as g:
        resumed = _paths_df(random_walk(g, ws, ts, seed=21, checkpoint=ck, resume=True))
    assert list(full["walker_id"]) == list(resumed["walker_id"])
    assert all(a == b for a, b in zip(full["path"], resumed["path"]))


def test_graph_from_dataset_layout_and_sketch(ray_session, tmp_path):
    """The distributed build: routed hive layout on disk (one dir per
    partition, resumable artifact), sampled-quantile boundaries above
    exact_degree_limit, and hub splitting — all value-identical to the
    in-memory build."""
    import os

    v, e = 400, 6000
    src, dst = random_edges(v, e, seed=23)
    # add a hub so the split path has work
    src = np.concatenate([src, np.full(300, 11, np.int64)])
    dst = np.concatenate([dst, random_edges(v, 300, seed=24)[1]])
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)})).repartition(5)
    exp = pagerank_oracle(src, dst, v, iters=20, tol=0)

    layout = str(tmp_path / "layout")
    with Graph.from_dataset(ds, num_parts=4, v_num=v, layout_dir=layout) as g:
        assert np.allclose(pagerank(g, max_iters=20, tol=None), exp, atol=1e-12)
        deg = g.out_degrees()
    parts = sorted(d for d in os.listdir(layout) if d.startswith("part="))
    assert len(parts) >= 2  # per-partition dirs actually written

    # sketch boundaries: force the sampled-quantile path
    with Graph.from_dataset(ds, num_parts=4, v_num=v, exact_degree_limit=1) as g:
        assert np.array_equal(g.out_degrees(), deg)
        assert np.allclose(pagerank(g, max_iters=20, tol=None), exp, atol=1e-12)

    # hub splitting through the routed layout
    with Graph.from_dataset(ds, num_parts=4, v_num=v, split_threshold=150) as g:
        assert 11 in g.hub_vids
        assert np.allclose(pagerank(g, max_iters=20, tol=None), exp, atol=1e-9)

    # rerunning into the committed layout REUSES it (no silent append /
    # edge double-count) and still matches
    with Graph.from_dataset(ds, num_parts=4, v_num=v, layout_dir=layout) as g:
        assert g.e_num == len(src)
        assert np.allclose(pagerank(g, max_iters=20, tol=None), exp, atol=1e-12)

    # a non-empty dir WITHOUT the _SUCCESS sentinel (partial write) refuses
    os.remove(os.path.join(layout, "_SUCCESS"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="_SUCCESS"):
        Graph.from_dataset(ds, num_parts=4, v_num=v, layout_dir=layout)


def test_vertex_dataset_outputs(ray_session):
    """as_dataset=True returns the per-vertex result as a streaming
    Dataset from per-shard refs — values identical to the driver vector."""
    from kkray.analytics import label_propagation
    from kkray.analytics.components import connected_components

    v = 120
    src, dst = random_edges(v, 700, seed=13, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        pr = pagerank(g, max_iters=10, tol=None)
        prd = pagerank(g, max_iters=10, tol=None, as_dataset=True).to_pandas().sort_values("vertex")
        assert np.allclose(prd["pagerank"].to_numpy(), pr)
        cc = connected_components(g)
        ccd = connected_components(g, as_dataset=True).to_pandas().sort_values("vertex")
        assert np.array_equal(ccd["label"].to_numpy(), cc)
        lp = label_propagation(g, iters=3)
        lpd = label_propagation(g, iters=3, as_dataset=True).to_pandas().sort_values("vertex")
        assert np.array_equal(lpd["label"].to_numpy(), lp)


def test_is_valid_edge_filter(ray_session):
    """Edges with endpoints outside [0, v_num) are dropped, not crashed on
    (reference load-time is_valid_edge filter), in both build paths."""
    v = 50
    src, dst = random_edges(v, 400, seed=31)
    bad_src = np.concatenate([src, np.array([-3, 7, 200], np.int64)])
    bad_dst = np.concatenate([dst, np.array([5, 999, 4], np.int64)])
    exp = pagerank_oracle(src, dst, v, iters=10, tol=0)
    with Graph.from_arrays(bad_src, bad_dst, num_parts=3, v_num=v) as g:
        assert g.e_num == len(src)
        assert np.allclose(pagerank(g, max_iters=10, tol=None), exp, atol=1e-12)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(bad_src), "dst": pa.array(bad_dst)}))
    with Graph.from_dataset(ds, num_parts=3, v_num=v) as g:
        assert g.e_num == len(src)
        assert np.allclose(pagerank(g, max_iters=10, tol=None), exp, atol=1e-12)


def test_hits_bfs_kcore_resume(ray_session, tmp_path):
    """New iterative ops replay bit-identically from a mid-run checkpoint."""
    from kkray.analytics import bfs_distances, hits, kcore

    v, e = 200, 1200
    src, dst = random_edges(v, e, seed=101)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        fa, fh = hits(g, iters=6)
    ck = CheckpointManager(str(tmp_path), "hits")
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        hits(g, iters=3, checkpoint=ck)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        ra, rh = hits(g, iters=6, checkpoint=ck, resume=True)
    assert np.array_equal(fa, ra) and np.array_equal(fh, rh)

    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        fd = bfs_distances(g, int(src[0]))
    ck = CheckpointManager(str(tmp_path), "bfs")
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        bfs_distances(g, int(src[0]), max_iters=2, checkpoint=ck, checkpoint_every=1)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        rd = bfs_distances(g, int(src[0]), checkpoint=ck, resume=True)
    assert np.array_equal(fd, rd)

    su, du = random_edges(v, 900, seed=102, undirected=True)
    with Graph.from_arrays(su, du, num_parts=3, v_num=v) as g:
        fk = kcore(g, k=4)
    ck = CheckpointManager(str(tmp_path), "kcore")
    with Graph.from_arrays(su, du, num_parts=3, v_num=v) as g:
        kcore(g, k=4, max_rounds=2, checkpoint=ck, checkpoint_every=1)
    with Graph.from_arrays(su, du, num_parts=3, v_num=v) as g:
        rk = kcore(g, k=4, checkpoint=ck, resume=True)
    assert np.array_equal(fk, rk)


def test_sssp_resume(ray_session, tmp_path):
    from kkray.analytics import sssp

    v, e = 200, 1200
    src, dst = random_edges(v, e, seed=103)
    rng = np.random.Generator(np.random.Philox(9))
    w = (rng.random(len(src)) * 3 + 0.5).round(3)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v, weight=w) as g:
        full = sssp(g, int(src[0]))
    ck = CheckpointManager(str(tmp_path), "sssp")
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v, weight=w) as g:
        sssp(g, int(src[0]), max_iters=2, checkpoint=ck, checkpoint_every=1)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v, weight=w) as g:
        res = sssp(g, int(src[0]), checkpoint=ck, resume=True)
    assert np.array_equal(full, res, equal_nan=True)
