"""K-hop neighbor sampling: deterministic mode vs a brute numpy
reference on randomized graphs, uniform-mode invariants (fanout bound,
adjacency subset, seed reproducibility, block-split invariance)."""
import numpy as np
import pandas as pd
import ray.data
from hypothesis import given, settings, strategies as st

import pytest

from kkray.graph import khop_neighbors, khop_neighbors_graph
from kkray.graph.builder import Graph
from kkray.ops import to_pandas_typed


def _rand_edges(rng, n_v, n_e):
    src = rng.integers(0, n_v, n_e)
    dst = rng.integers(0, n_v, n_e)
    df = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates().astype("int64")
    return df[df.src != df.dst].reset_index(drop=True)


def _brute_first(df, seeds, fanouts):
    """Pure-pandas reference of mode='first': per hop, the f smallest dst
    per (root, src), expanding distinct (root, dst) frontiers."""
    rows = []
    frontier = pd.DataFrame({"root": seeds, "v": seeds})
    for hop, f in enumerate(fanouts, start=1):
        m = df.merge(frontier, left_on="src", right_on="v")
        top = m.sort_values("dst").groupby(["root", "src"], sort=False).head(f)
        top = top.assign(hop=hop)[["root", "hop", "src", "dst"]]
        rows.append(top)
        frontier = top[["root", "dst"]].drop_duplicates().rename(columns={"dst": "v"})
    out = pd.concat(rows) if rows else pd.DataFrame(columns=["root", "hop", "src", "dst"])
    return out.sort_values(["root", "hop", "src", "dst"]).reset_index(drop=True).astype("int64")


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 10_000), nblocks=st.sampled_from([1, 3, 7]))
def test_khop_first_matches_brute(ray_session, seed, nblocks):
    rng = np.random.default_rng(seed)
    df = _rand_edges(rng, 40, 300)
    seeds = np.unique(rng.integers(0, 40, 6)).astype(np.int64)
    ds = ray.data.from_pandas(df).repartition(nblocks)
    got = (
        to_pandas_typed(khop_neighbors(ds, seeds, [3, 2], mode="first"))
        .sort_values(["root", "hop", "src", "dst"])
        .reset_index(drop=True)
        .astype("int64")
    )
    exp = _brute_first(df, seeds, [3, 2])
    pd.testing.assert_frame_equal(got, exp)


def test_khop_uniform_invariants(ray_session):
    rng = np.random.default_rng(7)
    df = _rand_edges(rng, 60, 800)
    seeds = np.arange(0, 60, 11, dtype=np.int64)
    ds = ray.data.from_pandas(df).repartition(4)
    fanouts = [4, 2]
    adj = set(zip(df["src"], df["dst"]))

    runs = []
    for nblocks in (4, 9):
        out = to_pandas_typed(
            khop_neighbors(ray.data.from_pandas(df).repartition(nblocks), seeds, fanouts, mode="uniform", rng_seed=3)
        ).sort_values(["root", "hop", "src", "dst"]).reset_index(drop=True)
        runs.append(out)
    # reproducible across runs and block splits
    pd.testing.assert_frame_equal(runs[0], runs[1])
    out = runs[0]
    # every sampled edge is a real edge; fanout bound holds per (root, src)
    assert all((s, d) in adj for s, d in zip(out["src"], out["dst"]))
    for hop, f in enumerate(fanouts, start=1):
        h = out[out["hop"] == hop]
        assert h.groupby(["root", "src"]).size().max() <= f
        # hop-1 sources are exactly the seeds that have out-edges
        if hop == 1:
            assert set(h["src"]) <= set(seeds.tolist())
    # a different rng_seed yields a different (but still valid) sample
    other = to_pandas_typed(khop_neighbors(ds, seeds, fanouts, mode="uniform", rng_seed=4))
    assert not other.sort_values(["root", "hop", "src", "dst"]).reset_index(drop=True).equals(out)


def test_khop_empty_and_sink_seeds(ray_session):
    df = pd.DataFrame({"src": [0, 0, 1], "dst": [1, 2, 3]}).astype("int64")
    ds = ray.data.from_pandas(df)
    # seed 5 has no out-edges; seed 3 is a sink reached at hop 1
    out = to_pandas_typed(khop_neighbors(ds, np.array([1, 5]), [2, 2], mode="first"))
    out = out.sort_values(["root", "hop", "src", "dst"]).reset_index(drop=True)
    assert out["root"].tolist() == [1]
    assert out["hop"].tolist() == [1]
    assert out["dst"].tolist() == [3]
    # all-empty seeds
    none = to_pandas_typed(khop_neighbors(ds, np.array([], dtype=np.int64), [2], mode="first"))
    assert len(none) == 0 and list(none.columns) == ["root", "hop", "src", "dst"]


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10_000), num_parts=st.sampled_from([1, 3, 5]), mode=st.sampled_from(["first", "uniform"]))
def test_khop_graph_path_matches_edge_table(ray_session, seed, num_parts, mode):
    """The CSR-shard route (khop_neighbors_graph, owner-routed frontier
    probes — no edge-table scan) must be bit-identical to the edge-table
    route in BOTH modes: same keyed splitmix64 rank, same tie-breaks."""
    rng = np.random.default_rng(seed)
    df = _rand_edges(rng, 50, 400)
    seeds = np.unique(rng.integers(0, 50, 7)).astype(np.int64)
    ds = ray.data.from_pandas(df).repartition(3)
    cols = ["root", "hop", "src", "dst"]
    exp = (
        to_pandas_typed(khop_neighbors(ds, seeds, [3, 2], mode=mode, rng_seed=9))
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    with Graph.from_arrays(
        df["src"].to_numpy(), df["dst"].to_numpy(), num_parts=num_parts, v_num=50
    ) as g:
        got = (
            khop_neighbors_graph(g, seeds, [3, 2], mode=mode, rng_seed=9)
            .to_pandas().sort_values(cols).reset_index(drop=True).astype("int64")
        )
    pd.testing.assert_frame_equal(got, exp)


def test_khop_graph_path_sink_seeds_and_split_refusal(ray_session):
    src = np.array([0, 0, 1], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    with Graph.from_arrays(src, dst, num_parts=2, v_num=6) as g:
        out = (
            khop_neighbors_graph(g, np.array([1, 5]), [2, 2], mode="first")
            .to_pandas().sort_values(["root", "hop", "src", "dst"]).reset_index(drop=True)
        )
        assert out["root"].tolist() == [1]
        assert out["dst"].tolist() == [3]
        none = to_pandas_typed(khop_neighbors_graph(g, np.array([], dtype=np.int64), [2]))
        assert len(none) == 0 and list(none.columns) == ["root", "hop", "src", "dst"]
    # heavy-vertex-split graphs scatter hub adjacency: must refuse
    hub_src = np.concatenate([np.zeros(20, dtype=np.int64), src])
    hub_dst = np.concatenate([np.arange(1, 21, dtype=np.int64), dst])
    with Graph.from_arrays(hub_src, hub_dst, num_parts=2, v_num=25, split_threshold=5) as g:
        with pytest.raises(ValueError, match="full local adjacency"):
            khop_neighbors_graph(g, np.array([0]), [2])


def test_khop_uniform_is_uniform(ray_session):
    """KnightKing-style distribution check (the reference's signature
    empirical-vs-analytic technique, test_walk.hpp:73-118 analogue):
    300 roots share the same 12 out-neighbors; the rank hash is keyed by
    (root, src, dst), so each root draws an independent
    fanout-of-deg sample and every neighbor must be selected with
    frequency ~= fanout/deg across roots. ONE engine call."""
    n_roots, deg, fanout = 300, 12, 3
    roots = np.arange(n_roots, dtype=np.int64)
    targets = np.arange(1000, 1000 + deg, dtype=np.int64)
    df = pd.DataFrame(
        {"src": np.repeat(roots, deg), "dst": np.tile(targets, n_roots)}
    )
    ds = ray.data.from_pandas(df).repartition(4)
    out = to_pandas_typed(khop_neighbors(ds, roots, [fanout], mode="uniform", rng_seed=11))
    assert len(out) == n_roots * fanout
    freq = out.groupby("dst").size().reindex(targets, fill_value=0).to_numpy() / n_roots
    expected = fanout / deg  # 0.25
    # binomial(300, .25) std ~= 0.025 per neighbor; 5-sigma band
    assert np.all(np.abs(freq - expected) < 0.125), freq.tolist()
    # and the aggregate squared deviation is near its expectation
    assert float(((freq - expected) ** 2).sum()) < 0.03
