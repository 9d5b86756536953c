"""Custom transition/UDF surface — mirrors the reference's example apps
(src/examples/simple_walk.cpp, dynamic_walk.cpp, SURVEY.md §2.4 A5) and the
exact state-machine replay technique (test_walker.cpp:53-73, 210-230:
rolling-hash state updated per step must equal a recompute from the paths).
"""
import numpy as np
import ray

from kkray.graph import Graph
from kkray.walk.engine import paths_to_numpy, random_walk
from kkray.walk.spec import TransitionSpec, WalkerSpec

from graphgen import random_edges


def test_simple_constant_extension_walk(ray_session):
    """simple_walk example: extension = 0.5 every step -> geometric len."""
    v, e = 40, 400
    src, dst = random_edges(v, e, seed=3, undirected=True)

    def ext(step, cur):
        return np.full(len(step), 0.5)

    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        paths = paths_to_numpy(
            random_walk(
                g,
                WalkerSpec(4000, "equal"),
                TransitionSpec(kind="custom", length=1 << 20, extension_fn=ext),
                seed=5,
            )
        )
    lens = np.array([len(p) - 1 for p in paths.values()])
    assert abs(lens.mean() - 1.0) < 0.12  # geometric(0.5): mean 1 step


def test_dynamic_double_return_edge(ray_session):
    """dynamic_walk example (dynamic_walk.cpp:28-96): the edge back to the
    previous vertex gets double weight; ub=2, lb=1."""
    v, e = 20, 120
    src, dst = random_edges(v, e, seed=7, undirected=True)
    nbrs = {}
    for a, b in zip(src, dst):
        nbrs.setdefault(int(a), set()).add(int(b))

    def dyn(step, cur, cand, prev, wstate):
        return np.where(cand == prev, 2.0, 1.0)

    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        paths = paths_to_numpy(
            random_walk(
                g,
                WalkerSpec(20000, "equal"),
                TransitionSpec(
                    kind="custom", length=6, dynamic_fn=dyn, dynamic_ub=2.0, dynamic_lb=1.0, track_prev=True
                ),
                seed=9,
            )
        )
    # empirical P(next | prev, cur) must up-weight the return edge 2x
    counts = {}
    for p in paths.values():
        for i in range(len(p) - 2):
            key = (int(p[i]), int(p[i + 1]))
            counts.setdefault(key, {}).setdefault(int(p[i + 2]), 0)
            counts[key][int(p[i + 2])] += 1
    checked = 0
    for (u, vv), nxt in counts.items():
        n = sum(nxt.values())
        if n < 150:
            continue
        weights = {x: (2.0 if x == u else 1.0) for x in nbrs[vv]}
        tot = sum(weights.values())
        k = len(weights)
        tol = max(0.1, 3.0 * np.sqrt(2 * k / (np.pi * n)))
        l1 = sum(abs(nxt.get(x, 0) / n - w / tot) for x, w in weights.items())
        assert l1 < tol, f"state ({u},{vv}): L1={l1:.3f} tol={tol:.3f}"
        checked += 1
    assert checked >= 3


def test_state_hook_hash_replay(ray_session):
    """Exact state-machine replay: wstate carries a rolling hash updated
    once per accepted step; the terminal hash must equal a recompute from
    the collected path (proves init/update hooks fire exactly once per
    step with the right arguments, reference test_walker.cpp:210-230)."""
    v, e = 60, 500
    src, dst = random_edges(v, e, seed=13, undirected=True)
    M = np.int64(1_000_003)
    MOD = np.int64(1) << np.int64(40)

    def init(wid, start):
        return (wid * 7 + start) % MOD

    def update(ws, step, cur, cand):
        with np.errstate(over="ignore"):
            return (ws * M + cand * (step + 1)) % MOD

    with Graph.from_arrays(src, dst, num_parts=4, v_num=v) as g:
        ds = random_walk(
            g,
            WalkerSpec(300, "equal"),
            TransitionSpec(kind="custom", length=9, state_init_fn=init, state_update_fn=update),
            seed=17,
            return_dataset=True,
        )
        fp = ds.to_pandas()
        finals = ray.get([a.walk_final_states.remote() for a in g.actors])
    wids = np.concatenate([f[0] for f in finals])
    states = np.concatenate([f[2] for f in finals])
    got = dict(zip(wids.tolist(), states.tolist()))
    assert len(got) == 300  # every walker terminated exactly once
    for wid, grp in fp.groupby("walker_id"):
        path = grp.sort_values("step")["vertex"].to_numpy()
        ws = np.int64((wid * 7 + path[0]) % MOD)
        for i in range(1, len(path)):
            with np.errstate(over="ignore"):
                ws = (ws * M + np.int64(path[i]) * np.int64(i)) % MOD
        assert got[int(wid)] == int(ws), f"walker {wid}"


def test_per_vertex_bound_arrays(ray_session):
    """dynamic_ub/lb as callables (vids, outdeg) -> per-vertex arrays
    (reference dcomp bound arrays, walk.hpp:499-536). A constant-valued
    callable must replay bit-identically to the scalar bound; a genuinely
    per-vertex bound must still enforce the dynamic component exactly."""
    v, e = 30, 260
    src, dst = random_edges(v, e, seed=8, undirected=True)
    # guarantee every vertex keeps a legal (non-zero-dynamic) move so no
    # walker lands in an absorbing all-rejected state (a zero-everywhere
    # dynamic loops forever, exactly like the reference's retry loop)
    ring_s = np.arange(v, dtype=np.int64)
    ring_d = (ring_s + 1) % v
    src = np.concatenate([src, ring_s, ring_d])
    dst = np.concatenate([dst, ring_d, ring_s])

    def dyn(step, cur, cand, prev, wstate):
        # forbid ring-backward moves; ring-forward always stays legal
        return np.where((cand + 1) % v == cur, 0.0, 1.5)

    # constant callable == scalar: bit-identical replay
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        a = paths_to_numpy(
            random_walk(
                g,
                WalkerSpec(300, "equal"),
                TransitionSpec(kind="custom", length=6, dynamic_fn=dyn, dynamic_ub=1.5),
                seed=9,
            )
        )
        b = paths_to_numpy(
            random_walk(
                g,
                WalkerSpec(300, "equal"),
                TransitionSpec(
                    kind="custom",
                    length=6,
                    dynamic_fn=dyn,
                    dynamic_ub=lambda vids, deg: np.full(len(vids), 1.5),
                ),
                seed=9,
            )
        )
    assert set(a) == set(b)
    assert all(np.array_equal(a[k], b[k]) for k in a)

    # per-vertex ub (varies by degree) still yields only legal transitions
    with Graph.from_arrays(src, dst, num_parts=3, v_num=v) as g:
        c = paths_to_numpy(
            random_walk(
                g,
                WalkerSpec(500, "equal"),
                TransitionSpec(
                    kind="custom",
                    length=8,
                    dynamic_fn=dyn,
                    dynamic_ub=lambda vids, deg: np.full(len(vids), 1.5) + (deg % 3) * 0.5,
                    dynamic_lb=lambda vids, deg: np.zeros(len(vids)),
                ),
                seed=11,
            )
        )
    for p in c.values():
        assert all((p[i + 1] + 1) % v != p[i] for i in range(len(p) - 1)), p
