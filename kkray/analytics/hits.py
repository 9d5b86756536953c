"""HITS (hubs & authorities) — link-graph analytics beyond the reference's
inventory (same superstep machinery as PageRank, SURVEY.md §2.7 family).

Per iteration: ``auth = normalize2(Aᵀ·hub)`` then ``hub = normalize2(A·auth)``
(Kleinberg's power iteration, L2-normalized each half-step).

The auth half PUSHES hub mass along out-edges with the dst-sorted reduceat
combiner PageRank already uses (exchange volume O(unique dst) per partition
pair, density-adaptive sparse/dense). The hub half needs the out-neighbours'
*auth* values — a pull — expressed as a static distributed value join: each
shard's unique out-neighbour ids are bucketed by owner ONCE at init (the
triangle degree-join layout), and every iteration the owners answer O(query)
value lookups whose responses are ref-routed shard-to-shard. No dense O(V)
array exists anywhere, driver included; the driver only reduces the two
scalar Σx² normalization terms per iteration (the Allreduce analogue,
reference include/graph.hpp:915-917).
"""
from __future__ import annotations

import math
import time

import numpy as np
import ray

from ..ckpt import CheckpointManager


def hits(
    graph,
    iters: int = 5,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
):
    """Fixed-iteration HITS; returns (auth, hub) float64 vectors (each
    L2-normalized). Fixed iteration count keeps it SQL-oracle-comparable
    (the same unrolled-CTE contract as pagerank_10iter)."""
    actors = graph.actors
    P = graph.num_parts
    if len(graph.hub_vids):
        raise ValueError("hits: needs full adjacency — build without split_threshold")
    ray.get([a.hits_init.remote() for a in actors])
    start = 0
    if resume and checkpoint is not None and (last := checkpoint.latest_complete()) is not None:
        parts, _ = checkpoint.load_tables(last)
        ray.get(
            [
                a.hits_set.remote(
                    t["auth"].column("value").to_numpy(), t["hub"].column("value").to_numpy()
                )
                for a, t in zip(actors, parts)
            ]
        )
        start = last + 1
    # static join layout: fetched once, the same refs re-routed every iter
    reqs = [a.hits_requests.options(num_returns=P).remote() for a in actors] if P > 1 else None
    for it in range(start, iters):
        t0 = time.perf_counter()
        if P == 1:
            a0 = actors[0]
            ss = ray.get(a0.hits_gather_auth_packed.remote(a0.hits_scatter.remote()))
            ray.get(a0.hits_scale.remote("auth", math.sqrt(ss)))
            hs = ray.get(a0.hits_update_hub_local.remote())
        else:
            scat = [a.hits_scatter.options(num_returns=P).remote() for a in actors]
            ss = sum(
                ray.get(
                    [actors[p].hits_gather_auth.remote(*[scat[q][p] for q in range(P)]) for p in range(P)]
                )
            )
            anorm = math.sqrt(ss)
            ray.get([a.hits_scale.remote("auth", anorm) for a in actors])
            resp = [
                actors[p].hits_lookup_auth.options(num_returns=P).remote(*[reqs[q][p] for q in range(P)])
                for p in range(P)
            ]
            hs = sum(
                ray.get(
                    [actors[q].hits_update_hub.remote(*[resp[p][q] for p in range(P)]) for q in range(P)]
                )
            )
        hnorm = math.sqrt(hs)
        ray.get([a.hits_scale.remote("hub", hnorm) for a in actors])
        if checkpoint is not None and (it % checkpoint_every == 0 or it == iters - 1):
            import pyarrow as pa

            ap = ray.get([a.hits_get_auth.remote() for a in actors])
            hp = ray.get([a.hits_get_hub.remote() for a in actors])
            parts = [
                {
                    "auth": pa.table({"vid": np.arange(lo, lo + len(av)), "value": av}),
                    "hub": pa.table({"vid": np.arange(lo2, lo2 + len(hv)), "value": hv}),
                }
                for (lo, av), (lo2, hv) in zip(ap, hp)
            ]
            checkpoint.save_tables(
                it,
                parts,
                metrics={"auth_norm": anorm if P > 1 else math.sqrt(ss), "hub_norm": hnorm,
                         "superstep_sec": time.perf_counter() - t0},
                lineage={"op": "hits", "iter": it, "num_parts": P},
            )
    auth = graph.gather_vertex_array("hits_get_auth")
    hub = graph.gather_vertex_array("hits_get_hub")
    return auth, hub
