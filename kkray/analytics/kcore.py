"""k-core membership — distributed synchronous peeling.

Run on the undirected expansion (like cc/triangles: both directions
present, so out-degree == degree). Each round simultaneously removes every
alive vertex with residual degree < k and routes per-dst decrement counts
(segment sums over the removed sources only — message volume is
O(unique dst of this round's removals), which shrinks to nothing as the
peel converges). Terminates when the global removed-count Allreduce is
zero. Synchronous rounds make the result SQL-comparable: round i of the
oracle's unrolled CTE keeps exactly {v : deg within keep_{i-1} >= k}.
"""
from __future__ import annotations

import time

import numpy as np
import ray

from ..ckpt import CheckpointManager


def kcore(
    graph,
    k: int,
    max_rounds: int = 10_000,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    return_rounds: bool = False,
) -> np.ndarray:
    """Returns int64 0/1 membership: 1 iff the vertex survives k-core
    peeling at threshold ``k`` (the maximal subgraph where every vertex
    has degree >= k within the subgraph). With return_rounds=True returns
    (membership, rounds) where rounds is the number of synchronous peel
    rounds actually executed (callers comparing against an unrolled SQL
    oracle assert rounds <= the unroll count)."""
    actors = graph.actors
    P = graph.num_parts
    if len(graph.hub_vids):
        raise ValueError("kcore: needs full adjacency — build without split_threshold")
    start = 0
    if resume and checkpoint is not None and (last := checkpoint.latest_complete()) is not None:
        parts, manifest = checkpoint.load_tables(last)
        ray.get(
            [
                a.kcore_set.remote(
                    t["alive"].column("value").to_numpy(), t["deg"].column("value").to_numpy(), int(k)
                )
                for a, t in zip(actors, parts)
            ]
        )
        start = last + 1
    else:
        ray.get([a.kcore_init.remote(int(k)) for a in actors])
    for it in range(start, max_rounds):
        t0 = time.perf_counter()
        # always P+1 returns (decrement partials + local removed count) —
        # safe at num_parts == 1 too
        scat = [a.kcore_scatter.options(num_returns=P + 1).remote() for a in actors]
        removed = int(sum(ray.get([scat[q][P] for q in range(P)])))
        if removed:
            ray.get(
                [actors[p].kcore_gather.remote(*[scat[q][p] for q in range(P)]) for p in range(P)]
            )
        if checkpoint is not None and (it % checkpoint_every == 0 or removed == 0):
            import pyarrow as pa

            parts = ray.get([a.kcore_get.remote() for a in actors])
            degs = ray.get([a.kc_deg_get.remote() for a in actors])
            tabs = [
                {
                    "alive": pa.table({"vid": np.arange(lo, lo + len(av)), "value": av}),
                    "deg": pa.table({"vid": np.arange(lo2, lo2 + len(dv)), "value": dv}),
                }
                for (lo, av), (lo2, dv) in zip(parts, degs)
            ]
            checkpoint.save_tables(
                it,
                tabs,
                metrics={"removed": removed, "superstep_sec": time.perf_counter() - t0},
                lineage={"op": "kcore", "k": int(k), "iter": it, "num_parts": P},
            )
        if removed == 0:
            break
    member = graph.gather_vertex_array("kcore_get")
    if return_rounds:
        return member, it + 1
    return member
