"""Single-source shortest paths (weighted, synchronous Bellman-Ford).

Same delta-frontier superstep shape as BFS (only vertices whose cost
improved last round relax their out-edges; sender-side segment-min
combiner keeps the exchange at O(unique dst) per partition pair), with the
relaxation message ``dist[u] + w(u, v)`` over the routed weight array.
Synchronous rounds make the result SQL-comparable: after K rounds every
vertex holds the min cost over paths of <= K edges, exactly the unrolled
oracle CTE — and once a round changes nothing the fixpoint is reached, so
early exit at changed == 0 equals the full K-round result (reference
convergence shape include/graph.hpp:915-917).
"""
from __future__ import annotations

import time

import numpy as np
import ray

from ..ckpt import CheckpointManager


def sssp(
    graph,
    source: int,
    max_iters: int = 10_000,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> np.ndarray:
    """Min path cost from ``source`` along out-edges (positive weights);
    unreachable -> inf. ``max_iters`` bounds the hop count: the result is
    exact for every shortest path of <= max_iters edges (the SQL oracle
    unrolls the same number of relaxation rounds)."""
    actors = graph.actors
    P = graph.num_parts
    start = 0
    if resume and checkpoint is not None and (last := checkpoint.latest_complete()) is not None:
        parts, _ = checkpoint.load(last)
        ray.get([a.sssp_set.remote(arr) for a, (_, arr) in zip(actors, parts)])
        start = last + 1
    else:
        ray.get([a.sssp_init.remote(int(source)) for a in actors])
    for it in range(start, max_iters):
        t0 = time.perf_counter()
        if P == 1:
            total = int(ray.get(actors[0].sssp_gather_packed.remote(actors[0].sssp_scatter.remote())))
        else:
            scat = [a.sssp_scatter.options(num_returns=P).remote() for a in actors]
            total = int(
                sum(
                    ray.get(
                        [actors[p].sssp_gather.remote(*[scat[q][p] for q in range(P)]) for p in range(P)]
                    )
                )
            )
        if checkpoint is not None and (it % checkpoint_every == 0 or total == 0):
            parts = ray.get([a.sssp_get.remote() for a in actors])
            checkpoint.save(
                it,
                parts,
                metrics={"changed": total, "superstep_sec": time.perf_counter() - t0},
                lineage={"op": "sssp", "source": int(source), "iter": it, "num_parts": P},
            )
        if total == 0:
            break
    return graph.gather_vertex_array("sssp_get")
