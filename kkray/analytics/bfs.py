"""BFS hop distances (single-source, unweighted) — frontier min-propagation.

Same delta-frontier superstep shape as connected components: only vertices
whose distance improved last superstep send ``dist+1`` along their
out-edges; the sender-side segment-min combiner (reduceat over the
dst-sorted routing slices) keeps the exchange at O(unique dst) per
partition pair, and the frontier — hence the message volume — is one BFS
level per superstep. Terminates when the global changed-count Allreduce is
zero (reference include/graph.hpp:915-917 convergence shape).
"""
from __future__ import annotations

import time

import numpy as np
import ray

from ..ckpt import CheckpointManager

_I64MAX = np.iinfo(np.int64).max


def bfs_distances(
    graph,
    source: int,
    max_iters: int = 10_000,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> np.ndarray:
    """Hop distance from ``source`` along out-edges; unreachable -> -1.
    ``max_iters`` doubles as a distance cap: after K supersteps every
    distance <= K is exact and anything further reports -1 (the SQL
    oracle uses the same cap in its recursive CTE)."""
    actors = graph.actors
    P = graph.num_parts
    if len(graph.hub_vids):
        raise ValueError("bfs_distances: needs full adjacency — build without split_threshold")
    start = 0
    if resume and checkpoint is not None and (last := checkpoint.latest_complete()) is not None:
        parts, _ = checkpoint.load(last)
        ray.get([a.bfs_set.remote(arr) for a, (_, arr) in zip(actors, parts)])
        start = last + 1
    else:
        ray.get([a.bfs_init.remote(int(source)) for a in actors])
    for it in range(start, max_iters):
        t0 = time.perf_counter()
        if P == 1:
            total = int(ray.get(actors[0].bfs_gather_packed.remote(actors[0].bfs_scatter.remote())))
        else:
            scat = [a.bfs_scatter.options(num_returns=P).remote() for a in actors]
            total = int(
                sum(
                    ray.get(
                        [actors[p].bfs_gather.remote(*[scat[q][p] for q in range(P)]) for p in range(P)]
                    )
                )
            )
        if checkpoint is not None and (it % checkpoint_every == 0 or total == 0):
            parts = ray.get([a.bfs_get.remote() for a in actors])
            checkpoint.save(
                it,
                parts,
                metrics={"changed": total, "superstep_sec": time.perf_counter() - t0},
                lineage={"op": "bfs", "source": int(source), "iter": it, "num_parts": P},
            )
        if total == 0:
            break
    dist = graph.gather_vertex_array("bfs_get")
    dist[dist == _I64MAX] = -1
    return dist
