"""Connected components: min-label propagation to fixpoint (SURVEY.md §2.7).

Weak components on a directed input: run on the undirected expansion
(builder callers pass edges through ``kkray.io.edges.undirect`` first).
Message = candidate label; sender-side segment-min combiner keeps the
exchange at O(unique dst) per partition pair. Terminates when the global
changed-count Allreduce (scalar sum of per-shard returns) is zero —
the same convergence test as the reference's active-walker count
(reference include/graph.hpp:915-917).
"""
from __future__ import annotations

import time

import numpy as np
import ray

from ..ckpt import CheckpointManager


def connected_components(
    graph,
    max_iters: int = 10_000,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    as_dataset: bool = False,
):
    """Returns label vector: label[v] = min vertex id of v's component.
    With as_dataset=True, returns a streaming Dataset (vertex, label)
    built from per-shard arrow refs instead of a driver-side array."""
    actors = graph.actors
    P = graph.num_parts
    start_iter = 0
    if resume and checkpoint is not None and (last := checkpoint.latest_complete()) is not None:
        parts, _ = checkpoint.load(last)
        ray.get([a.cc_set.remote(arr) for a, (_, arr) in zip(actors, parts)])
        start_iter = last + 1
    else:
        ray.get([a.cc_init.remote() for a in actors])

    for it in range(start_iter, max_iters):
        t0 = time.perf_counter()
        hub = graph.hub_value_array("label")
        href = ray.put(hub) if hub is not None else None
        if P == 1:
            # num_returns=1 leaves the scatter's 1-tuple packed in one ref
            a0 = actors[0]
            changed = [ray.get(a0.cc_gather_packed.remote(a0.cc_scatter.remote(href)))]
        else:
            scat = [a.cc_scatter.options(num_returns=P).remote(href) for a in actors]
            changed = ray.get(
                [actors[p].cc_gather.remote(*[scat[q][p] for q in range(P)]) for p in range(P)]
            )
        total_changed = int(sum(changed))
        if checkpoint is not None and (it % checkpoint_every == 0 or total_changed == 0):
            parts = ray.get([a.cc_get.remote() for a in actors])
            checkpoint.save(
                it,
                parts,
                metrics={"changed": total_changed, "superstep_sec": time.perf_counter() - t0},
                lineage={"op": "cc", "iter": it, "num_parts": P},
            )
        if total_changed == 0:
            break
    if as_dataset:
        return graph.vertex_dataset("cc_get", "label")
    return graph.gather_vertex_array("cc_get")
