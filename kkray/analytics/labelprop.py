"""Synchronous label propagation (SURVEY.md §2.7).

Semantics (frozen, matched by the unrolled SQL oracle in __ray_entry__):
labels start as vertex ids; each iteration, every vertex with >=1
in-neighbour adopts the most frequent in-neighbour label from the
*previous* iteration, ties broken by smallest label; isolated vertices keep
their label. Fixed iteration count (synchronous LP need not converge —
it can 2-cycle — so the operator is defined by its iteration count).

Exchange: sparse (dst,label,count) triples, pre-counted sender-side
(the partial-aggregation pattern: groupby(dst,label).count folded into the
scatter, SURVEY.md §2.7 'Label propagation').
"""
from __future__ import annotations

import time

import ray

from ..ckpt import CheckpointManager


def label_propagation(
    graph,
    iters: int = 5,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    as_dataset: bool = False,
):
    actors = graph.actors
    P = graph.num_parts
    start_iter = 0
    if resume and checkpoint is not None and (last := checkpoint.latest_complete()) is not None:
        parts, _ = checkpoint.load(last)
        ray.get([a.lp_set.remote(arr) for a, (_, arr) in zip(actors, parts)])
        start_iter = last + 1
    else:
        ray.get([a.lp_init.remote() for a in actors])

    for it in range(start_iter, iters):
        t0 = time.perf_counter()
        hub = graph.hub_value_array("label")
        href = ray.put(hub) if hub is not None else None
        if P == 1:
            # num_returns=1 leaves the scatter's 1-tuple packed in one ref
            a0 = actors[0]
            changed = [ray.get(a0.lp_gather_packed.remote(a0.lp_scatter.remote(href)))]
        else:
            # broadcast bundles: ONE target-major object per sender per
            # superstep (O(P) driver-mediated refs, not O(P^2)) with
            # 32-bit ids where the graph allows — the walk mesh's r5
            # transport applied to LP's (dst,label,count) exchange
            bundles = [a.lp_scatter_bundle.remote(href) for a in actors]
            changed = ray.get(
                [actors[p].lp_gather_bundles.remote(p, *bundles) for p in range(P)]
            )
        if checkpoint is not None and it % checkpoint_every == 0:
            parts = ray.get([a.lp_get.remote() for a in actors])
            checkpoint.save(
                it,
                parts,
                metrics={"changed": int(sum(changed)), "superstep_sec": time.perf_counter() - t0},
                lineage={"op": "label_propagation", "iter": it, "num_parts": P},
            )
    if as_dataset:
        return graph.vertex_dataset("lp_get", "label")
    return graph.gather_vertex_array("lp_get")
