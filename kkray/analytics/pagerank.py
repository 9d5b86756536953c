"""PageRank as gather-scatter supersteps over the shard pool (SURVEY.md §2.7).

Each superstep is one round of the reference's ``distributed_execute``
pattern (reference include/graph.hpp:704-918) re-expressed Ray-natively:
scatter returns P+1 object refs per shard (``num_returns``), the driver
routes *refs* (never arrays) to the gather calls, and the global dangling
mass / convergence delta are tiny scalar reductions — the Allreduce
analogue (reference include/graph.hpp:915-917).

Semantics: rank' = (1-d)/N + d * (Σ_in rank/outdeg + dangling/N).
Converges to the same fixpoint as scipy power iteration (oracle in tests,
allclose 1e-6 per BASELINE.json).
"""
from __future__ import annotations

import time

import numpy as np
import ray

from ..ckpt import CheckpointManager


def pagerank(
    graph,
    damping: float = 0.85,
    max_iters: int = 50,
    tol: float | None = 1e-9,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    dtype: str = "float64",
    as_dataset: bool = False,
    weighted: bool = False,
    seeds: np.ndarray | None = None,
):
    """Returns the dense rank vector (sums to 1). Set tol=None for a fixed
    iteration count (the SQL-oracle-comparable mode).

    seeds: a SMALL vertex-id array for personalized (topic-sensitive)
    PageRank — teleport and dangling mass land uniformly on the seed set
    instead of 1/N everywhere. The list is broadcast once; each shard
    builds only its owned reset slice.

    weighted=True distributes each vertex's rank along its out-edges
    proportional to edge weight (w / Σ w_out) instead of 1/outdeg; the
    graph must be built with positive edge weights and without
    split_threshold (hub ghost slices carry no weights).

    dtype="float32" halves the DRAM traffic of the per-edge gather and the
    O(P*V) exchange (the sweep is memory-bandwidth-bound); accumulation
    stays float64, so per-vertex error is ~1e-7 relative — well inside the
    north rule's allclose(1e-6) envelope. The SQL-oracle contract queries
    keep float64."""
    actors = graph.actors
    P = graph.num_parts
    if seeds is not None:
        seeds = np.asarray(seeds, dtype=np.int64)
        if len(seeds) == 0:
            raise ValueError("personalized pagerank: seeds must be non-empty")
        bad = seeds[(seeds < 0) | (seeds >= graph.v_num)]
        if len(bad):
            raise ValueError(
                f"personalized pagerank: seed ids out of range [0, {graph.v_num}): "
                f"{bad[:5].tolist()}{'...' if len(bad) > 5 else ''}"
            )
    seeds_list = sorted(np.unique(seeds).tolist()) if seeds is not None else None
    start_iter = 0
    # pr_init ALWAYS runs first: it (re)builds the per-shard mode state
    # (_pr_weighted / _pr_wout / _pr_reset / _pr_dtype). On resume, pr_set
    # then overwrites the rank vector with the checkpointed values — a
    # resumed weighted/personalized run keeps its kernel.
    ray.get([a.pr_init.remote(None, dtype, weighted, seeds) for a in actors])
    if resume and checkpoint is not None:
        last = checkpoint.latest_complete()
        if last is not None:
            parts, meta = checkpoint.load(last)
            lin = (meta or {}).get("lineage", {}) if isinstance(meta, dict) else {}
            if lin:
                ck_w = bool(lin.get("weighted", False))
                ck_s = lin.get("seeds", None)
                if ck_w != bool(weighted) or ck_s != seeds_list:
                    raise ValueError(
                        "pagerank resume: checkpoint lineage mode "
                        f"(weighted={ck_w}, seeds={ck_s}) does not match the "
                        f"requested mode (weighted={bool(weighted)}, seeds={seeds_list})"
                    )
            ray.get([a.pr_set.remote(arr, dtype) for a, (_, arr) in zip(actors, parts)])
            start_iter = last + 1

    if tol is None and checkpoint is None and not len(graph.hub_vids) and max_iters > start_iter:
        # fixed-iteration fast path: submit EVERY superstep's scatters and
        # gathers up front — actor serial execution orders scatter_{k+1}
        # after gather_k on each shard, and gather_k waits on scatter_k's
        # refs, so the dataflow pipelines with no driver barrier in the
        # critical path (the driver only collects the final deltas).
        # One bundle object per sender (sparse-aware per-target entries):
        # minimal object count on one node; receivers read their entry
        # zero-copy from plasma.
        for _ in range(start_iter, max_iters):
            scat = [a.pr_scatter_bundle.remote(None) for a in actors]
            deltas = [a.pr_gather_bundle.remote(damping, *scat) for a in actors]
        ray.get(deltas)
        if as_dataset:
            return graph.vertex_dataset("pr_get", "pagerank")
        return graph.gather_vertex_array("pr_get")

    for it in range(start_iter, max_iters):
        t0 = time.perf_counter()
        hub = graph.hub_value_array("pr")
        href = ray.put(hub) if hub is not None else None
        scat = [a.pr_scatter.options(num_returns=P + 1).remote(href) for a in actors]
        # dangling refs flow straight into every gather (summed there) —
        # one driver barrier per superstep, not two
        deltas = ray.get(
            [
                actors[p].pr_gather.remote(
                    damping, *[scat[q][P] for q in range(P)], *[scat[q][p] for q in range(P)]
                )
                for p in range(P)
            ]
        )
        delta = float(sum(deltas))
        if checkpoint is not None and (it % checkpoint_every == 0 or (tol is not None and delta < tol) or it == max_iters - 1):
            parts = ray.get([a.pr_get.remote() for a in actors])
            checkpoint.save(
                it,
                parts,
                metrics={
                    "delta_l1": delta,
                    "superstep_sec": time.perf_counter() - t0,
                    "edges": graph.e_num,
                },
                lineage={
                    "op": "pagerank",
                    "damping": damping,
                    "iter": it,
                    "num_parts": P,
                    "weighted": bool(weighted),
                    "seeds": seeds_list,
                },
            )
        if tol is not None and delta < tol:
            break
    if as_dataset:
        return graph.vertex_dataset("pr_get", "pagerank")
    return graph.gather_vertex_array("pr_get")
