"""Triangle counting: degree-ordered orientation + distributed wedge join
(SURVEY.md §2.7 / §7.4 'Triangle counting at skew').

Input must be the undirected expansion (both directions present).
Orientation by the lexicographic (degree, id) total order caps oriented
out-degree at O(sqrt(E)) — hub adjacencies are *consumed* (queried
against) rather than expanded, which is the skew handling. Neighbour
degrees come from a distributed degree join (``tri_deg_requests`` buckets
unique out-neighbours by owner, ``tri_deg_lookup`` answers O(query), the
responses are ref-routed shard-to-shard) — no dense O(V) structure is
built anywhere, driver included. Wedges stream in bounded chunks with a
sliding ``ray.wait`` window so a hub-heavy shard never materializes its
O(Σdeg²) wedge set.

Each ordered triangle (r(u)<r(v)<r(w)) is counted exactly once: as the
wedge (v,w) generated at u and probed at part(v).
"""
from __future__ import annotations

import numpy as np
import ray


def _tri_orient(graph) -> list[int]:
    """Distributed degree-join orientation + per-shard wedge totals: shards
    request neighbour degrees from owners (ref-routed, O(unique dst) per
    shard) — no dense O(V) rank array is built anywhere, driver included."""
    actors = graph.actors
    P = graph.num_parts
    if P == 1:
        # single shard owns every vertex: skip the exchange entirely
        # (num_returns=1 would leave the packed 1-tuples unsplit)
        ray.get(actors[0].tri_build_local.remote())
    else:
        reqs = [a.tri_deg_requests.options(num_returns=P).remote() for a in actors]
        resp = [
            actors[p].tri_deg_lookup.options(num_returns=P).remote(*[reqs[q][p] for q in range(P)])
            for p in range(P)
        ]
        ray.get([actors[q].tri_build.remote(*[resp[p][q] for p in range(P)]) for q in range(P)])
    return ray.get([a.tri_total_pairs.remote() for a in actors])


def triangle_count(graph, chunk_pairs: int = 1 << 22, max_inflight: int | None = None) -> int:
    """Streamed wedge join: each shard enumerates its wedges in chunks of
    at most ``chunk_pairs`` pair indices (bounded memory even on hub-heavy
    shards), and probe counts are drained with a sliding ray.wait window so
    wedge blocks are freed as soon as they're counted."""
    actors = graph.actors
    P = graph.num_parts
    totals = _tri_orient(graph)
    if max_inflight is None:
        max_inflight = 8 * P
    total_tri = 0
    inflight: list = []
    # round-robin the shards so no single shard's chunk train serializes
    cursors = [0] * P
    while True:
        progressed = False
        for q in range(P):
            if cursors[q] >= totals[q]:
                continue
            lo = cursors[q]
            hi = min(lo + chunk_pairs, totals[q])
            cursors[q] = hi
            if P == 1:
                w = actors[q].tri_wedges_chunk.remote(lo, hi)
                inflight.append(actors[0].tri_count_packed.remote(w))
            else:
                w = actors[q].tri_wedges_chunk.options(num_returns=P).remote(lo, hi)
                inflight.extend(actors[p].tri_count.remote(w[p]) for p in range(P))
            progressed = True
            while len(inflight) > max_inflight:
                done, inflight = ray.wait(inflight, num_returns=len(inflight) - max_inflight)
                total_tri += int(sum(ray.get(done)))
        if not progressed:
            break
    total_tri += int(sum(ray.get(inflight)))
    return total_tri


def local_triangle_counts(
    graph, chunk_pairs: int = 1 << 22, max_inflight: int | None = None
) -> np.ndarray:
    """Per-vertex triangle participation counts (the numerator of the local
    clustering coefficient) over the undirected simple expansion.

    Same streamed oriented wedge join as triangle_count, but chunks carry
    the wedge apex u so the probe side credits all three corners of every
    matched triangle; increments accumulate SPARSELY shard-side and are
    owner-routed once at the end of the stream (tri_vc_route /
    tri_vc_gather) — never a dense O(V) structure mid-stream. The returned
    dense vector is driver-side result delivery only (same contract as
    pagerank())."""
    actors = graph.actors
    P = graph.num_parts
    totals = _tri_orient(graph)
    if max_inflight is None:
        max_inflight = 8 * P
    inflight: list = []
    cursors = [0] * P
    while True:
        progressed = False
        for q in range(P):
            if cursors[q] >= totals[q]:
                continue
            lo = cursors[q]
            hi = min(lo + chunk_pairs, totals[q])
            cursors[q] = hi
            if P == 1:
                w = actors[q].tri_wedges_chunk_u.remote(lo, hi)
                inflight.append(actors[0].tri_count_attr_packed.remote(w))
            else:
                w = actors[q].tri_wedges_chunk_u.options(num_returns=P).remote(lo, hi)
                inflight.extend(actors[p].tri_count_attr.remote(w[p]) for p in range(P))
            progressed = True
            while len(inflight) > max_inflight:
                done, inflight = ray.wait(inflight, num_returns=len(inflight) - max_inflight)
                ray.get(done)
        if not progressed:
            break
    ray.get(inflight)  # stream fully drained before the flush
    if P == 1:
        route = actors[0].tri_vc_route.remote()
        dense = [ray.get(actors[0].tri_vc_gather_packed.remote(route))]
    else:
        routes = [a.tri_vc_route.options(num_returns=P).remote() for a in actors]
        dense = ray.get(
            [actors[p].tri_vc_gather.remote(*[routes[q][p] for q in range(P)]) for p in range(P)]
        )
    return np.concatenate(dense)


def degree_assortativity(graph) -> float:
    """Degree assortativity coefficient (Newman 2002): Pearson correlation
    of (deg(u), deg(v)) over the directed edges of the undirected
    expansion. Neighbour degrees come from the same owner-routed join as
    the triangle orientation; each shard returns six exact integer moment
    partials, the driver folds them in unbounded python ints, and the
    final quotient is one float division — so the engine and a SQL oracle
    agree bit-for-bit before rounding."""
    import math

    actors = graph.actors
    P = graph.num_parts
    if P == 1:
        parts = [ray.get(actors[0].assort_partials_local.remote())]
    else:
        reqs = [a.tri_deg_requests.options(num_returns=P).remote() for a in actors]
        resp = [
            actors[p].tri_deg_lookup.options(num_returns=P).remote(*[reqs[q][p] for q in range(P)])
            for p in range(P)
        ]
        parts = ray.get(
            [actors[q].assort_partials.remote(*[resp[p][q] for p in range(P)]) for q in range(P)]
        )
    n, sx, sy, sxy, sx2, sy2 = (sum(p[i] for p in parts) for i in range(6))
    d1 = n * sx2 - sx * sx
    d2 = n * sy2 - sy * sy
    if n == 0 or d1 <= 0 or d2 <= 0:
        return float("nan")  # degree-regular (or empty) graph: undefined
    return float(n * sxy - sx * sy) / math.sqrt(float(d1 * d2))


def local_clustering(graph, chunk_pairs: int = 1 << 22, max_inflight: int | None = None):
    """(per-vertex triangle counts, local clustering coefficients) over the
    undirected simple expansion: cc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)),
    0 where deg < 2."""
    tri = local_triangle_counts(graph, chunk_pairs=chunk_pairs, max_inflight=max_inflight)
    deg = graph.out_degrees()
    denom = deg * (deg - 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        cc = np.where(denom > 0, 2.0 * tri / denom, 0.0)
    return tri, cc
