"""Triangle counting: degree-ordered orientation + distributed wedge join
(SURVEY.md §2.7 / §7.4 'Triangle counting at skew').

Input must be the undirected expansion (both directions present).
Orientation by dense (degree, id) rank caps oriented out-degree at
O(sqrt(E)) — hub adjacencies are *consumed* (queried against) rather than
expanded, which is the skew handling. The (deg,id) rank array is broadcast
once via ``ray.put`` (sandbox path — fine to ~10^9 vertices; beyond that
the orientation becomes a degree join, documented in SURVEY §7.4).

Each ordered triangle (r(u)<r(v)<r(w)) is counted exactly once: as the
wedge (v,w) generated at u and probed at part(v).
"""
from __future__ import annotations

import numpy as np
import ray


def triangle_count(graph, chunk_pairs: int = 1 << 22, max_inflight: int | None = None) -> int:
    """Streamed wedge join: each shard enumerates its wedges in chunks of
    at most ``chunk_pairs`` pair indices (bounded memory even on hub-heavy
    shards), and probe counts are drained with a sliding ray.wait window so
    wedge blocks are freed as soon as they're counted."""
    actors = graph.actors
    P = graph.num_parts
    # distributed degree-join orientation: shards request neighbour
    # degrees from owners (ref-routed, O(unique dst) per shard) — no
    # dense O(V) rank array is built anywhere, driver included
    reqs = [a.tri_deg_requests.options(num_returns=P).remote() for a in actors]
    if P == 1:
        reqs = [[r] for r in reqs]
    resp = [
        actors[p].tri_deg_lookup.options(num_returns=P).remote(*[reqs[q][p] for q in range(P)])
        for p in range(P)
    ]
    if P == 1:
        resp = [[r] for r in resp]
    ray.get([actors[q].tri_build.remote(*[resp[p][q] for p in range(P)]) for q in range(P)])
    totals = ray.get([a.tri_total_pairs.remote() for a in actors])
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
