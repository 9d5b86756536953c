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


def triangle_count(graph) -> int:
    actors = graph.actors
    P = graph.num_parts
    deg = graph.out_degrees()  # undirected degree (graph built on expansion)
    order = np.lexsort((np.arange(graph.v_num), deg))
    rank = np.empty(graph.v_num, dtype=np.int64)
    rank[order] = np.arange(graph.v_num)
    rank_ref = ray.put(rank)
    ray.get([a.tri_build.remote(rank_ref) for a in actors])
    wedges = [a.tri_wedges.options(num_returns=P).remote() for a in actors]
    counts = ray.get(
        [actors[p].tri_count.remote(*[wedges[q][p] for q in range(P)]) for p in range(P)]
    )
    return int(sum(counts))
