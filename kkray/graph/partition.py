"""Degree-aware contiguous range partitioning.

Reimplements the reference's workload-balanced vertex ranges
(reference include/graph.hpp:461-503): contiguous vertex ranges sized so each
partition carries ~equal Σ(5 + out_degree) workload units; the per-vertex
constant 5 models fixed per-vertex cost, the degree term per-edge cost.
This is the skew-handling knob (SURVEY.md §4): hub-heavy prefixes get
narrower vertex ranges.

The partition id of a vertex is a searchsorted against the boundary array —
the Ray-native replacement for the reference's replicated
``vertex_partition_id[]`` lookup (reference include/graph.hpp:649).
"""
from __future__ import annotations

import numpy as np

VERTEX_UNIT_COST = 5  # reference include/graph.hpp:463 uses the same constant


def degree_aware_boundaries(out_degree: np.ndarray, num_parts: int) -> np.ndarray:
    """Boundary array b of length P+1, b[0]=0, b[P]=V; partition p owns
    vertices [b[p], b[p+1]). Split points chosen so cumulative
    Σ(5+deg) workload is ~equal per partition."""
    v_num = len(out_degree)
    num_parts = max(1, min(num_parts, max(1, v_num)))
    work = out_degree.astype(np.int64) + VERTEX_UNIT_COST
    cum = np.cumsum(work)
    total = cum[-1] if v_num else 0
    targets = (np.arange(1, num_parts, dtype=np.float64) * total / num_parts)
    cuts = np.searchsorted(cum, targets, side="left") + 1
    b = np.concatenate([[0], cuts, [v_num]]).astype(np.int64)
    return np.maximum.accumulate(b)  # guard monotonicity under extreme skew


def part_of(vids: np.ndarray, boundaries: np.ndarray) -> np.ndarray:
    """Vectorized vertex -> partition id."""
    return np.searchsorted(boundaries, np.asarray(vids, dtype=np.int64), side="right") - 1
