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


def sampled_boundaries(
    src_sample: np.ndarray, e_num: int, v_num: int, num_parts: int
) -> np.ndarray:
    """Boundary array from a uniform EDGE sample of the src column — the
    >100M-vertex path where the dense degree vector never materializes.

    The workload model matches degree_aware_boundaries: g(b) = 5*b +
    E*F(b), with F the empirical CDF of sampled src values standing in for
    the cumulative out-degree. g is monotone, so each cut is a binary
    search; error is O(E/sqrt(sample)) per cut, amortized away by the
    streaming executor's block-level balancing."""
    v_num = int(v_num)
    num_parts = max(1, min(num_parts, max(1, v_num)))
    s = np.sort(np.asarray(src_sample, dtype=np.int64))
    n = max(1, len(s))
    total = float(VERTEX_UNIT_COST) * v_num + float(e_num)

    def g(b: int) -> float:
        return VERTEX_UNIT_COST * b + e_num * (np.searchsorted(s, b, side="left") / n)

    cuts = [0]
    for p in range(1, num_parts):
        t = p * total / num_parts
        lo, hi = cuts[-1], v_num
        while lo < hi:
            mid = (lo + hi) // 2
            if g(mid) < t:
                lo = mid + 1
            else:
                hi = mid
        cuts.append(lo)
    cuts.append(v_num)
    return np.maximum.accumulate(np.asarray(cuts, dtype=np.int64))


def part_of(vids: np.ndarray, boundaries: np.ndarray) -> np.ndarray:
    """Vectorized vertex -> partition id."""
    return np.searchsorted(boundaries, np.asarray(vids, dtype=np.int64), side="right") - 1
