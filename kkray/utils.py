"""Shared utilities: counter-based RNG, stable hashing.

The reference engine seeds per-thread mt19937 from ``std::random_device``
(reference: include/util.hpp:45-70) and is intentionally non-reproducible.
We instead use counter-based Philox streams keyed by
``(seed, partition, superstep[, salt])`` so that tests are deterministic and
checkpoint-resume replays identically (SURVEY.md §7.4).
"""
from __future__ import annotations

import numpy as np

U64 = np.uint64
MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def rng_for(seed: int, *counters: int) -> np.random.Generator:
    """Deterministic Generator keyed by (seed, *counters).

    Same key -> same stream, independent of execution order; this is what
    makes a resumed run replay the exact walk a fresh run would take.
    """
    return np.random.Generator(np.random.Philox(key=np.uint64(seed), counter=list(counters) + [0] * (4 - len(counters))))


def sort2(primary: np.ndarray, secondary: np.ndarray) -> np.ndarray:
    """argsort by (primary asc, secondary asc) — ONE composite-uint64-key
    radix argsort when both columns fit 32 bits (~4-5x faster than
    np.lexsort on multi-million-row arrays; the CSR build's fast path
    generalized), np.lexsort fallback otherwise. Non-negative ints only."""
    if (
        len(primary)
        and int(primary.max(initial=0)) < (1 << 31)
        and int(secondary.max(initial=0)) < (1 << 31)
        and int(primary.min(initial=0)) >= 0
        and int(secondary.min(initial=0)) >= 0
    ):
        key = (primary.astype(np.uint64) << np.uint64(32)) | secondary.astype(np.uint64)
        return np.argsort(key, kind="stable")
    return np.lexsort((secondary, primary))


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — stable 64-bit mixing for
    hash-partitioning and salting (pure numpy, overflow-wrapping)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & MASK64
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & MASK64
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & MASK64
        x = x ^ (x >> np.uint64(31))
    return x


def hash_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Stable 64-bit hash of a pair of uint64 columns (for (src,dst) dedup
    keys and bucketed shuffles)."""
    with np.errstate(over="ignore"):
        return splitmix64(splitmix64(a.astype(np.uint64)) ^ (b.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)))
