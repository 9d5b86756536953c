"""Per-partition CSR shard — numpy arrays, built once, read-only afterwards.

The Ray-native analogue of the reference's ``EdgeContainer`` counting-sort
CSR build (reference include/graph.hpp:309-330) plus the node2vec adjacency
sort (reference src/apps/node2vec.hpp:122-125): one ``np.lexsort`` gives both
src-major grouping and dst-sorted adjacency lists, enabling binary-search
neighbour-membership probes.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def build_u64_hash(keys: np.ndarray, load: float = 0.5) -> tuple[np.ndarray, int]:
    """Open-addressing (linear probe) table over unique uint64 keys, fully
    vectorized: sort keys by home slot, then slot_i = max(h_i, s_{i-1}+1)
    = i + running_max(h_i - i) (one argsort + one cumulative max). Probes
    never wrap: overshoot lands in a zero-filled tail. Key 0 is reserved
    as 'empty' — callers offset their keys by +1."""
    from ..utils import splitmix64

    keys = np.unique(np.asarray(keys, dtype=np.uint64))
    n = len(keys)
    if n == 0:
        return np.zeros(2, dtype=np.uint64), 1
    size = 1 << int(np.ceil(np.log2(max(2, int(n / load)))))
    mask = np.uint64(size - 1)
    h = (splitmix64(keys) & mask).astype(np.int64)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    slots = np.arange(n, dtype=np.int64) + np.maximum.accumulate(hs - np.arange(n, dtype=np.int64))
    tail = int(slots.max() - size + 1) if slots.max() >= size else 0
    table = np.zeros(size + tail + 1, dtype=np.uint64)
    table[slots] = keys[order]
    return table, size - 1


def probe_u64_hash(table: np.ndarray, mask: int, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership probe against build_u64_hash output."""
    from ..utils import splitmix64

    keys = np.asarray(keys, dtype=np.uint64)
    n = len(keys)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    idx = (splitmix64(keys) & np.uint64(mask)).astype(np.int64)
    alive = np.arange(n)
    while len(alive):
        slot = table[idx[alive]]
        k = keys[alive]
        hit = slot == k
        out[alive[hit]] = True
        cont = (~hit) & (slot != 0)  # occupied by another key: keep probing
        alive = alive[cont]
        idx[alive] = idx[alive] + 1  # no wrap: table has a zero tail
    return out


@dataclass
class CSRShard:
    lo: int  # first owned vertex id (global)
    hi: int  # one past last owned vertex id
    indptr: np.ndarray  # int64, len (hi-lo)+1
    indices: np.ndarray  # int64 neighbour ids, dst-sorted within each vertex
    weights: np.ndarray | None = None  # float64, aligned with indices
    etypes: np.ndarray | None = None  # int32, aligned with indices
    comp: np.ndarray | None = None  # optional precomputed composite membership keys (see precompute_composite)
    wext: np.ndarray | None = None  # optional precomputed weight prefix sums (see precompute_wext)
    ehash: np.ndarray | None = None  # optional open-addressing edge hash table (see precompute_edge_hash)
    ehash_mask: int = 0

    @property
    def size(self) -> int:
        return self.hi - self.lo

    @property
    def num_edges(self) -> int:
        return len(self.indices)

    def out_degree(self) -> np.ndarray:
        return np.diff(self.indptr)

    def neighbors(self, v: int) -> np.ndarray:
        s, e = self.indptr[v - self.lo], self.indptr[v - self.lo + 1]
        return self.indices[s:e]

    def contains_edges(self, v_local: np.ndarray, x: np.ndarray) -> np.ndarray:
        """Vectorized membership probe: is x[i] a neighbour of local vertex
        v_local[i]?  The semi-join probe of the reference's node2vec query
        (reference src/apps/node2vec.hpp:158-166, std::binary_search) —
        done for a whole query batch with one composite-key searchsorted.

        Requires indices < 2^32 and size < 2^31 (composite uint64 key).
        The >2^32-vertex path needs a two-level probe — documented limit.
        Uses the O(1) hash table when precompute_edge_hash has run.
        """
        if self.ehash is not None:
            return self.contains_edges_hash(v_local, x)
        comp = self._composite()
        if len(comp) == 0:
            return np.zeros(len(v_local), dtype=bool)
        keys = (np.asarray(v_local).astype(np.uint64) << np.uint64(32)) | np.asarray(x).astype(np.uint64)
        pos = np.minimum(np.searchsorted(comp, keys), len(comp) - 1)
        return comp[pos] == keys

    def precompute_composite(self) -> None:
        """Build the composite membership key array eagerly. For replicated
        pools this MUST happen once driver-side before ray.put: N workers
        lazily building an O(E) array simultaneously contend on kernel page
        allocation (measured: a 16M-element repeat taking 13 s under 30
        concurrent builders)."""
        if self.comp is None:
            self.comp = self._build_composite()

    def precompute_edge_hash(self, load: float = 0.5) -> None:
        """Open-addressing (linear probe) hash table over the composite
        (src_local << 32 | dst) edge keys: membership probes cost 1-2
        random accesses instead of the composite binary search's ~log2(E)
        cache misses — the node2vec query is probe-dominated (measured
        ~70% of walk time in searchsorted before this). Costs 16B/edge at
        load 0.5; built once (driver-side for replicated pools)."""
        if self.ehash is not None or self.num_edges == 0:
            return
        self.ehash, self.ehash_mask = build_u64_hash(self._composite() + np.uint64(1), load)

    def contains_edges_hash(self, v_local: np.ndarray, x: np.ndarray) -> np.ndarray:
        """Hash-table variant of contains_edges (precompute_edge_hash)."""
        n = len(v_local)
        out = np.zeros(n, dtype=bool)
        if self.ehash is None or n == 0:
            return out
        keys = ((np.asarray(v_local).astype(np.uint64) << np.uint64(32)) | np.asarray(x).astype(np.uint64)) + np.uint64(1)
        return probe_u64_hash(self.ehash, self.ehash_mask, keys)

    def precompute_wext(self) -> None:
        """Build the O(E) cumulative-weight array once (driver-side for
        replicated pools, before ray.put) — N workers each rebuilding it
        per walk_begin was NOTES_r1 gap 2."""
        if self.wext is None and self.weights is not None:
            self.wext = np.concatenate([[0.0], np.cumsum(self.weights, dtype=np.float64)])

    def _build_composite(self) -> np.ndarray:
        return (
            np.repeat(np.arange(self.size, dtype=np.uint64), self.out_degree()) << np.uint64(32)
        ) | self.indices.astype(np.uint64)

    def _composite(self) -> np.ndarray:
        if self.comp is not None:
            return self.comp
        comp = getattr(self, "_comp_cache", None)
        if comp is None:
            comp = self._build_composite()
            object.__setattr__(self, "_comp_cache", comp)
        return comp


def build_csr(
    lo: int,
    hi: int,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None = None,
    etype: np.ndarray | None = None,
) -> CSRShard:
    """Build the shard CSR from routed edge arrays (every src in [lo,hi))."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    # src-major, dst-minor order gives CSR + sorted adjacency in one pass.
    # Fast path: one composite-key argsort (~5x faster than lexsort on
    # 10M+ edges); falls back to lexsort when ids exceed 32 bits.
    if len(src) and (hi < (1 << 31)) and (dst.max(initial=0) < (1 << 31)):
        key = (src.astype(np.uint64) << np.uint64(32)) | dst.astype(np.uint64)
        order = np.argsort(key, kind="stable")
    else:
        order = np.lexsort((dst, src))
    src_s, dst_s = src[order], dst[order]
    deg = np.bincount(src_s - lo, minlength=hi - lo)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    return CSRShard(
        lo=lo,
        hi=hi,
        indptr=indptr,
        indices=dst_s,
        weights=np.asarray(weight, dtype=np.float64)[order] if weight is not None else None,
        etypes=np.asarray(etype, dtype=np.int32)[order] if etype is not None else None,
    )
