"""GraphShard — the per-partition stateful stage.

One shard owns a contiguous, degree-aware vertex range and its out-edge CSR
(the reference's per-rank ``EdgeContainer`` + vertex arrays, reference
include/graph.hpp:49-96, built once and reused across supersteps and across
multiple jobs, reference include/walk.hpp:738-781). Exposed as a Ray actor
(``GraphShard = ray.remote(ShardCore)``) — this is the one place the Dataset
API cannot express the semantics: a shared, reusable, mutable index.

Message exchange is the Ray-native version of the reference's ``emit`` +
``distributed_execute`` superstep (reference include/graph.hpp:611-918):
each shard *pre-aggregates per target partition* (sender-side combiner —
min/sum/count folded before the shuffle, so message volume is O(unique dst)
not O(edges)), returns one object per target partition via
``num_returns=P``, and the driver routes refs — arrays never touch the
driver.
"""
from __future__ import annotations

import numpy as np
import ray

from .shard_walk import WalkMixin, _ragged_idx
from .csr import CSRShard, build_csr
from .partition import part_of
from ..utils import sort2


class ShardCore(WalkMixin):
    """Pure-python core (actor-free) — unit-testable directly."""

    def __init__(
        self,
        part_id: int,
        boundaries: np.ndarray,
        v_num: int,
        src: np.ndarray,
        dst: np.ndarray,
        weight: np.ndarray | None = None,
        etype: np.ndarray | None = None,
        seed: int = 42,
        hub_vids: np.ndarray | None = None,
        hub_outdeg: np.ndarray | None = None,
        ghost_hidx: np.ndarray | None = None,
        ghost_dst: np.ndarray | None = None,
        prebuilt_csr: CSRShard | None = None,
        build_routing: bool = True,
        parquet_dir: str | None = None,
        parquet_cols: list[str] | None = None,
    ):
        self.part_id = int(part_id)
        self.boundaries = np.asarray(boundaries, dtype=np.int64)
        self.num_parts = len(self.boundaries) - 1
        self.v_num = int(v_num)
        self.lo = int(self.boundaries[part_id])
        self.hi = int(self.boundaries[part_id + 1])
        self.seed = seed
        if parquet_dir is not None:
            # the distributed build path: THIS actor reads only its own
            # part=<id>/ slice of the routed layout (Graph.from_dataset) —
            # edge arrays never pass through the driver
            src, dst, weight, etype, ghost_hidx, ghost_dst = self._load_part_parquet(
                parquet_dir, parquet_cols or ["src", "dst"], hub_vids
            )
        # prebuilt_csr: the replicated-walk path — CSR arrays built ONCE on
        # the driver, ray.put into plasma, shared zero-copy by every worker
        # in the pool (no per-actor sort or copy).
        self.csr: CSRShard = (
            prebuilt_csr if prebuilt_csr is not None else build_csr(self.lo, self.hi, src, dst, weight, etype)
        )
        self.outdeg = self.csr.out_degree()
        # --- heavy-vertex splitting (SURVEY.md §4 skew handling) ---
        # hub_vids: global list of split vertices; this shard holds the
        # ghost edge slice (ghost_hidx -> hub_vids index, ghost_dst).
        # The owner keeps the hub's rank/label state; its full degree
        # lives in outdeg_full (the CSR holds none of a hub's edges).
        self.hub_vids = hub_vids if hub_vids is not None else np.empty(0, np.int64)
        self.hub_outdeg = hub_outdeg if hub_outdeg is not None else np.empty(0, np.int64)
        self._ghost_hidx = ghost_hidx if ghost_hidx is not None else np.empty(0, np.int64)
        self._ghost_dst = ghost_dst if ghost_dst is not None else np.empty(0, np.int64)
        self.outdeg_full = self.outdeg.copy()
        owned = (self.hub_vids >= self.lo) & (self.hub_vids < self.hi)
        self.outdeg_full[self.hub_vids[owned] - self.lo] = self.hub_outdeg[owned]
        self._owned_hub_mask = owned
        if build_routing:
            self._build_routing()
            self._build_ghost_routing()
        # lazily-built sampling structures (per walk spec)
        self._wcum: np.ndarray | None = None
        # per-job vertex state
        self.rank: np.ndarray | None = None
        self.label: np.ndarray | None = None

    # ------------------------------------------------------------------ #
    @staticmethod
    def _load_part_parquet(parquet_dir: str, cols: list[str], hub_vids: np.ndarray | None):
        """Read this partition's slice of the routed hive layout written by
        Graph.from_dataset. Rows flagged ghost=1 are split-hub edges dealt
        to this shard; their hub index is recomputed locally from the
        (small, broadcast) hub_vids list."""
        import os

        import pyarrow.parquet as pq

        e64 = np.empty(0, np.int64)
        want_ghost = "ghost" in cols
        read_cols = [c for c in cols]
        if not os.path.isdir(parquet_dir):
            t = None
        else:
            t = pq.read_table(parquet_dir, columns=read_cols)
        if t is None or t.num_rows == 0:
            return (
                e64,
                e64,
                np.empty(0, np.float64) if "weight" in cols else None,
                e64 if "etype" in cols else None,
                e64 if want_ghost else None,
                e64 if want_ghost else None,
            )
        arr = {c: t.column(c).to_numpy(zero_copy_only=False) for c in read_cols}
        src = arr["src"].astype(np.int64, copy=False)
        dst = arr["dst"].astype(np.int64, copy=False)
        weight = arr["weight"].astype(np.float64, copy=False) if "weight" in arr else None
        etype = arr["etype"].astype(np.int64, copy=False) if "etype" in arr else None
        ghost_hidx = ghost_dst = None
        if want_ghost:
            gm = arr["ghost"].astype(bool)
            g_src, ghost_dst = src[gm], dst[gm]
            ghost_hidx = np.searchsorted(np.asarray(hub_vids, dtype=np.int64), g_src)
            keep = ~gm
            src, dst = src[keep], dst[keep]
            if weight is not None:
                weight = weight[keep]
            if etype is not None:
                etype = etype[keep]
        return src, dst, weight, etype, ghost_hidx, ghost_dst

    # ------------------------------------------------------------------ #
    # routing precomputes: for each target partition, the edge slice that
    # lands there, pre-sorted by destination so segment reductions
    # (reduceat) give sender-side combining for free.
    # ------------------------------------------------------------------ #
    def _build_routing(self):
        dst = self.csr.indices
        # local indices are int32 (half the DRAM traffic of the per-edge
        # gathers/scatters in the iterative sweeps); a single shard holding
        # >2^31 vertices or edges is out of scope by partitioning
        if self.csr.size >= (1 << 31) or len(dst) >= (1 << 31):
            raise ValueError("shard too large for int32 local indices — raise num_parts")
        src_idx = np.repeat(np.arange(self.csr.size, dtype=np.int32), self.outdeg)
        dpart = part_of(dst, self.boundaries)
        order = np.argsort(dpart, kind="stable")
        self._route_bounds = np.searchsorted(dpart[order], np.arange(self.num_parts + 1))
        # within each part slice, sort edges by destination for reduceat
        self._r_dst_local = np.empty(len(dst), dtype=np.int32)
        self._r_src_idx = np.empty(len(dst), dtype=np.int32)
        # weighted graphs keep the edge weights in routed order too, so
        # weighted sweeps (pagerank weighted=True, sssp) reuse the same
        # reduceat combiner layout
        w = self.csr.weights
        self._r_w = np.empty(len(dst), dtype=np.float64) if w is not None else None
        self._seg_starts: list[np.ndarray] = []
        self._seg_dsts: list[np.ndarray] = []
        for p in range(self.num_parts):
            s, e = self._route_bounds[p], self._route_bounds[p + 1]
            sl = order[s:e]
            d_loc = (dst[sl] - self.boundaries[p]).astype(np.int32)
            o2 = np.argsort(d_loc, kind="stable")
            sl = sl[o2]
            d_loc = d_loc[o2]
            self._r_dst_local[s:e] = d_loc
            self._r_src_idx[s:e] = src_idx[sl]
            if w is not None:
                self._r_w[s:e] = w[sl]
            if e > s:
                starts = np.concatenate([[0], np.flatnonzero(np.diff(d_loc)) + 1])
            else:
                starts = np.empty(0, dtype=np.int64)
            self._seg_starts.append(starts.astype(np.int64))
            self._seg_dsts.append(d_loc[starts] if e > s else np.empty(0, dtype=np.int32))

    def _build_ghost_routing(self):
        """Per-target-partition routing for this shard's ghost (split-hub)
        edge slice — same reduceat-combiner layout as _build_routing."""
        dst = self._ghost_dst
        self._g_seg_starts: list[np.ndarray] = []
        self._g_seg_dsts: list[np.ndarray] = []
        if len(dst) == 0:
            self._g_route_bounds = np.zeros(self.num_parts + 1, dtype=np.int64)
            self._g_dst_local = np.empty(0, np.int64)
            self._g_hidx = np.empty(0, np.int64)
            self._g_seg_starts = [np.empty(0, np.int64)] * self.num_parts
            self._g_seg_dsts = [np.empty(0, np.int64)] * self.num_parts
            return
        dpart = part_of(dst, self.boundaries)
        order = np.argsort(dpart, kind="stable")
        self._g_route_bounds = np.searchsorted(dpart[order], np.arange(self.num_parts + 1))
        self._g_dst_local = np.empty(len(dst), dtype=np.int64)
        self._g_hidx = np.empty(len(dst), dtype=np.int64)
        for p in range(self.num_parts):
            s, e = self._g_route_bounds[p], self._g_route_bounds[p + 1]
            sl = order[s:e]
            d_loc = dst[sl] - self.boundaries[p]
            o2 = np.argsort(d_loc, kind="stable")
            sl = sl[o2]
            d_loc = d_loc[o2]
            self._g_dst_local[s:e] = d_loc
            self._g_hidx[s:e] = self._ghost_hidx[sl]
            starts = np.concatenate([[0], np.flatnonzero(np.diff(d_loc)) + 1]) if e > s else np.empty(0, np.int64)
            self._g_seg_starts.append(starts.astype(np.int64))
            self._g_seg_dsts.append(d_loc[starts] if e > s else np.empty(0, np.int64))

    def hub_values(self, kind: str):
        """Owner-side per-superstep hub state publish (tiny: one scalar per
        owned hub). kind 'pr' -> rank/outdeg contribution; 'label' -> label."""
        idx = np.flatnonzero(self._owned_hub_mask)
        if len(idx) == 0:
            return idx, np.empty(0, np.float64 if kind == "pr" else np.int64)
        loc = self.hub_vids[idx] - self.lo
        if kind == "pr":
            return idx, self.rank[loc] / np.maximum(self.hub_outdeg[idx], 1)
        return idx, self.label[loc]

    def part_size(self, p: int) -> int:
        return int(self.boundaries[p + 1] - self.boundaries[p])

    def stats(self) -> dict:
        return {
            "part": self.part_id,
            "lo": self.lo,
            "hi": self.hi,
            "vertices": self.csr.size,
            "edges": self.csr.num_edges,
        }

    def ready(self) -> bool:
        return True

    def deg_get(self):
        return self.lo, self.outdeg

    def edge_count(self) -> int:
        """Edges this shard actually loaded (CSR + ghost slice)."""
        return int(self.csr.num_edges + len(self._ghost_dst))

    def vertex_table(self, getter: str, col: str = "value"):
        """(vertex, value) arrow table for this shard's range — called via
        .remote() the table stays in the object store so the driver can
        build a Dataset with from_arrow_refs (no driver-side vector)."""
        import pyarrow as pa

        lo, arr = getattr(self, getter)()
        ids = np.arange(lo, lo + len(arr), dtype=np.int64)
        return pa.table({"vertex": pa.array(ids), col: pa.array(arr)})

    def localize_csr(self) -> bool:
        """Copy plasma-backed (zero-copy shared) CSR arrays into the
        actor's own heap. Shared mappings can be slower for random-access
        probe loops; copying trades memory (one CSR per worker) for
        locality — measured before adoption, see WalkerPool."""
        c = self.csr
        self.csr = CSRShard(
            lo=c.lo,
            hi=c.hi,
            indptr=np.array(c.indptr),
            indices=np.array(c.indices),
            weights=np.array(c.weights) if c.weights is not None else None,
            etypes=np.array(c.etypes) if c.etypes is not None else None,
            comp=np.array(c.comp) if c.comp is not None else None,
        )
        return True

    def indeg_partials(self):
        """Per target partition: dense in-degree contribution of this
        shard's out-edges (reference in-degree Allreduce, graph.hpp:445-459
        — partial+final pattern)."""
        out = []
        for p in range(self.num_parts):
            s, e = self._route_bounds[p], self._route_bounds[p + 1]
            out.append(np.bincount(self._r_dst_local[s:e], minlength=self.part_size(p)).astype(np.int64))
        return tuple(out)

    def vertex_apply(self, fn) -> float:
        """Parallel map over the owned vertex range with global sum
        reduction (reference process_vertices, graph.hpp:920-941).
        fn(vids, out_degree) -> per-vertex float array."""
        vids = np.arange(self.lo, self.hi, dtype=np.int64)
        return float(np.asarray(fn(vids, self.outdeg_full)).sum())

    # ------------------------- k-hop sampling -------------------------- #
    def khop_probe(self, roots: np.ndarray, vs: np.ndarray, fanout: int, mode: str, rng_seed: int, hop: int):
        """Fanout-capped adjacency slices for frontier pairs owned by this
        shard — GraphSAGE sampling served straight from the resident CSR,
        no edge-table scan (``kkray.graph.sample.khop_neighbors_graph``
        routes each (root, v) pair here by ``part_of(v)``; the same
        owner-routing as ``walk_step``). Returns (root, src, dst) int64
        arrays; per-pair selection is bit-identical to the edge-table
        path's ``grouped_top_k`` modes (sample.py:101-122)."""
        from ..utils import splitmix64

        roots = np.asarray(roots, dtype=np.int64)
        vs = np.asarray(vs, dtype=np.int64)
        vl = vs - self.lo
        starts = self.csr.indptr[vl]
        deg = self.csr.indptr[vl + 1] - starts
        if mode == "first":
            # CSR adjacency is dst-sorted (build_csr): first k == smallest k
            take = np.minimum(deg, fanout)
            idx = _ragged_idx(starts, take)
            return np.repeat(roots, take), np.repeat(vs, take), self.csr.indices[idx]
        # uniform: rank every neighbour by the keyed splitmix64 hash and
        # keep the fanout smallest (rank, dst) per pair — the identical key
        # and tie-break as the edge-table path's add_rank + grouped_top_k
        idx = _ragged_idx(starts, deg)
        dst = self.csr.indices[idx]
        rt = np.repeat(roots, deg)
        sr = np.repeat(vs, deg)
        with np.errstate(over="ignore"):
            key = (
                rt.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                ^ sr.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
                ^ dst.astype(np.uint64) * np.uint64(0x94D049BB133111EB)
                ^ np.uint64((rng_seed << 8) + hop)
            )
        rank = splitmix64(key).astype(np.int64)
        # frontier pairs are unique, so each pair's rows stay contiguous:
        # one lexsort, then keep the first fanout rows of every segment
        seg = np.repeat(np.arange(len(vs), dtype=np.int64), deg)
        order = np.lexsort((dst, rank, seg))
        seg_starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
        pos_in_seg = np.arange(len(seg), dtype=np.int64) - np.repeat(seg_starts, deg)
        sel = order[pos_in_seg < fanout]
        return rt[sel], sr[sel], dst[sel]

    # ------------------------- PageRank ------------------------------- #
    def pr_init(
        self,
        value: float | None = None,
        dtype: str = "float64",
        weighted: bool = False,
        seeds: np.ndarray | None = None,
    ):
        self._pr_dtype = np.dtype(dtype)
        self._pr_weighted = bool(weighted)
        if seeds is not None and len(seeds):
            # personalized teleport: reset mass uniform over the seed set
            # (seeds are a SMALL id list broadcast once; each shard builds
            # only its owned slice — never an O(V) driver array)
            s = np.asarray(seeds, dtype=np.int64)
            loc = s[(s >= self.lo) & (s < self.hi)] - self.lo
            self._pr_reset = np.zeros(self.csr.size, dtype=np.float64)
            self._pr_reset[loc] = 1.0 / len(s)
        else:
            self._pr_reset = None
        if weighted:
            if self.csr.weights is None:
                raise ValueError("weighted pagerank needs a graph built with edge weights")
            if len(self.hub_vids):
                raise ValueError("weighted pagerank: build without split_threshold")
            # per-vertex out-weight via prefix-sum difference (exact segment
            # sums without reduceat's empty-segment pitfall); weights must
            # be positive
            cs = np.concatenate([[0.0], np.cumsum(self.csr.weights, dtype=np.float64)])
            self._pr_wout = cs[self.csr.indptr[1:]] - cs[self.csr.indptr[:-1]]
        self.rank = np.full(
            self.csr.size, (1.0 / self.v_num) if value is None else value, dtype=self._pr_dtype
        )

    def pr_scatter(self, hub_contrib: np.ndarray | None = None):
        """Returns P dense partial-sum arrays (one per target partition) +
        the local dangling-rank scalar. Sender-side combining: the edge
        slice for each target is pre-sorted by destination, so the fold is
        a sequential ``np.add.reduceat`` over segments + one compact
        scatter into the unique destinations — cache-friendly, unlike a
        bincount random-scatter over the whole target range. The exchange
        moves O(V) not O(E), in the rank dtype (float32 halves traffic).

        hub_contrib: per-split-hub rank/deg values (driver-assembled from
        hub_values) — this shard folds its ghost edge slice in too."""
        dt = getattr(self, "_pr_dtype", np.float64)
        if getattr(self, "_pr_weighted", False):
            # rank flows along each out-edge proportional to w / Σ w_out
            contrib = np.where(self._pr_wout > 0, self.rank / np.maximum(self._pr_wout, 1e-300), 0.0)
            per_edge = contrib[self._r_src_idx] * self._r_w
        else:
            contrib = np.where(
                self.outdeg_full > 0, self.rank / np.maximum(self.outdeg_full, 1), 0.0
            ).astype(dt, copy=False)
            per_edge = contrib[self._r_src_idx]
        out = []
        for p in range(self.num_parts):
            s, e = self._route_bounds[p], self._route_bounds[p + 1]
            starts = self._seg_starts[p]
            nseg = len(starts) if e > s else 0
            psize = self.part_size(p)
            has_ghost = hub_contrib is not None and self._g_route_bounds[p + 1] > self._g_route_bounds[p]
            if nseg:
                # segment sums accumulate in float64 even in float32 mode
                # (hub in-degree segments would otherwise grow float32
                # error with segment length); only the compact per-target
                # result ships in the rank dtype
                seg = per_edge[s:e]
                if dt != np.float64:
                    seg = seg.astype(np.float64)
                sums = np.add.reduceat(seg, starts).astype(dt, copy=False)
            if nseg and not has_ghost and nseg * 2 < psize:
                # density-adaptive SPARSE partial: this sender touches few
                # of the target's vertices, so ship (dst, val) pairs
                # instead of a dense slice — exchange volume follows the
                # edge structure, not O(P*V) (matters at high partition
                # counts and on power-law webgraphs)
                out.append((self._seg_dsts[p], sums))
                continue
            acc = np.zeros(psize, dtype=dt)
            if nseg:
                acc[self._seg_dsts[p]] = sums
            gs, ge = self._g_route_bounds[p], self._g_route_bounds[p + 1]
            if ge > gs and hub_contrib is not None:
                acc += np.bincount(
                    self._g_dst_local[gs:ge],
                    weights=hub_contrib[self._g_hidx[gs:ge]],
                    minlength=psize,
                ).astype(dt, copy=False)
            out.append(acc)
        if getattr(self, "_pr_weighted", False):
            dangling = float(self.rank[self._pr_wout <= 0].sum(dtype=np.float64))
        else:
            dangling = float(self.rank[self.outdeg_full == 0].sum(dtype=np.float64))
        return (*out, dangling)

    def pr_gather(self, damping: float, *args) -> float:
        """new = (1-d)/N + d*(Σ partials + dangling/N); returns L1 delta.
        args = P per-sender dangling scalars followed by P partial arrays
        (refs passed straight from pr_scatter — the dangling Allreduce
        happens here instead of on the driver, saving one barrier per
        superstep). Accumulation is float64 regardless of rank dtype."""
        P = self.num_parts
        dangling_total = float(sum(args[:P]))
        acc = np.zeros(self.csr.size, dtype=np.float64)
        for part in args[P:]:
            if isinstance(part, tuple):  # sparse (dst, val) partial
                # dsts are unique within one partial -> fancy += is exact
                acc[part[0]] += part[1]
            else:
                acc += part
        new = self._pr_apply(damping, acc, dangling_total)
        dt = getattr(self, "_pr_dtype", np.float64)
        new = new.astype(dt, copy=False)
        delta = float(np.abs(new.astype(np.float64) - self.rank.astype(np.float64)).sum())
        self.rank = new
        return delta

    def _pr_apply(self, damping: float, acc: np.ndarray, dangling_total: float) -> np.ndarray:
        r = getattr(self, "_pr_reset", None)
        if r is None:
            return (1.0 - damping) / self.v_num + damping * (acc + dangling_total / self.v_num)
        # personalized: teleport AND dangling mass land on the seed set
        return (1.0 - damping) * r + damping * (acc + dangling_total * r)

    def pr_scatter_bundle(self, hub_contrib: np.ndarray | None = None):
        """One plasma object per sender per superstep: the P per-target
        partials (dense array OR sparse (dst, val) tuple, density-chosen)
        plus the dangling scalar, bundled in one tuple. On one node each
        receiver reads only its own entry's pages zero-copy; 32 bundles
        beat 1024 per-pair objects on object-creation overhead. (On a
        multi-node cluster, use the per-target pr_scatter refs instead so
        only the needed slice crosses the wire.)"""
        parts = self.pr_scatter(hub_contrib)
        return tuple(parts)

    def pr_gather_bundle(self, damping: float, *bundles) -> float:
        """Gather from sender bundles: my entry is bundle[part_id]; the
        dangling scalar is bundle[P]."""
        P = self.num_parts
        me = self.part_id
        acc = np.zeros(self.csr.size, dtype=np.float64)
        dangling_total = 0.0
        for b in bundles:
            part = b[me]
            if isinstance(part, tuple):
                acc[part[0]] += part[1]
            else:
                acc += part
            dangling_total += float(b[P])
        new = self._pr_apply(damping, acc, dangling_total)
        dt = getattr(self, "_pr_dtype", np.float64)
        new = new.astype(dt, copy=False)
        delta = float(np.abs(new.astype(np.float64) - self.rank.astype(np.float64)).sum())
        self.rank = new
        return delta

    def pr_get(self):
        return self.lo, self.rank

    def pr_set(self, values: np.ndarray, dtype: str = "float64"):
        self.rank = np.asarray(values, dtype=np.dtype(dtype)).copy()

    # ------------------ Connected components (min-label) --------------- #
    _I64MAX = np.iinfo(np.int64).max

    def cc_init(self):
        self.label = np.arange(self.lo, self.hi, dtype=np.int64)
        self._cc_changed = np.ones(self.csr.size, dtype=bool)

    def cc_scatter(self, hub_labels: np.ndarray | None = None):
        """Per target partition: (unique_dst_local, min source-label) —
        segment-min via reduceat (sender-side combiner). Delta-optimized:
        vertices whose label did not change last superstep contribute the
        +inf neutral element and their segments are dropped from the
        message (the frontier shrinks fast once components settle).
        Ghost (split-hub) edges contribute their hub's label the same way."""
        vals_all = np.where(self._cc_changed, self.label, self._I64MAX)[self._r_src_idx]
        out = []
        for p in range(self.num_parts):
            s, e = self._route_bounds[p], self._route_bounds[p + 1]
            starts = self._seg_starts[p]
            if e > s and len(starts):
                mins = np.minimum.reduceat(vals_all[s:e], starts)
                live = mins != self._I64MAX
                dsts, mins = self._seg_dsts[p][live], mins[live]
            else:
                dsts, mins = self._seg_dsts[p], np.empty(0, dtype=np.int64)
            gs, ge = self._g_route_bounds[p], self._g_route_bounds[p + 1]
            if ge > gs and hub_labels is not None:
                gstarts = self._g_seg_starts[p]
                gmins = np.minimum.reduceat(hub_labels[self._g_hidx[gs:ge]], gstarts)
                dsts = np.concatenate([dsts, self._g_seg_dsts[p]])
                mins = np.concatenate([mins, gmins])
            out.append((dsts, mins))
        return tuple(out)

    def cc_gather_packed(self, packed) -> int:
        # P == 1: num_returns=1 hands the driver ONE ref to the unsplit
        # 1-tuple (same pitfall as bfs/sssp_gather_packed)
        return self.cc_gather(*packed)

    def cc_gather(self, *partials) -> int:
        new = self.label.copy()
        for dsts, mins in partials:
            if len(dsts):
                np.minimum.at(new, dsts, mins)
        self._cc_changed = new != self.label
        changed = int(self._cc_changed.sum())
        self.label = new
        return changed

    def cc_get(self):
        return self.lo, self.label

    def cc_set(self, values: np.ndarray):
        self.label = np.asarray(values, dtype=np.int64).copy()
        # conservative after resume: treat everything as changed so the
        # first post-resume superstep re-sends all labels
        self._cc_changed = np.ones(self.csr.size, dtype=bool)

    # ---------------- Label propagation (majority label) ---------------- #
    def lp_init(self):
        self.label = np.arange(self.lo, self.hi, dtype=np.int64)

    def lp_scatter(self, hub_labels: np.ndarray | None = None):
        """Per target partition: sparse (dst_local, label, count) triples —
        the per-batch (dst,label) pre-count that SURVEY.md §2.7 calls for.
        Ghost edges contribute (dst, hub_label) pairs too."""
        labs_all = self.label[self._r_src_idx]
        out = []
        for p in range(self.num_parts):
            s, e = self._route_bounds[p], self._route_bounds[p + 1]
            d = self._r_dst_local[s:e]
            l = labs_all[s:e]
            gs, ge = self._g_route_bounds[p], self._g_route_bounds[p + 1]
            if ge > gs and hub_labels is not None:
                d = np.concatenate([d, self._g_dst_local[gs:ge]])
                l = np.concatenate([l, hub_labels[self._g_hidx[gs:ge]]])
            if len(d) == 0:
                out.append((d, l, np.empty(0, dtype=np.int64)))
                continue
            o = sort2(d, l)  # composite-key radix: the per-superstep sort
            d, l = d[o], l[o]
            new_seg = np.concatenate([[True], (np.diff(d) != 0) | (np.diff(l) != 0)])
            starts = np.flatnonzero(new_seg)
            counts = np.diff(np.concatenate([starts, [len(d)]]))
            out.append((d[starts], l[starts], counts))
        return tuple(out)

    def lp_gather_packed(self, packed) -> int:
        return self.lp_gather(*packed)

    def lp_scatter_bundle(self, hub_labels: np.ndarray | None = None):
        """Target-major broadcast bundle — the same O(P)-objects-per-wave
        transport the walk mesh uses (shard_walk `_bundle`): ONE
        (d, l, c, bounds) object for ALL receivers; receiver p slices rows
        [bounds[p], bounds[p+1]). Halves transport bytes vs the per-target
        int64 triples when the graph fits 32-bit ids (d is a local index
        < partition size, l is a vertex id < v_num, c is a per-sender
        multiplicity — each checked, int64 fallback)."""
        parts = self.lp_scatter(hub_labels)
        d = np.concatenate([p[0] for p in parts])
        l = np.concatenate([p[1] for p in parts])
        c = np.concatenate([p[2] for p in parts])
        bounds = np.zeros(self.num_parts + 1, dtype=np.int64)
        np.cumsum([len(p[0]) for p in parts], out=bounds[1:])
        if self.v_num < (1 << 31):
            d = d.astype(np.int32)
            l = l.astype(np.int32)
        if len(c) == 0 or int(c.max()) < (1 << 31):
            c = c.astype(np.int32)
        return d, l, c, bounds

    def lp_gather_bundles(self, p: int, *bundles) -> int:
        """Merge this partition's slice of every sender's broadcast bundle
        (counts upcast to int64 — cross-sender totals are in-degree-bounded,
        which can exceed 2^31 even when each sender's multiplicity fits)."""
        return self.lp_gather(
            *[
                (d[bounds[p] : bounds[p + 1]], l[bounds[p] : bounds[p + 1]], c[bounds[p] : bounds[p + 1]].astype(np.int64))
                for d, l, c, bounds in bundles
            ]
        )

    def lp_gather(self, *partials) -> int:
        """Merge (dst,label,count) partials; per dst adopt argmax-count
        label, ties -> smallest label; isolated vertices keep their label.
        Synchronous update (all reads see the previous iteration)."""
        ds = np.concatenate([p[0] for p in partials]) if partials else np.empty(0, dtype=np.int64)
        if len(ds) == 0:
            return 0
        ls = np.concatenate([p[1] for p in partials])
        cs = np.concatenate([p[2] for p in partials])
        o = sort2(ds, ls)
        ds, ls, cs = ds[o], ls[o], cs[o]
        new_seg = np.concatenate([[True], (np.diff(ds) != 0) | (np.diff(ls) != 0)])
        starts = np.flatnonzero(new_seg)
        tot = np.add.reduceat(cs, starts)
        ds_u, ls_u = ds[starts], ls[starts]
        # pick per dst: max count, tie -> min label. lexsort keys: last is primary.
        sel = np.lexsort((ls_u, -tot, ds_u))
        ds_s = ds_u[sel]
        first = np.concatenate([[True], np.diff(ds_s) != 0])
        winners_dst = ds_s[first]
        winners_lab = ls_u[sel][first]
        new = self.label.copy()
        new[winners_dst] = winners_lab
        changed = int((new != self.label).sum())
        self.label = new
        return changed

    lp_get = cc_get
    lp_set = cc_set

    # ----------------------- Triangle counting ------------------------- #
    # Degree-ordered orientation + wedge-join (SURVEY.md §2.7): keep edges
    # u->v with (deg(u),u) < (deg(v),v), generate wedges (v,w) from each
    # oriented adjacency (neighbours sorted by that order), probe oriented
    # edge (v,w) at v's partition by hash. Neighbour degrees come from a
    # distributed degree fetch (tri_deg_requests/lookup) — NO dense global
    # rank array exists anywhere.
    def tri_deg_requests(self):
        """Unique out-neighbour ids bucketed by owner partition; remembers
        the layout so tri_build can map degrees back to edges."""
        dst = self.csr.indices
        uniq = np.unique(dst)
        parts = part_of(uniq, self.boundaries)
        bounds = np.searchsorted(parts, np.arange(self.num_parts + 1))
        self._tri_uniq = uniq  # sorted -> contiguous owner buckets
        self._tri_uniq_bounds = bounds
        return tuple(uniq[bounds[p] : bounds[p + 1]] for p in range(self.num_parts))

    def tri_deg_lookup(self, *id_batches):
        """Answer degree queries for owned vertex ids (the join's probe
        side — O(query) not O(V))."""
        return tuple(self.outdeg_full[np.asarray(ids, dtype=np.int64) - self.lo] for ids in id_batches)

    def tri_build(self, *deg_batches):
        """Assemble neighbour degrees (responses aligned with
        tri_deg_requests buckets), orient, and build the oriented CSR +
        membership keys (v_local << 32 | w)."""
        if len(self.hub_vids):
            raise ValueError("triangle counting needs full adjacency: build without split_threshold")
        uniq = self._tri_uniq
        udeg = np.empty(len(uniq), dtype=np.int64)
        b = self._tri_uniq_bounds
        for p, batch in enumerate(deg_batches):
            udeg[b[p] : b[p + 1]] = batch
        dst = self.csr.indices
        dst_deg = udeg[np.searchsorted(uniq, dst)]
        src_idx = np.repeat(np.arange(self.csr.size, dtype=np.int64), self.outdeg)
        u_glob = src_idx + self.lo
        u_deg = self.outdeg_full[src_idx]
        # lexicographic (deg, id) orientation — same strict total order as
        # the old dense rank array, no O(V) structure required
        keep = (u_deg < dst_deg) | ((u_deg == dst_deg) & (u_glob < dst))
        o_src = src_idx[keep]
        o_dst = dst[keep]
        o_ddeg = dst_deg[keep]
        # adjacency sorted by neighbour (deg, id) so wedge pairs (i<j) are
        # oriented
        order = np.lexsort((o_dst, o_ddeg, o_src))
        o_src, o_dst = o_src[order], o_dst[order]
        self._tri_deg = np.bincount(o_src, minlength=self.csr.size)
        self._tri_indptr = np.concatenate([[0], np.cumsum(self._tri_deg)]).astype(np.int64)
        self._tri_adj = o_dst
        self._tri_ddeg = o_ddeg[order]
        comp = (o_src.astype(np.uint64) << np.uint64(32)) | o_dst.astype(np.uint64)
        self._tri_comp = np.sort(comp)
        self._tri_hash = None  # probe table rebuilt lazily per tri_build
        return int(len(o_dst))

    def tri_build_local(self) -> int:
        """num_parts==1 path: the single shard owns every vertex, so the
        degree join collapses to a local lookup (no exchange)."""
        (ids,) = self.tri_deg_requests()
        return self.tri_build(self.outdeg_full[ids - self.lo])

    def tri_count_packed(self, packed) -> int:
        """num_parts==1 path: tri_wedges_chunk returns its 1-tuple packed
        in a single ref; unpack here instead of num_returns splitting."""
        return self.tri_count(*packed)

    def tri_total_pairs(self) -> int:
        """Total oriented wedge count on this shard; also precomputes the
        cumulative per-vertex pair offsets used by tri_wedges_chunk."""
        npairs = (self._tri_deg * (self._tri_deg - 1)) // 2
        self._tri_cum = np.concatenate([[0], np.cumsum(npairs)]).astype(np.int64)
        return int(self._tri_cum[-1])

    def _tri_pairs(self, lo: int, hi: int):
        """Expand GLOBAL pair indices [lo, hi) of the oriented adjacency to
        (u_local, v, w) wedge triples (streamed chunks — a hub-heavy shard
        never materializes all its O(Σdeg²) wedges at once).

        Pair index r within a vertex is inverted to the adjacency pair
        (i, j) with the triangular-number formula (float sqrt + integer
        correction) — no python loop over vertices."""
        if hi <= lo:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        adj = self._tri_adj
        indptr = self._tri_indptr
        cum = self._tri_cum
        # vertex range covering [lo, hi): per-pair owner via ONE
        # np.repeat over clipped per-vertex counts (sequential) instead
        # of a binary search per pair (8x faster on 40M-pair shards)
        v0 = int(np.searchsorted(cum, lo, side="right") - 1)
        v1 = int(np.searchsorted(cum, hi, side="left"))
        reps = np.clip(cum[v0 + 1 : v1 + 1], lo, hi) - np.clip(cum[v0:v1], lo, hi)
        u_rep = np.repeat(np.arange(v0, v1, dtype=np.int64), reps)
        r_glob = np.arange(lo, hi, dtype=np.int64)
        r = r_glob - cum[u_rep]
        j = ((1.0 + np.sqrt(1.0 + 8.0 * r.astype(np.float64))) // 2).astype(np.int64)
        j = np.where(j * (j - 1) // 2 > r, j - 1, j)
        j = np.where((j + 1) * j // 2 <= r, j + 1, j)
        i = r - j * (j - 1) // 2
        base = indptr[u_rep]
        return u_rep, adj[base + i], adj[base + j]

    @staticmethod
    def _tri_bucket(vpart, num_parts, *cols):
        """Target-sorted single gather per column -> per-target slices."""
        order = np.argsort(vpart, kind="stable")
        bounds = np.searchsorted(vpart[order], np.arange(num_parts + 1))
        sorted_cols = [c[order] for c in cols]
        return tuple(
            tuple(c[bounds[p] : bounds[p + 1]] for c in sorted_cols) for p in range(num_parts)
        )

    def tri_wedges_chunk(self, lo: int, hi: int):
        """Oriented wedges for pair indices [lo, hi), bucketed by part(v).
        Returns P (v_global, w) pair-arrays."""
        _, v_arr, w_arr = self._tri_pairs(lo, hi)
        if self.num_parts == 1:
            return ((v_arr, w_arr),)
        return self._tri_bucket(part_of(v_arr, self.boundaries), self.num_parts, v_arr, w_arr)

    def tri_wedges_chunk_u(self, lo: int, hi: int):
        """Per-vertex-attribution variant: ships (u_global, v, w) so the
        probe side can credit all three corners of a matched triangle."""
        u_loc, v_arr, w_arr = self._tri_pairs(lo, hi)
        u_arr = u_loc + self.lo
        if self.num_parts == 1:
            return ((u_arr, v_arr, w_arr),)
        return self._tri_bucket(
            part_of(v_arr, self.boundaries), self.num_parts, u_arr, v_arr, w_arr
        )

    def tri_count(self, *query_batches) -> int:
        """Count how many queried (v, w) oriented edges exist locally.
        Probes the O(1) open-addressing table over the oriented edge keys
        (built lazily on first call) instead of a per-key binary search."""
        total = 0
        comp = self._tri_comp
        if len(comp) == 0:
            return 0
        if getattr(self, "_tri_hash", None) is None:
            from .csr import build_u64_hash

            self._tri_hash = build_u64_hash(comp + np.uint64(1))
        from .csr import probe_u64_hash

        table, mask = self._tri_hash
        for v_glob, w_glob in query_batches:
            if len(v_glob) == 0:
                continue
            keys = (((v_glob - self.lo).astype(np.uint64) << np.uint64(32)) | w_glob.astype(np.uint64)) + np.uint64(1)
            total += int(probe_u64_hash(table, mask, keys).sum())
        return total

    def tri_probe_mask(self, v_glob: np.ndarray, w_glob: np.ndarray) -> np.ndarray:
        """Membership mask for queried (v, w) oriented edges (v owned here)."""
        comp = self._tri_comp
        if len(comp) == 0 or len(v_glob) == 0:
            return np.zeros(len(v_glob), dtype=bool)
        if getattr(self, "_tri_hash", None) is None:
            from .csr import build_u64_hash

            self._tri_hash = build_u64_hash(comp + np.uint64(1))
        from .csr import probe_u64_hash

        table, mask = self._tri_hash
        keys = (
            ((v_glob - self.lo).astype(np.uint64) << np.uint64(32)) | w_glob.astype(np.uint64)
        ) + np.uint64(1)
        return probe_u64_hash(table, mask, keys)

    def tri_count_attr(self, batch) -> int:
        """Probe a (u, v, w) wedge chunk and CREDIT matched triangles to all
        three corners. Increments accumulate SPARSELY shard-side as
        (vertex, count) pairs (pre-combined per chunk with np.unique) —
        never a dense O(V) array; tri_vc_route ships them owner-bucketed
        once at the end of the stream."""
        u_glob, v_glob, w_glob = batch
        hit = self.tri_probe_mask(np.asarray(v_glob, np.int64), np.asarray(w_glob, np.int64))
        n = int(hit.sum())
        if n:
            corners = np.concatenate([u_glob[hit], v_glob[hit], w_glob[hit]])
            ids, counts = np.unique(corners, return_counts=True)
            if not hasattr(self, "_tri_vc"):
                self._tri_vc = []
            self._tri_vc.append((ids, counts))
        return n

    def assort_partials(self, *deg_batches):
        """Exact integer moment partials for degree assortativity over this
        shard's directed edge slice: (n, Σx, Σy, Σxy, Σx², Σy²) with
        x = deg(src), y = deg(dst). Neighbour degrees arrive through the
        same owner-routed join layout as tri_deg_requests (call it first);
        python-int exact so the driver's Pearson fold matches the SQL
        oracle bit-for-bit before any rounding. int64 moment sums are
        exact up to ~9e18 — Σdeg² with un-split mega-hubs can exceed that
        at extreme scale; build with split_threshold off but shard smaller,
        or split hubs (assortativity only needs degrees, not adjacency)."""
        uniq = self._tri_uniq
        b = self._tri_uniq_bounds
        udeg = np.empty(len(uniq), dtype=np.int64)
        for p, batch in enumerate(deg_batches):
            udeg[b[p] : b[p + 1]] = batch
        dst = self.csr.indices
        y = udeg[np.searchsorted(uniq, dst)]
        src_idx = np.repeat(np.arange(self.csr.size, dtype=np.int64), self.outdeg)
        x = self.outdeg_full[src_idx]
        return (
            int(len(dst)),
            int(x.sum()),
            int(y.sum()),
            int((x * y).sum()),
            int((x * x).sum()),
            int((y * y).sum()),
        )

    def assort_partials_local(self):
        """num_parts==1 path: every neighbour degree is owned here."""
        (ids,) = self.tri_deg_requests()
        return self.assort_partials(self.outdeg_full[ids - self.lo])

    def tri_count_attr_packed(self, packed) -> int:
        """num_parts==1 path: unpack the single-ref 1-tuple."""
        return self.tri_count_attr(packed[0])

    def tri_vc_gather_packed(self, packed) -> np.ndarray:
        """num_parts==1 path: tri_vc_route's 1-tuple arrives in one ref."""
        return self.tri_vc_gather(*packed)

    def tri_vc_route(self):
        """End-of-stream flush: merge the accumulated sparse increments and
        bucket them by owner — P (ids, counts) batches."""
        pairs = getattr(self, "_tri_vc", [])
        self._tri_vc = []
        if pairs:
            all_ids = np.concatenate([p[0] for p in pairs])
            all_cnt = np.concatenate([p[1] for p in pairs])
            # re-combine across chunks (sorted ids -> reduceat segments)
            order = np.argsort(all_ids, kind="stable")
            ids_s, cnt_s = all_ids[order], all_cnt[order]
            starts = np.flatnonzero(np.concatenate([[True], ids_s[1:] != ids_s[:-1]]))
            ids_u = ids_s[starts]
            cnt_u = np.add.reduceat(cnt_s, starts)
        else:
            ids_u = np.empty(0, np.int64)
            cnt_u = np.empty(0, np.int64)
        vpart = part_of(ids_u, self.boundaries)
        bounds = np.searchsorted(vpart, np.arange(self.num_parts + 1))  # ids_u sorted -> parts sorted
        return tuple(
            (ids_u[bounds[p] : bounds[p + 1]], cnt_u[bounds[p] : bounds[p + 1]])
            for p in range(self.num_parts)
        )

    def tri_vc_gather(self, *batches) -> np.ndarray:
        """Sum owner-routed (ids, counts) batches into this shard's dense
        per-vertex triangle counts (O(V/P) local array)."""
        acc = np.zeros(self.csr.size, dtype=np.int64)
        for ids, counts in batches:
            if len(ids):
                # ids are unique within one sender's batch -> fancy += is exact
                acc[np.asarray(ids, np.int64) - self.lo] += counts
        return acc

    # ------------------- HITS (hubs & authorities) --------------------- #
    # auth_k = normalize2(A^T hub_{k-1}); hub_k = normalize2(A auth_k).
    # The auth update PUSHES hub mass along out-edges with the same
    # dst-sorted reduceat combiner as pr_scatter; the hub update PULLS
    # neighbour auth values through a static distributed value join
    # (unique out-neighbours bucketed by owner — the same join layout as
    # the triangle degree join, built ONCE at init, reused every
    # iteration: O(unique dst) per shard, no dense O(V) structure).
    def hits_init(self):
        if len(self.hub_vids):
            raise ValueError("HITS needs full adjacency: build without split_threshold")
        self._auth = np.zeros(self.csr.size, dtype=np.float64)
        self._hub = np.ones(self.csr.size, dtype=np.float64)
        uniq = np.unique(self.csr.indices)
        parts = part_of(uniq, self.boundaries)
        self._hits_uniq = uniq  # sorted -> contiguous owner buckets
        self._hits_uniq_bounds = np.searchsorted(parts, np.arange(self.num_parts + 1))
        self._hits_edge_idx = np.searchsorted(uniq, self.csr.indices)
        self._hits_src_idx = np.repeat(np.arange(self.csr.size, dtype=np.int64), self.outdeg)

    def hits_requests(self):
        """Static per-owner unique out-neighbour id buckets (fetched once;
        the driver re-routes the same refs every iteration)."""
        b = self._hits_uniq_bounds
        return tuple(self._hits_uniq[b[p] : b[p + 1]] for p in range(self.num_parts))

    def hits_scatter(self):
        """Push hub along out-edges: P per-target partial sums, density-
        adaptive sparse/dense exactly like pr_scatter (no degree division,
        no dangling term)."""
        per_edge = self._hub[self._r_src_idx]
        out = []
        for p in range(self.num_parts):
            s, e = self._route_bounds[p], self._route_bounds[p + 1]
            starts = self._seg_starts[p]
            nseg = len(starts) if e > s else 0
            psize = self.part_size(p)
            sums = np.add.reduceat(per_edge[s:e], starts) if nseg else None
            if nseg and nseg * 2 < psize:
                out.append((self._seg_dsts[p], sums))
                continue
            acc = np.zeros(psize, dtype=np.float64)
            if nseg:
                acc[self._seg_dsts[p]] = sums
            out.append(acc)
        return tuple(out)

    def hits_gather_auth(self, *partials) -> float:
        acc = np.zeros(self.csr.size, dtype=np.float64)
        for part in partials:
            if isinstance(part, tuple):
                acc[part[0]] += part[1]
            else:
                acc += part
        self._auth = acc
        return float((acc * acc).sum())

    def hits_gather_auth_packed(self, packed) -> float:
        """num_parts==1 path (a bare ref holds the still-packed 1-tuple)."""
        return self.hits_gather_auth(*packed)

    def hits_scale(self, which: str, norm: float):
        if norm > 0:
            if which == "auth":
                self._auth /= norm
            else:
                self._hub /= norm

    def hits_lookup_auth(self, *id_batches):
        """Answer auth-value queries for owned ids (O(query) not O(V))."""
        return tuple(self._auth[np.asarray(ids, dtype=np.int64) - self.lo] for ids in id_batches)

    def hits_update_hub(self, *value_batches) -> float:
        """hub = Σ_out auth(neighbour); responses aligned with the
        hits_requests owner buckets. Returns the local Σ hub² term."""
        vals = np.empty(len(self._hits_uniq), dtype=np.float64)
        b = self._hits_uniq_bounds
        for p, batch in enumerate(value_batches):
            vals[b[p] : b[p + 1]] = batch
        self._hub = np.bincount(
            self._hits_src_idx, weights=vals[self._hits_edge_idx], minlength=self.csr.size
        ).astype(np.float64, copy=False)
        return float((self._hub * self._hub).sum())

    def hits_update_hub_local(self) -> float:
        """num_parts==1: the shard owns every vertex — skip the exchange."""
        return self.hits_update_hub(*(self._auth[ids - self.lo] for ids in self.hits_requests()))

    def hits_get_auth(self):
        return self.lo, self._auth

    def hits_get_hub(self):
        return self.lo, self._hub

    def hits_set(self, auth: np.ndarray, hub: np.ndarray):
        self._auth = np.asarray(auth, dtype=np.float64).copy()
        self._hub = np.asarray(hub, dtype=np.float64).copy()

    # ----------------- BFS hop distances (frontier min) ----------------- #
    # Same delta-frontier shape as connected components: only vertices
    # whose distance improved last superstep send (dist+1) along their
    # out-edges; sender-side segment-min combiner keeps the exchange at
    # O(unique dst) per partition pair.
    def bfs_init(self, source: int):
        self.dist = np.full(self.csr.size, self._I64MAX, dtype=np.int64)
        if self.lo <= source < self.hi:
            self.dist[source - self.lo] = 0
        self._bfs_changed = self.dist != self._I64MAX

    def bfs_scatter(self):
        vals_all = (np.where(self._bfs_changed, self.dist, self._I64MAX - 1) + 1)[self._r_src_idx]
        out = []
        for p in range(self.num_parts):
            s, e = self._route_bounds[p], self._route_bounds[p + 1]
            starts = self._seg_starts[p]
            if e > s and len(starts):
                mins = np.minimum.reduceat(vals_all[s:e], starts)
                live = mins != self._I64MAX
                out.append((self._seg_dsts[p][live], mins[live]))
            else:
                out.append((np.empty(0, np.int32), np.empty(0, np.int64)))
        return tuple(out)

    def bfs_gather(self, *partials) -> int:
        new = self.dist.copy()
        for dsts, mins in partials:
            if len(dsts):
                np.minimum.at(new, dsts, mins)
        self._bfs_changed = new < self.dist
        changed = int(self._bfs_changed.sum())
        self.dist = new
        return changed

    def bfs_gather_packed(self, packed) -> int:
        return self.bfs_gather(*packed)

    def bfs_get(self):
        return self.lo, self.dist

    def bfs_set(self, values: np.ndarray):
        self.dist = np.asarray(values, dtype=np.int64).copy()
        # conservative after resume: re-send every known distance once
        self._bfs_changed = self.dist != self._I64MAX

    # ------------- SSSP (synchronous weighted Bellman-Ford) ------------- #
    # Same delta-frontier shape as BFS, but the relaxation message is
    # dist[src] + w(src,dst) (min-combined per segment via the routed
    # weight array _r_w) and distances are float64. K rounds == min cost
    # over <=K-hop paths, which is what the unrolled SQL oracle computes.
    def sssp_init(self, source: int):
        if self._r_w is None:
            raise ValueError("sssp: needs a graph built with edge weights")
        if len(self.hub_vids):
            raise ValueError("sssp: needs full adjacency — build without split_threshold")
        self.sdist = np.full(self.csr.size, np.inf, dtype=np.float64)
        if self.lo <= source < self.hi:
            self.sdist[source - self.lo] = 0.0
        self._sssp_changed = np.isfinite(self.sdist)

    def sssp_scatter(self):
        vals_all = np.where(self._sssp_changed, self.sdist, np.inf)[self._r_src_idx] + self._r_w
        out = []
        for p in range(self.num_parts):
            s, e = self._route_bounds[p], self._route_bounds[p + 1]
            starts = self._seg_starts[p]
            if e > s and len(starts):
                mins = np.minimum.reduceat(vals_all[s:e], starts)
                live = np.isfinite(mins)
                out.append((self._seg_dsts[p][live], mins[live]))
            else:
                out.append((np.empty(0, np.int32), np.empty(0, np.float64)))
        return tuple(out)

    def sssp_gather(self, *partials) -> int:
        new = self.sdist.copy()
        for dsts, mins in partials:
            if len(dsts):
                np.minimum.at(new, dsts, mins)
        self._sssp_changed = new < self.sdist
        changed = int(self._sssp_changed.sum())
        self.sdist = new
        return changed

    def sssp_gather_packed(self, packed) -> int:
        return self.sssp_gather(*packed)

    def sssp_get(self):
        return self.lo, self.sdist

    def sssp_set(self, values: np.ndarray):
        self.sdist = np.asarray(values, dtype=np.float64).copy()
        self._sssp_changed = np.isfinite(self.sdist)

    # --------------------- k-core (synchronous peel) -------------------- #
    # Run on the undirected expansion (like cc/triangles). Each round
    # simultaneously removes alive vertices with residual degree < k and
    # routes per-dst decrement counts (segment sums over the removed
    # sources — message volume O(unique dst of removed), shrinking fast).
    def kcore_init(self, k: int):
        self._kc_k = int(k)
        self._kc_alive = np.ones(self.csr.size, dtype=bool)
        self._kc_deg = self.outdeg_full.astype(np.int64).copy()

    def kcore_scatter(self):
        """One peel round; last return is the local removed count (the
        termination Allreduce term — always P+1 >= 2 returns, so the
        num_returns=1 packing pitfall can't arise)."""
        removed = self._kc_alive & (self._kc_deg < self._kc_k)
        self._kc_alive[removed] = False
        n_rm = int(removed.sum())
        out = []
        if n_rm:
            per_edge = removed[self._r_src_idx].astype(np.int64)
        for p in range(self.num_parts):
            s, e = self._route_bounds[p], self._route_bounds[p + 1]
            starts = self._seg_starts[p]
            if n_rm and e > s and len(starts):
                sums = np.add.reduceat(per_edge[s:e], starts)
                live = sums > 0
                out.append((self._seg_dsts[p][live], sums[live]))
            else:
                out.append((np.empty(0, np.int32), np.empty(0, np.int64)))
        return (*out, n_rm)

    def kcore_gather(self, *partials):
        for dsts, decs in partials:
            if len(dsts):
                np.subtract.at(self._kc_deg, dsts, decs)

    def kcore_get(self):
        return self.lo, self._kc_alive.astype(np.int64)

    def kc_deg_get(self):
        return self.lo, self._kc_deg

    def kcore_set(self, alive: np.ndarray, deg: np.ndarray, k: int):
        self._kc_k = int(k)
        self._kc_alive = np.asarray(alive, dtype=np.int64).astype(bool)
        self._kc_deg = np.asarray(deg, dtype=np.int64).copy()


GraphShard = ray.remote(ShardCore)
