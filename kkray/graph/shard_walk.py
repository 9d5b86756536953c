"""WalkMixin — per-shard walker execution, mixed into ShardCore.

Re-expresses the reference's walk loops Ray-natively:

* first order (reference include/walk.hpp:891-1080): the *local-continue*
  inner loop is preserved — a walker keeps stepping inside the actor until
  it terminates or crosses a partition boundary (SURVEY.md §7.4 calls this
  essential; naive one-hop supersteps would be ~length x slower). All inner
  work is vectorized numpy over the shrinking active set; rejection retries
  (metapath) resample WITHOUT re-drawing the extension/termination test, so
  the sampled distribution matches the reference's retry semantics
  (walk.hpp:1030-1040).
* second order / node2vec (reference include/walk.hpp:1082-1381): a
  single-phase query-FORWARDING mesh — each superstep proposes with the
  lower/upper bound pre-acceptance shortcuts and the cand==prev /
  prev-is-local fast paths, local-continues accepted stayers, and forwards
  unresolved proposals (full walker row + dart) to the previous vertex's
  owner, which resolves the membership query RNG-free and routes the
  walker onward. The reference's stateQuery instead makes a
  respond+resolve round-trip (node2vec.hpp:155-166, walk.hpp:1361-1379);
  forwarding costs one routed hop, so the driver can pipeline supersteps
  back-to-back with pure dataflow chaining.

RNG: counter-based Philox keyed (seed, part, superstep, inner-iteration) —
deterministic replay for tests and resume (SURVEY.md §7.4), unlike the
reference's random_device seeding (util.hpp:45-70).

Samplers: ``cdf`` = global-cumulative searchsorted (O(log E), fully
vectorized); ``alias`` = per-vertex alias buckets (reference
init_alias_tables, walk.hpp:538-652) built once per walk_begin, O(1) draws.
Both sample candidates proportional to the static component.
"""
from __future__ import annotations

import numpy as np

from .partition import part_of
from ..utils import rng_for

_EMPTY = lambda: {"wid": np.empty(0, np.int64), "step": np.empty(0, np.int64), "cur": np.empty(0, np.int64)}
def _ragged_idx(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat gather positions for ragged rows: row i contributes
    starts[i] + [0..lens[i])."""
    tot = int(lens.sum())
    if tot == 0:
        return np.empty(0, np.int64)
    csum = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return np.repeat(starts - csum, lens) + np.arange(tot, dtype=np.int64)


def build_alias_tables(indptr: np.ndarray, w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-adjacency-slice Vose alias construction (reference
    walk.hpp:538-652 builds these in parallel C++; the old per-vertex
    Python loop was minutes of pure setup at 10^8 edges/shard).

    Exact closed form of the sequential sweep: serve smalls (scaled<1) in
    slice order from larges (scaled>=1) in slice order; a large keeps its
    residual when it falls below 1 and is topped up to exactly 1 by the
    NEXT large. Because every bucket then nets exactly 1, the cumulative
    mass larges supply to smalls through large j is exactly its excess
    prefix E_j — so small i's donor is the large whose (E_{j-1}, E_j]
    interval contains the small's exclusive deficit prefix, and large j's
    residual is E_j + 1 - (inclusive deficit prefix of the last small it
    served). Everything reduces to two cumsums + two searchsorteds over
    ALL slices at once.

    Returns (prob, alias) aligned with the edge arrays: sample a uniform
    bucket b in the vertex's slice, take b if r2 < prob[b] else alias[b].
    """
    E = len(w)
    prob = np.ones(E, dtype=np.float64)
    alias = np.arange(E, dtype=np.int64)
    if E == 0:
        return prob, alias
    w = np.asarray(w, dtype=np.float64)
    deg = np.diff(indptr)
    nv = len(deg)
    cw = np.empty(E + 1)
    cw[0] = 0.0
    np.cumsum(w, out=cw[1:])
    ssum = cw[indptr[1:]] - cw[indptr[:-1]]  # per-slice weight total
    sid = np.repeat(np.arange(nv, dtype=np.int64), deg)
    # per-slice scale factor (vertex-sized math, one edge-sized gather)
    nzdeg = deg > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(ssum > 0, deg / ssum, 0.0)
    scaled = w * inv[sid]
    if np.any(nzdeg & (ssum <= 0)):  # degenerate all-zero-weight slices
        scaled[inv[sid] == 0.0] = 1.0
    small = scaled < 1.0
    # float guard: a slice where rounding made EVERY entry <1 gets its last
    # edge promoted to large (exact arithmetic guarantees max >= mean = 1)
    scnt = np.bincount(sid[small], minlength=nv)
    bad = np.flatnonzero(nzdeg & (scnt == deg))
    if len(bad):
        small[indptr[bad + 1] - 1] = False
        scnt = np.bincount(sid[small], minlength=nv)
    lcnt = deg - scnt
    spos = np.flatnonzero(small)
    lpos = np.flatnonzero(~small)
    if len(spos) == 0:
        return prob, alias  # all slices uniform-ish: every bucket keeps 1
    soff = np.concatenate([[0], np.cumsum(scnt)]).astype(np.int64)
    loff = np.concatenate([[0], np.cumsum(lcnt)]).astype(np.int64)
    s_sid = sid[spos]
    l_sid = sid[lpos]
    # deficit / excess prefixes (global cumsum; per-slice restart is a
    # vertex-sized base vector, gathered once per edge-sized array)
    d0 = np.empty(len(spos) + 1)
    d0[0] = 0.0
    np.cumsum(1.0 - scaled[spos], out=d0[1:])
    e0 = np.empty(len(lpos) + 1)
    e0[0] = 0.0
    np.cumsum(scaled[lpos] - 1.0, out=e0[1:])
    base = e0[loff] - d0[soff]  # per-slice frame shift between the two lines
    # --- smalls: donor large = first j with E_j > exclusive deficit prefix.
    # (the base-shifted search value can round just below e0[loff], so both
    # clamps are needed for float safety)
    j = np.searchsorted(e0[1:], d0[:-1] + base[s_sid], side="right")
    j = np.clip(j, loff[s_sid], loff[s_sid + 1] - 1)
    prob[spos] = scaled[spos]
    alias[spos] = lpos[j]
    # --- larges: residual = E_rest + 1 - (incl. deficit prefix of last small
    # with exclusive prefix < E_rest); alias = next large in the slice
    cnt = np.searchsorted(d0[:-1], e0[1:] - base[l_sid], side="left")
    cnt = np.clip(cnt, soff[l_sid], soff[l_sid + 1])
    sbase = d0[soff[l_sid]]
    prob[lpos] = np.clip((e0[1:] - e0[loff[l_sid]]) + 1.0 - (d0[cnt] - sbase), 0.0, 1.0)
    nxt = np.minimum(np.arange(1, len(lpos) + 1, dtype=np.int64), loff[l_sid + 1] - 1)
    alias[lpos] = lpos[nxt]  # last large of a slice aliases itself
    return prob, alias


def _concat(batches: list[dict]) -> dict:
    if not batches:
        return {}
    keys = batches[0].keys()
    return {k: np.concatenate([b[k] for b in batches]) for k in keys}


# Broadcast-bundle mesh transport (r5). The per-target envelope API
# (walk_step / n2v_step) returns P+1 objects per sender per wave; small
# returns are funneled through the DRIVER's in-process store, so a wave
# moves O(P^2) driver-mediated objects — measured to dominate sharded-walk
# wall time at frontier scale (the r4 per-core gap). The _b variants
# instead return ONE target-major bundle per sender ({"data": columns,
# "_bounds": per-target offsets}) + a tiny meta dict; the driver
# broadcasts the same P bundle refs to every next-wave task, each receiver
# slices out rows [_bounds[me], _bounds[me+1]) zero-copy from the
# node-local plasma object. Per-target ARRAYS are byte-identical to the
# per-target transport, so keyed-RNG replay, checkpoints and the
# replicated/sharded parity fuzz are unaffected. Tail-sized bundles ride
# the driver path like any small return — still P objects, not P^2.


class WalkMixin:
    # ------------------------------------------------------------------ #
    def walk_begin(self, spec: dict, seed: int, collect_paths: bool = True):
        if len(getattr(self, "hub_vids", ())):
            raise ValueError(
                "walks need full adjacency per vertex: build the graph "
                "without split_threshold (heavy-vertex splitting is for the "
                "scatter-gather analytics; hub sampling is O(1) anyway)"
            )
        self._wspec = spec
        self._wseed = int(seed)
        self._collect = collect_paths
        # opt-in actor-side kernel profiler (KKRAY_WALK_PROF=1): cProfile
        # around every step call, dumped via walk_prof_stats() — debug
        # tooling only, zero cost when unset
        self._prof = None
        mode = __import__("os").environ.get("KKRAY_WALK_PROF")
        if mode:
            import cProfile

            self._prof = cProfile.Profile()
            if mode == "all":
                # whole-process mode: capture Ray's python-side task loop
                # (arg deserialization, return serialization) too; stays on
                # until walk_prof_stats() is called
                self._prof.enable()
                self._prof_all = True
            else:
                self._prof_all = False
        self._fp: list[tuple] = []  # footprint chunks (wid, step, vertex)
        self._final: list[tuple] = []  # (wid, step, wstate) at termination — the reference's COLLECT_WALKER_INIT_STATE test hook (walk.hpp:1383-1456)
        self._nsteps = 0  # walked edges accepted on this shard (bench metric)
        self._frontier: dict = {}
        self._pending = None  # checkpoint-restored in-flight batch (consumed before new incoming)
        self._pending_q = None  # checkpoint-restored in-flight forwarded queries (second order)
        self._pending_adj = None  # checkpoint-restored piggybacked adjacency (flat, aligned with _pending)
        self._wave_comp = None  # this wave's piggybacked-adjacency composite
        kind = spec["kind"]
        if spec.get("weighted"):
            w = self.csr.weights
            if w is None:
                raise ValueError("weighted walk on an unweighted graph")
            if self.csr.wext is not None:
                self._wext = self.csr.wext  # shared precompute (zero-copy)
            elif getattr(self, "_wext_cache", None) is None:
                self._wext = np.concatenate([[0.0], np.cumsum(w, dtype=np.float64)])
                self._wext_cache = self._wext  # reuse across walks on this actor
            else:
                self._wext = self._wext_cache
            if spec.get("sampler") == "alias":
                if getattr(self, "_alias_cache", None) is None:
                    self._build_alias(w)
                    self._alias_cache = (self._alias_prob, self._alias_idx)
                else:
                    self._alias_prob, self._alias_idx = self._alias_cache
        if kind == "node2vec":
            # O(1) hash membership probes; no-op when prebuilt (pool path)
            self.csr.precompute_edge_hash()
        if kind == "custom":
            # per-vertex dcomp bound ARRAYS (reference dcomp_upperbound /
            # lowerbound filled from upperbound_func(v, adj),
            # walk.hpp:499-536): a callable bound is evaluated ONCE per
            # shard over the owned vertex range; scalars broadcast as-is
            vids = np.arange(self.lo, self.hi, dtype=np.int64)
            ub = spec.get("dynamic_ub")
            lb = spec.get("dynamic_lb", 0.0)
            self._cub = (
                np.asarray(ub(vids, self.outdeg), dtype=np.float64) if callable(ub) else ub
            )
            self._clb = (
                np.asarray(lb(vids, self.outdeg), dtype=np.float64) if callable(lb) else lb
            )
        if kind == "mh":
            # Metropolis-Hastings uniform-target chain (SURVEY.md §2.4's
            # "Metropolis-Hastings-style rejection sampling" as a
            # first-class app): uniform neighbour proposal + acceptance
            # min(1, deg(u)/deg(v)). Needs deg(v) per adjacency edge —
            # locally available when this shard owns every vertex
            # (num_parts==1 / WalkerPool), else filled by the engine's
            # routed degree exchange (mh_deg_requests/deg_lookup/mh_build,
            # same join shape as the triangle orientation).
            if spec.get("weighted"):
                raise ValueError("mh walk: uniform proposal only (unweighted graph required)")
            if self.num_parts == 1:
                self._mh_dstdeg = None  # lookup outdeg_full directly
        if kind == "metapath":
            et = self.csr.etypes
            if et is None:
                raise ValueError("metapath walk needs etype column")
            vmask = np.zeros(self.csr.size, dtype=np.int64)
            src_idx = np.repeat(np.arange(self.csr.size, dtype=np.int64), self.outdeg)
            np.bitwise_or.at(vmask, src_idx, np.int64(1) << et.astype(np.int64))
            self._vtypemask = vmask
            schemes = spec["schemes"]
            self._scheme_len = np.array([len(s) for s in schemes], dtype=np.int64)
            self._scheme_off = np.concatenate([[0], np.cumsum(self._scheme_len)]).astype(np.int64)
            self._scheme_masks = np.array([m for s in schemes for m in s], dtype=np.int64)
        return True

    def _build_alias(self, w: np.ndarray):
        """Alias tables over all adjacency slices in one vectorized pass
        (see build_alias_tables)."""
        self._alias_prob, self._alias_idx = build_alias_tables(self.csr.indptr, w)

    # ------------------------------------------------------------------ #
    def walk_seed(self, walkers: dict):
        """Ingest initial walkers (already routed to this part); record the
        step-0 footprints (reference seeds footprints at init,
        walk.hpp:815-822)."""
        walkers = {k: np.asarray(v) for k, v in walkers.items()}
        if self._collect and len(walkers["wid"]):
            self._fp.append((walkers["wid"].copy(), walkers["step"].copy(), walkers["cur"].copy()))
        self._frontier = walkers
        return int(len(walkers["wid"]))

    def _take_frontier(self, incoming) -> dict:
        batches = [b for b in incoming if b is not None and len(b.get("wid", ()))]
        # checkpoint-restored in-flight batch goes right after the frontier
        # (the position the live refs would have occupied) so the
        # concatenated arrays — and therefore the positional RNG draws —
        # are bit-identical to the uninterrupted run
        if self._pending is not None:
            if len(self._pending.get("wid", ())):
                batches.insert(0, self._pending)
            self._pending = None
        if self._frontier and len(self._frontier.get("wid", ())):
            batches.insert(0, self._frontier)
        self._frontier = {}
        return _concat(batches)

    def walk_ingest(self, *incoming) -> int:
        """Merge in-flight walker batches into the frontier WITHOUT
        stepping. Preserves frontier-first concatenation order so replayed
        keyed RNG streams stay bit-identical."""
        W = self._take_frontier(incoming)
        self._frontier = W if W else {}
        return int(len(self._frontier.get("wid", ())))

    def walk_ckpt_dump(self, nw: int = 0, *incoming):
        """PURE-SNAPSHOT checkpoint: serialize (frontier, in-flight walker
        batches, footprints, finals, in-flight forwarded queries) WITHOUT
        mutating any state — the continuing run is bit-identical to one
        that never checkpointed. ``incoming`` = ``nw`` walker batches
        addressed to this shard followed by any number of second-order
        query batches (full parked rows, darts included); queries dump
        under "parked" and resume as shard-side pending queries, resolved
        RNG-free exactly as the uninterrupted run would have."""
        import pyarrow as pa

        nw = int(nw)
        incoming = [self._slice_mine(b) for b in incoming]
        fr = self._frontier if self._frontier else {}
        fr_tbl = pa.table({k: pa.array(np.asarray(v)) for k, v in fr.items()})
        pend_batches = [b for b in incoming[:nw] if b is not None and len(b.get("wid", ()))]
        if self._pending is not None and len(self._pending.get("wid", ())):
            pend_batches.insert(0, self._pending)  # not yet consumed: keep its slot
        pend = _concat(pend_batches)
        # ragged piggybacked adjacency is NOT row-aligned: own table
        padj = pend.pop("padj", None) if pend else None
        padj_tbl = pa.table({"adj": pa.array(np.asarray(padj if padj is not None else np.empty(0, np.int64)))})
        pend_tbl = pa.table({k: pa.array(np.asarray(v)) for k, v in pend.items()}) if pend else pa.table({})
        w, s, v = self.walk_footprints()
        fp_tbl = pa.table({"wid": pa.array(w), "step": pa.array(s), "vertex": pa.array(v)})
        fw, fs, fstate = self.walk_final_states()
        fin_tbl = pa.table({"wid": pa.array(fw), "step": pa.array(fs), "wstate": pa.array(fstate)})
        q_batches = [b for b in incoming[nw:] if b is not None and len(b.get("wid", ()))]
        if self._pending_q is not None and len(self._pending_q.get("wid", ())):
            q_batches.insert(0, self._pending_q)
        qk = _concat(q_batches)
        if qk:
            pk_tbl = pa.table({k: pa.array(np.asarray(qk[k])) for k in ("wid", "step", "cur", "prev", "cand", "dart")})
        else:
            pk_tbl = pa.table({})
        return {
            "frontier": fr_tbl,
            "pending": pend_tbl,
            "pending_adj": padj_tbl,
            "footprints": fp_tbl,
            "finals": fin_tbl,
            "parked": pk_tbl,
        }, self._nsteps

    def n2v_ckpt_dump(self, *batches):
        """Second-order checkpoint: take the in-flight envelopes addressed
        to this shard, split plain walkers (cand < 0) from forwarded
        queries, and dump via the shared snapshot path (walkers under
        "pending" with their piggybacked adjacency under "pending_adj",
        queries under "parked")."""
        inc = _concat(
            [b for b in (self._slice_mine(x) for x in batches) if b is not None and len(b.get("wid", ()))]
        )
        wb, qb = [], []
        if inc and len(inc.get("wid", ())):
            is_q = inc["cand"] >= 0
            w_m = ~is_q
            if w_m.any():
                rows = {k: inc[k][w_m] for k in ("wid", "step", "cur", "prev", "pdeg")}
                starts = np.concatenate([[0], np.cumsum(inc["pdeg"])[:-1]])
                rows["padj"] = inc["padj"][_ragged_idx(starts[w_m], rows["pdeg"])]
                wb.append(rows)
            if is_q.any():
                qb.append({k: v[is_q] for k, v in inc.items() if k not in ("pdeg", "padj")})
        return self.walk_ckpt_dump(len(wb), *wb, *qb)

    def walk_ckpt_restore(self, tables: dict, nsteps: int) -> tuple:
        """Restore walk state; returns (frontier+pending rows, parked rows)
        so the driver can rebuild its active set."""
        fr = tables["frontier"]
        if fr.num_rows or fr.num_columns:
            self._frontier = {
                name: fr.column(name).to_numpy(zero_copy_only=False).copy() for name in fr.column_names
            }
        else:
            self._frontier = {}
        self._pending = None
        pend = tables.get("pending")
        if pend is not None and pend.num_rows:
            self._pending = {
                name: pend.column(name).to_numpy(zero_copy_only=False).copy() for name in pend.column_names
            }
        fp = tables["footprints"]
        self._fp = (
            [tuple(fp.column(c).to_numpy(zero_copy_only=False).copy() for c in ("wid", "step", "vertex"))]
            if fp.num_rows
            else []
        )
        fin = tables["finals"]
        self._final = (
            [tuple(fin.column(c).to_numpy(zero_copy_only=False).copy() for c in ("wid", "step", "wstate"))]
            if fin.num_rows
            else []
        )
        self._nsteps = int(nsteps)
        self._pending_adj = None
        pa_t = tables.get("pending_adj")
        if pa_t is not None and pa_t.num_rows:
            self._pending_adj = pa_t.column("adj").to_numpy(zero_copy_only=False).copy()
        self._pending_q = None
        work = int(len(self._frontier.get("wid", ()))) + (
            int(len(self._pending.get("wid", ()))) if self._pending else 0
        )
        pk = tables.get("parked")
        if pk is not None and pk.num_rows:
            # in-flight forwarded queries addressed to this shard: resolved
            # RNG-free at the next n2v_step, like the live refs would be
            self._pending_q = {
                c: pk.column(c).to_numpy(zero_copy_only=False).copy() for c in pk.column_names
            }
            return work, int(pk.num_rows)
        return work, 0

    # --------------- Metropolis-Hastings degree exchange ---------------- #
    # The MH acceptance min(1, deg(u)/deg(v)) needs the CANDIDATE's degree,
    # which is remote under vertex sharding. Same routed degree join as the
    # triangle orientation (shard.py tri_deg_requests/tri_deg_lookup):
    # request unique out-neighbour degrees from their owners once per walk,
    # scatter into a per-edge array aligned with csr.indices — O(E/P) int32
    # per shard, no dense O(V) structure anywhere.
    def mh_deg_requests(self):
        """Unique out-neighbour ids bucketed by owner partition."""
        dst = self.csr.indices
        uniq = np.unique(dst)
        parts = part_of(uniq, self.boundaries)
        bounds = np.searchsorted(parts, np.arange(self.num_parts + 1))
        self._mh_uniq = uniq  # sorted -> contiguous owner buckets
        self._mh_uniq_bounds = bounds
        return tuple(uniq[bounds[p] : bounds[p + 1]] for p in range(self.num_parts))

    def deg_lookup(self, *id_batches):
        """Answer degree queries for owned vertex ids — O(query), not O(V)."""
        return tuple(self.outdeg_full[np.asarray(ids, dtype=np.int64) - self.lo] for ids in id_batches)

    def mh_build(self, *deg_batches):
        """Scatter neighbour degrees (responses aligned with
        mh_deg_requests buckets) into the per-edge dst-degree array."""
        uniq = self._mh_uniq
        udeg = np.empty(len(uniq), dtype=np.int64)
        b = self._mh_uniq_bounds
        for p, batch in enumerate(deg_batches):
            udeg[b[p] : b[p + 1]] = batch
        self._mh_dstdeg = udeg[np.searchsorted(uniq, self.csr.indices)].astype(np.int32)
        del self._mh_uniq, self._mh_uniq_bounds
        return int(len(self._mh_dstdeg))

    def _sample(self, cur_local: np.ndarray, rng) -> np.ndarray:
        """Candidate CSR positions ~ static component."""
        deg = self.outdeg[cur_local]
        r = rng.random(len(cur_local))
        base = self.csr.indptr[cur_local]
        if not self._wspec.get("weighted"):
            return base + np.minimum((r * deg).astype(np.int64), deg - 1)
        if self._wspec.get("sampler") == "alias":
            bucket = base + np.minimum((r * deg).astype(np.int64), deg - 1)
            r2 = rng.random(len(cur_local))
            return np.where(r2 < self._alias_prob[bucket], bucket, self._alias_idx[bucket])
        lo_w = self._wext[base]
        hi_w = self._wext[self.csr.indptr[cur_local + 1]]
        target = lo_w + r * (hi_w - lo_w)
        pos = np.searchsorted(self._wext, target, side="right") - 1
        return np.clip(pos, base, self.csr.indptr[cur_local + 1] - 1)

    # ---------------------- first-order superstep ---------------------- #
    # transport columns provably bounded by v_num / length / adj_cap: these
    # ship as int32 whenever the graph fits 31 bits (wid additionally
    # max-checked per bundle — walker counts aren't known shard-side).
    # Values round-trip int64 -> int32 -> int64 exactly, so keyed-RNG
    # replay, checkpoints and parity stay bit-identical; the win is HALF
    # the mesh bytes — plasma put + page-zeroing traffic on one box, NIC
    # bytes on a real cluster. dart stays float64 (acceptance compares
    # must be exact); unknown columns (custom walk state) ship unchanged.
    _XPORT32 = ("step", "cur", "prev", "cand", "pdeg", "padj")

    def _transport_downcast(self, data: dict | None) -> dict | None:
        if data is None or self.v_num >= (1 << 31):
            return data
        out = {}
        for k, v in data.items():
            if v.dtype == np.int64 and (
                k in self._XPORT32
                or (k == "wid" and (len(v) == 0 or int(v.max()) < (1 << 31)))
            ):
                v = v.astype(np.int32)
            out[k] = v
        return out

    def _slice_mine(self, b):
        """Incoming may be a broadcast bundle addressed to ALL shards:
        slice out the rows addressed to this one (zero-copy views into the
        node-local plasma buffer; int32 transport columns upcast back to
        int64 — the only per-receiver copy). Plain dict envelopes pass
        through."""
        if not isinstance(b, dict) or "_bounds" not in b:
            return b
        s, e = int(b["_bounds"][self.part_id]), int(b["_bounds"][self.part_id + 1])
        if e <= s:
            return None
        env = {
            k: (v[s:e].astype(np.int64) if v.dtype == np.int32 else v[s:e])
            for k, v in b["data"].items()
        }
        if "padj" in b:
            ao = b["_padj_off"]
            pa_sl = b["padj"][int(ao[s]) : int(ao[e])]
            env["padj"] = pa_sl.astype(np.int64) if pa_sl.dtype == np.int32 else pa_sl
        return env

    def walk_step_b(self, superstep: int, *bundles):
        """Broadcast-bundle superstep: same kernel as walk_step, but takes
        every sender's full bundle (slicing out this shard's rows) and
        returns (bundle, meta) — 2 objects per sender per wave, not P+1."""
        out, meta = self._walk_step_core(superstep, [self._slice_mine(b) for b in bundles])
        present = [p for p, s in enumerate(meta["sizes"]) if s]
        if not present:
            return None, meta
        keys = list(out[present[0]].keys())
        data = {k: np.concatenate([out[p][k] for p in present]) for k in keys}
        bounds = np.concatenate([[0], np.cumsum(meta["sizes"])]).astype(np.int64)
        return {"data": self._transport_downcast(data), "_bounds": bounds}, meta

    def walk_step(self, superstep: int, *incoming):
        """Process all local walkers to termination or emigration.
        Returns P per-partition emigrant batches + moved count."""
        out, meta = self._walk_step_core(superstep, incoming)
        return (*out, meta)

    def _walk_step_core(self, superstep: int, incoming):
        spec = self._wspec
        kind = spec["kind"]
        W = self._take_frontier(incoming)
        out_chunks: list[list[dict]] = [[] for _ in range(self.num_parts)]
        if not W:
            return (
                [_EMPTY() for _ in range(self.num_parts)],
                {"moved": 0, "sizes": [0] * self.num_parts},
            )
        wid, step, cur = W["wid"], W["step"], W["cur"]
        # optional walker-state columns that travel with the walker
        ex = {k: W[k] for k in ("scheme", "mstate", "prev", "wstate") if k in W}
        need_ext = np.ones(len(wid), dtype=bool)
        inner = 0
        moved = 0
        while len(wid):
            rng = rng_for(self._wseed, self.part_id + self.seed, superstep, inner)
            cur_local = cur - self.lo
            deg = self.outdeg[cur_local]
            alive = deg > 0  # degree-0 termination (reference walk.hpp:956-960)
            if kind in ("truncated", "mh"):
                alive &= step < spec["length"]
            elif kind == "geometric":
                draw = rng.random(len(wid))
                alive &= np.where(need_ext, draw < spec["alpha"], True)
            elif kind == "metapath":
                alive &= step < spec["length"]
                allowed = self._scheme_masks[self._scheme_off[ex["scheme"]] + ex["mstate"]]
                alive &= (self._vtypemask[cur_local] & allowed) != 0
            elif kind == "custom":
                alive &= step < spec["length"]
                if spec.get("extension_fn") is not None:
                    cont = spec["extension_fn"](step, cur)
                    draw = rng.random(len(wid))
                    alive &= np.where(need_ext, draw < cont, True)
            # note: rows with need_ext=False (rejection retries) already
            # passed this superstep's extension test — geometric/custom don't
            # re-draw for them, preserving the retry distribution
            if not alive.all():
                keep = alive
                if "wstate" in ex:
                    dead = ~alive
                    self._final.append((wid[dead].copy(), step[dead].copy(), ex["wstate"][dead].copy()))
                wid, step, cur = wid[keep], step[keep], cur[keep]
                need_ext = need_ext[keep]
                ex = {k: v[keep] for k, v in ex.items()}
                if not len(wid):
                    break
                cur_local = cur - self.lo
            pos = self._sample(cur_local, rng)
            cand = self.csr.indices[pos]
            if kind == "mh":
                # MH acceptance: accept v w.p. min(1, deg(u)/deg(v)) — i.e.
                # r*deg(v) <= deg(u); REJECT = STAY (the chain re-emits u and
                # the step still counts). Staying — not resampling — is what
                # makes the stationary distribution uniform; the engine's
                # resample-rejection would instead draw v ∝ min(1,deg u/deg v).
                du = self.outdeg[cur_local]
                dv = (
                    self._mh_dstdeg[pos]
                    if self._mh_dstdeg is not None
                    else self.outdeg_full[cand - self.lo]
                )
                acc = rng.random(len(wid)) * dv <= du
                cand = np.where(acc, cand, cur)
                ok = np.ones(len(wid), dtype=bool)
            elif kind == "metapath":
                allowed = self._scheme_masks[self._scheme_off[ex["scheme"]] + ex["mstate"]]
                ok = ((np.int64(1) << self.csr.etypes[pos].astype(np.int64)) & allowed) != 0
            elif kind == "custom" and spec.get("dynamic_fn") is not None:
                # rejection with bounds (reference walk.hpp:1030-1040):
                # dart = r*ub; pre-accept when dart<=lb, else evaluate
                # hook. ub/lb may be per-vertex arrays (indexed at cur).
                ub = self._cub[cur_local] if isinstance(self._cub, np.ndarray) else self._cub
                lb = self._clb[cur_local] if isinstance(self._clb, np.ndarray) else self._clb
                dart = rng.random(len(wid)) * ub
                ok = dart <= lb
                rest = ~ok
                if rest.any():
                    prev_arr = ex["prev"] if "prev" in ex else np.full(len(wid), -1, dtype=np.int64)
                    ws_arr = ex["wstate"] if "wstate" in ex else np.zeros(len(wid), dtype=np.int64)
                    dyn = spec["dynamic_fn"](step[rest], cur[rest], cand[rest], prev_arr[rest], ws_arr[rest])
                    ok[rest] = dart[rest] <= dyn
            else:
                ok = np.ones(len(wid), dtype=bool)
            # accepted rows advance; rejected retry next inner iteration
            a = ok

            def advanced_ex(mask2):
                """walker-state columns after an accepted step for rows a&mask2."""
                outx = {}
                if "scheme" in ex:
                    sa = ex["scheme"][a][mask2]
                    outx["scheme"] = sa
                    outx["mstate"] = (ex["mstate"][a][mask2] + 1) % self._scheme_len[sa]
                if "prev" in ex:
                    outx["prev"] = cur[a][mask2]
                if "wstate" in ex:
                    fn = spec.get("state_update_fn")
                    ws = ex["wstate"][a][mask2]
                    if fn is not None:
                        ws = fn(ws, step[a][mask2], cur[a][mask2], cand[a][mask2])
                    outx["wstate"] = ws
                return outx

            if a.any():
                wid_a, cand_a = wid[a], cand[a]
                step_a = step[a] + 1
                self._nsteps += int(len(wid_a))
                if self._collect:
                    self._fp.append((wid_a.copy(), step_a.copy(), cand_a.copy()))
                cpart = part_of(cand_a, self.boundaries)
                stay = cpart == self.part_id
                if (~stay).any():
                    mov = ~stay
                    moved += int(mov.sum())
                    # ONE target-sorted gather per column, then per-target
                    # chunks are zero-copy slices — row order is identical
                    # to the old mask-then-permute double index (same
                    # stable argsort), so transport stays byte-identical
                    midx = np.flatnonzero(mov)
                    mp = cpart[midx]
                    order = np.argsort(mp, kind="stable")
                    midx = midx[order]
                    bounds = np.searchsorted(mp[order], np.arange(self.num_parts + 1))
                    wid_s, step_s, cur_s = wid_a[midx], step_a[midx], cand_a[midx]
                    exm = advanced_ex(midx)
                    for p in range(self.num_parts):
                        s, e = bounds[p], bounds[p + 1]
                        if e > s:
                            chunk = {
                                "wid": wid_s[s:e],
                                "step": step_s[s:e],
                                "cur": cur_s[s:e],
                            }
                            for k, v in exm.items():
                                chunk[k] = v[s:e]
                            out_chunks[p].append(chunk)
                # stayers continue the local loop
                ns = stay
                new_wid = wid_a[ns]
                new_step = step_a[ns]
                new_cur = cand_a[ns]
                new_ex = advanced_ex(ns)
            else:
                new_wid = np.empty(0, np.int64)
                new_step = new_cur = new_wid
                new_ex = {k: np.empty(0, v.dtype) for k, v in ex.items()}
            r = ~a
            if not r.any():
                # no rejections (the truncated/geometric common case):
                # stayers ARE the next round's population — skip the
                # rebuild concatenates
                wid, step, cur, ex = new_wid, new_step, new_cur, new_ex
                need_ext = np.ones(len(new_wid), dtype=bool)
            else:
                wid = np.concatenate([new_wid, wid[r]])
                step = np.concatenate([new_step, step[r]])
                cur = np.concatenate([new_cur, cur[r]])
                need_ext = np.concatenate([np.ones(len(new_wid), dtype=bool), np.zeros(int(r.sum()), dtype=bool)])
                ex = {k: np.concatenate([new_ex[k], ex[k][r]]) for k in ex}
            inner += 1
        out = []
        for p in range(self.num_parts):
            out.append(_concat(out_chunks[p]) if out_chunks[p] else _EMPTY())
        # sizes let the driver prune empty refs: tail supersteps with a
        # handful of live walkers touch only the shards that hold them
        # (the reference's small-frontier "light mode", constants.hpp:41)
        return out, {"moved": moved, "sizes": [int(len(c["wid"])) for c in out]}

    # ---------------------- second order (node2vec) --------------------- #
    def n2v_step(self, superstep: int, *batches):
        """Single-phase second-order superstep (query-FORWARDING mesh).

        Each element of ``batches`` is one sender's envelope addressed to
        THIS shard: columns (wid, step, cur, prev, cand, dart), or None.
        Rows with ``cand >= 0`` are forwarded membership QUERIES (full
        parked walker + proposal + dart, routed here because this shard
        owns ``prev``); they resolve RNG-free with one membership probe —
        accepted walkers re-enter the stream toward part(cand) (or join
        this call's propose loop when cand is local), rejected ones route
        back to part(cur) for an iid re-proposal. Rows with ``cand < 0``
        are plain in-flight walkers. Then the local-continue propose loop
        runs over (frontier + walker rows + query-accepted stayers).

        This replaces the reference's three-phase stateQuery mesh
        (walk.hpp:1082-1381, node2vec.hpp:155-166): a parked walker costs
        ONE forwarded hop instead of a driver-mediated respond+stepB
        round-trip, so a superstep is a single task wave of P tasks with
        per-target envelope returns that the driver pipelines back-to-back
        as pure dataflow. Per-target refs let Ray pick the transport per
        batch size: tail-sized batches ride inline in the task spec,
        frontier-sized ones go through plasma by reference.

        Returns (P per-target envelopes..., counts)."""
        return self._n2v_emit(self._n2v_step_core(superstep, batches))

    def _n2v_step_core(self, superstep: int, batches):
        spec = self._wspec
        P = self.num_parts
        counts = {"moved": 0, "parked": 0, "n_out": 0}
        # (rows, target, pdeg, padj) chunks accumulated across query
        # resolution and the propose loop; routed into per-target
        # envelopes at the end (pdeg/padj = the piggybacked prev-adjacency)
        w_out: list[tuple] = []
        moved = 0
        inv_p, inv_q = 1.0 / spec["p"], 1.0 / spec["q"]
        adj_cap = int(spec.get("adj_cap", 0))
        # ---- assemble the wave: population rows + adjacency composite ----
        # population order is deterministic (frontier, checkpoint-restored
        # pending, live incoming walkers ascending sender, query-accept
        # stayers) so keyed RNG streams replay bit-identically on resume.
        # aseg = row id into this wave's piggybacked-adjacency composite
        # (-1: none; such rows fall back to bounds / local-prev / parking).
        pop: list[tuple[dict, np.ndarray]] = []
        comp_parts: list[np.ndarray] = []
        seg_base = 0
        fr = self._frontier if self._frontier and len(self._frontier.get("wid", ())) else None
        self._frontier = {}
        if fr is not None:
            pop.append(
                ({k: fr[k] for k in ("wid", "step", "cur", "prev")}, np.full(len(fr["wid"]), -1, np.int64))
            )
        pend, self._pending = self._pending, None
        pend_adj, self._pending_adj = getattr(self, "_pending_adj", None), None
        if pend is not None and len(pend.get("wid", ())):
            npnd = len(pend["wid"])
            pdeg_p = pend.get("pdeg")
            if pdeg_p is None:
                pdeg_p = np.zeros(npnd, np.int64)
            aseg_p = np.where(pdeg_p > 0, np.arange(npnd, dtype=np.int64), -1)
            pop.append(({k: pend[k] for k in ("wid", "step", "cur", "prev")}, aseg_p))
            if pend_adj is not None and len(pend_adj):
                seg = np.repeat(np.arange(npnd, dtype=np.uint64), pdeg_p)
                comp_parts.append((seg << np.uint64(32)) | pend_adj.astype(np.uint64))
            seg_base = npnd
        inc = _concat([b for b in batches if b is not None and len(b.get("wid", ()))])
        q_in = []
        if inc and len(inc.get("wid", ())):
            n_inc = len(inc["wid"])
            if len(inc.get("padj", ())):
                seg = np.repeat(np.arange(n_inc, dtype=np.uint64) + np.uint64(seg_base), inc["pdeg"])
                comp_parts.append((seg << np.uint64(32)) | inc["padj"].astype(np.uint64))
            is_q = inc["cand"] >= 0
            if is_q.any():
                q_in.append({k: v[is_q] for k, v in inc.items() if k != "padj"})
            w_m = ~is_q
            if w_m.any():
                aseg_w = np.where(
                    inc["pdeg"][w_m] > 0, np.flatnonzero(w_m).astype(np.int64) + seg_base, -1
                )
                pop.append(({k: inc[k][w_m] for k in ("wid", "step", "cur", "prev")}, aseg_w))
        self._wave_comp = np.concatenate(comp_parts) if comp_parts else None
        if self._pending_q is not None:
            if len(self._pending_q.get("wid", ())):
                q_in.insert(0, self._pending_q)  # checkpoint-restored in-flight queries
            self._pending_q = None
        # ---- resolve forwarded queries (prev is owned here): RNG-free ----
        stay_rows = None
        if q_in:
            Q = _concat(q_in)
            member = self.csr.contains_edges(Q["prev"] - self.lo, Q["cand"])
            dyn = np.where(member, 1.0, inv_q)
            acc = Q["dart"] <= dyn
            if acc.any():
                wid_a = Q["wid"][acc]
                step_a = Q["step"][acc] + 1
                cand_a = Q["cand"][acc]
                prev_a = Q["cur"][acc]
                self._nsteps += int(len(wid_a))
                if self._collect:
                    self._fp.append((wid_a.copy(), step_a.copy(), cand_a.copy()))
                cpart = part_of(cand_a, self.boundaries)
                stay = cpart == self.part_id
                mov = ~stay
                if mov.any():
                    moved += int(mov.sum())
                    w_out.append(
                        (
                            {"wid": wid_a[mov], "step": step_a[mov], "cur": cand_a[mov], "prev": prev_a[mov]},
                            cpart[mov],
                            None,
                            None,
                        )
                    )
                if stay.any():
                    stay_rows = {"wid": wid_a[stay], "step": step_a[stay], "cur": cand_a[stay], "prev": prev_a[stay]}
            rej = ~acc
            if rej.any():
                # retry at cur with a fresh iid proposal — cur's owner is
                # the shard that parked this walker (never this one:
                # local-prev rows resolve inline and never park). prev is
                # OURS, so piggyback its adjacency: the retry then resolves
                # locally at the parker instead of bouncing back here.
                moved += int(rej.sum())
                r_pdeg, r_padj = self._adj_for(Q["prev"][rej] - self.lo, adj_cap)
                w_out.append(
                    (
                        {"wid": Q["wid"][rej], "step": Q["step"][rej], "cur": Q["cur"][rej], "prev": Q["prev"][rej]},
                        part_of(Q["cur"][rej], self.boundaries),
                        r_pdeg,
                        r_padj,
                    )
                )
        # ---- local propose loop population ----
        if stay_rows is not None:
            pop.append((stay_rows, np.full(len(stay_rows["wid"]), -1, np.int64)))
        if not pop:
            return self._n2v_pack(w_out, [], counts, moved)
        W = _concat([r for r, _ in pop])
        aseg = np.concatenate([a for _, a in pop])
        if not len(W.get("wid", ())):
            return self._n2v_pack(w_out, [], counts, moved)
        wid, step, cur, prev = W["wid"], W["step"], W["cur"], W["prev"]
        n = len(wid)
        # in-superstep LOCAL-CONTINUE loop (the reference's local-continue
        # extended to second order — walk.hpp:1056-1063 plus the
        # retry-until-accept loop walk.hpp:1030-1040, 1361-1364): a
        # resolved-rejected walker re-proposes immediately, and an ACCEPTED
        # walker whose candidate stays on this shard keeps stepping in the
        # SAME actor call — its new prev (= old cur) is by construction
        # shard-local, so every subsequent accept/reject is locally
        # decidable; a walker leaves the loop only by emigrating, parking
        # on a remote-prev membership probe, or terminating. Proposals are
        # iid, so the sampled distribution is unchanged; this removes the
        # one-driver-round-per-accepted-step latency that dominated the
        # sharded node2vec benches.
        park_rows: list[tuple] = []
        # outlier-appendix mode (reference node2vec.hpp:47-106 +
        # walk.hpp:981-1014): when 1/p exceeds ub2 = max(1, 1/q), don't
        # fold 1/p into the rejection bound — give the single return edge
        # an appendix area of (1/p - ub2) beside the regular deg*ub2 area.
        # A dart in the appendix proposes the return edge directly (accept
        # iff cur->prev exists locally — the adjacency being sampled is
        # local, so this needs no remote query); a regular dart yields
        # (candidate idx, height) from ONE draw: idx = r // ub2,
        # height = r mod ub2. Cuts the rejection rate by up to
        # 1/p / max(1,1/q) on return-biased walks (paper Table 5b: 2.4x).
        inv_p, inv_q = 1.0 / spec["p"], 1.0 / spec["q"]
        ub2 = max(1.0, inv_q)
        overflow = inv_p - ub2
        use_app = overflow > 0 and spec.get("appendix", True)
        weighted = bool(spec.get("weighted"))
        rnd = 0
        while n:
            rng = rng_for(self._wseed, self.part_id + self.seed, superstep, rnd + 1)
            cur_local = cur - self.lo
            # continued walkers re-check termination (dead end / full length)
            alive = (self.outdeg[cur_local] > 0) & (step < spec["length"])
            if not alive.all():
                wid, step, cur, prev = wid[alive], step[alive], cur[alive], prev[alive]
                aseg = aseg[alive]
                n = len(wid)
                if n == 0:
                    break
                cur_local = cur - self.lo
            if use_app and not weighted:
                degf = self.outdeg[cur_local].astype(np.float64)
                ovf = np.where(prev >= 0, overflow, 0.0)  # no return edge at step 0
                r = rng.random(n) * (degf * ub2 + ovf)
                in_app = r >= degf * ub2
                idx = np.minimum((r / ub2).astype(np.int64), self.outdeg[cur_local] - 1)
                pos = self.csr.indptr[cur_local] + idx
                cand = self.csr.indices[pos]
                dart = r - idx * ub2
                accept, resolved = self._n2v_resolve(prev, cand, dart, aseg)
                if in_app.any():
                    # appendix: candidate IS the return edge; residual dart
                    # lands in [ub2, 1/p) < dyn(return)=1/p, so accept iff
                    # the edge cur->prev actually exists
                    cand[in_app] = prev[in_app]
                    accept[in_app] = self.csr.contains_edges(cur_local[in_app], prev[in_app])
                    resolved[in_app] = True
            elif use_app and weighted:
                # weighted outlier-appendix (reference node2vec.hpp:66-84):
                # appendix area = w(cur->prev) * (1/p - ub2), located via
                # the composite-key searchsorted (the reference's
                # lower_bound on the dst-sorted adjacency) — gives the edge
                # INDEX so its weight can be read, unlike the hash probe.
                base = self.csr.indptr[cur_local]
                end = self.csr.indptr[cur_local + 1]
                wlo = self._wext[base]
                wtot = self._wext[end] - wlo
                w_ret = np.zeros(n)
                hasprev = prev >= 0
                if hasprev.any():
                    comp = self.csr._composite()
                    keys = (cur_local[hasprev].astype(np.uint64) << np.uint64(32)) | prev[
                        hasprev
                    ].astype(np.uint64)
                    pos_r = np.minimum(np.searchsorted(comp, keys), len(comp) - 1)
                    found = comp[pos_r] == keys
                    wr = np.zeros(int(hasprev.sum()))
                    wr[found] = self.csr.weights[pos_r[found]]
                    w_ret[hasprev] = wr
                area = wtot * ub2
                r = rng.random(n) * (area + w_ret * overflow)
                in_app = r >= area
                # regular area: ONE draw yields (candidate ~ static weight,
                # height uniform in [0, ub2)) — t = r/ub2 in cumulative
                # weight space, residual normalized by the edge weight
                target = wlo + np.minimum(r / ub2, np.nextafter(wtot, 0.0))
                pos = np.searchsorted(self._wext, target, side="right") - 1
                pos = np.clip(pos, base, end - 1)
                cand = self.csr.indices[pos]
                with np.errstate(invalid="ignore", divide="ignore"):
                    dart = (r - (self._wext[pos] - wlo) * ub2) / self.csr.weights[pos]
                dart = np.clip(dart, 0.0, ub2)
                accept, resolved = self._n2v_resolve(prev, cand, dart, aseg)
                if in_app.any():
                    # appendix mass exists only when the return edge does
                    # (w_ret > 0), so acceptance is unconditional; total
                    # return mass = w_ret*ub2 (always-accepted regular area,
                    # dart < ub2 <= 1/p) + w_ret*(1/p - ub2) = w_ret/p
                    cand[in_app] = prev[in_app]
                    accept[in_app] = True
                    resolved[in_app] = True
            else:
                pos = self._sample(cur_local, rng)
                cand = self.csr.indices[pos]
                dart = rng.random(n) * self._n2v_ub()
                accept, resolved = self._n2v_resolve(prev, cand, dart, aseg)
            a = accept & resolved
            pk = ~resolved
            if pk.any():
                park_rows.append((wid[pk], step[pk], cur[pk], prev[pk], cand[pk], dart[pk]))
            if a.any():
                # apply inline: footprint + route emigrants; stayers rejoin
                # the loop at their new position (local-continue)
                wid_a, cand_a = wid[a], cand[a]
                step_a = step[a] + 1
                prev_a = cur[a]
                self._nsteps += int(len(wid_a))
                if self._collect:
                    self._fp.append((wid_a.copy(), step_a.copy(), cand_a.copy()))
                cpart = part_of(cand_a, self.boundaries)
                stay = cpart == self.part_id
                mov = ~stay
                if mov.any():
                    moved += int(mov.sum())
                    # the emigrant's new prev (= old cur) is OURS: piggyback
                    # its (degree-capped) adjacency so the receiving shard
                    # resolves every membership test locally — parking only
                    # survives for hub prevs above the cap
                    m_pdeg, m_padj = self._adj_for(prev_a[mov] - self.lo, adj_cap)
                    w_out.append(
                        (
                            {"wid": wid_a[mov], "step": step_a[mov], "cur": cand_a[mov], "prev": prev_a[mov]},
                            cpart[mov],
                            m_pdeg,
                            m_padj,
                        )
                    )
                new_wid, new_step = wid_a[stay], step_a[stay]
                new_cur, new_prev = cand_a[stay], prev_a[stay]
                new_aseg = np.full(len(new_wid), -1, np.int64)  # prev local now
            else:
                new_wid = np.empty(0, np.int64)
                new_step = new_cur = new_prev = new_wid
                new_aseg = new_wid
            rej = resolved & ~accept
            wid = np.concatenate([new_wid, wid[rej]])
            step = np.concatenate([new_step, step[rej]])
            cur = np.concatenate([new_cur, cur[rej]])
            prev = np.concatenate([new_prev, prev[rej]])
            aseg = np.concatenate([new_aseg, aseg[rej]])
            n = len(wid)
            rnd += 1
        return self._n2v_pack(w_out, park_rows, counts, moved)

    def _n2v_pack(self, w_out, park_rows, counts, moved):
        """Build the per-target output envelopes: plain walker chunks get
        cand=-1/dart=0 filler columns, parked walkers forward the FULL row
        (dart included) to prev's owner — no parked state stays on this
        actor, so checkpoints only ever snapshot (frontier, in-flight
        envelopes), never a mid-mesh actor state. One stable argsort by
        target routes everything."""
        P = self.num_parts
        chunks: list[dict] = []
        padj_parts: list[np.ndarray] = []
        for rows, tgt, pdeg, padj in w_out:
            m = len(tgt)
            if pdeg is None:
                pdeg = np.zeros(m, np.int64)
            else:
                padj_parts.append(padj)
            chunks.append(
                rows
                | {"cand": np.full(m, -1, dtype=np.int64), "dart": np.zeros(m), "pdeg": pdeg, "_tgt": tgt}
            )
        if park_rows:
            pw = [np.concatenate([r[i] for r in park_rows]) for i in range(6)]
            counts["parked"] = int(len(pw[0]))
            chunks.append(
                {
                    "wid": pw[0],
                    "step": pw[1],
                    "cur": pw[2],
                    "prev": pw[3],
                    "cand": pw[4],
                    "dart": pw[5],
                    "pdeg": np.zeros(len(pw[0]), np.int64),
                    "_tgt": part_of(pw[3], self.boundaries),
                }
            )
        data = padj_sorted = padj_off = bounds = None
        total = 0
        if chunks:
            allr = _concat(chunks)
            tgt = allr.pop("_tgt")
            total = int(len(tgt))
            order = np.argsort(tgt, kind="stable")
            # ragged adjacency follows its rows through the permutation:
            # unsorted row starts gathered in sorted order (one pass)
            padj_all = np.concatenate(padj_parts) if padj_parts else np.empty(0, np.int64)
            pdeg_u = allr["pdeg"]
            starts_u = np.concatenate([[0], np.cumsum(pdeg_u)[:-1]])
            data = {k: v[order] for k, v in allr.items()}
            padj_sorted = padj_all[_ragged_idx(starts_u[order], data["pdeg"])]
            padj_off = np.concatenate([[0], np.cumsum(data["pdeg"])])
            bounds = np.searchsorted(tgt[order], np.arange(P + 1))
        counts["moved"] = moved
        counts["n_out"] = total
        return data, padj_sorted, padj_off, bounds, counts

    def _n2v_emit(self, packed):
        """Per-target envelope formatting of a packed wave (P+1 returns)."""
        data, padj_sorted, padj_off, bounds, counts = packed
        P = self.num_parts
        out: list = [None] * P
        if data is not None:
            for p in range(P):
                s, e = int(bounds[p]), int(bounds[p + 1])
                if e > s:
                    env = {k: v[s:e] for k, v in data.items()}
                    env["padj"] = padj_sorted[int(padj_off[s]) : int(padj_off[e])]
                    out[p] = env
        return (*out, counts)

    def _n2v_emit_b(self, packed):
        """Broadcast-bundle formatting of a packed wave (2 returns)."""
        data, padj_sorted, padj_off, bounds, counts = packed
        if data is None:
            return None, counts
        data = self._transport_downcast(data)
        if padj_sorted is not None and padj_sorted.dtype == np.int64 and self.v_num < (1 << 31):
            padj_sorted = padj_sorted.astype(np.int32)
        return (
            {"data": data, "padj": padj_sorted, "_padj_off": padj_off, "_bounds": bounds},
            counts,
        )

    def n2v_step_b(self, superstep: int, *bundles):
        """Broadcast-bundle second-order superstep: every sender's bundle
        comes in (this shard slices its rows), ONE bundle + meta go out."""
        if self._prof is not None and not self._prof_all:
            self._prof.enable()
        try:
            return self._n2v_emit_b(
                self._n2v_step_core(superstep, [self._slice_mine(b) for b in bundles])
            )
        finally:
            if self._prof is not None and not self._prof_all:
                self._prof.disable()

    def walk_prof_stats(self, top: int = 40) -> str:
        """Dump the KKRAY_WALK_PROF cProfile accumulated on this shard."""
        if self._prof is None:
            return ""
        if getattr(self, "_prof_all", False):
            self._prof.disable()
        import io
        import pstats

        buf = io.StringIO()
        pstats.Stats(self._prof, stream=buf).sort_stats("cumulative").print_stats(top)
        return buf.getvalue()

    def _n2v_ub(self) -> float:
        spec = self._wspec
        return max(1.0 / spec["p"], 1.0, 1.0 / spec["q"])

    def _adj_for(self, verts_local: np.ndarray, cap: int):
        """Degree-capped adjacency piggyback for LOCAL vertices: per-row
        neighbour count (0 when deg > cap — the hub fallback) and the
        flattened neighbour ids (dst-sorted, straight out of the CSR)."""
        if len(verts_local) == 0 or cap <= 0:
            return np.zeros(len(verts_local), np.int64), np.empty(0, np.int64)
        starts = self.csr.indptr[verts_local]
        deg = self.csr.indptr[verts_local + 1] - starts
        pdeg = np.where(deg <= cap, deg, 0).astype(np.int64)
        idx = _ragged_idx(starts, pdeg)
        return pdeg, self.csr.indices[idx].astype(np.int64)

    def _n2v_resolve(self, prev, cand, dart, aseg=None):
        """Locally-decidable accept/reject (bound shortcuts + cand==prev +
        prev-owned-here membership probe + piggybacked-adjacency probe)."""
        spec = self._wspec
        inv_p, inv_q = 1.0 / spec["p"], 1.0 / spec["q"]
        n = len(prev)
        accept = np.zeros(n, dtype=bool)
        resolved = np.zeros(n, dtype=bool)
        first = prev < 0  # first hop: plain static walk (no dynamic comp)
        accept |= first
        resolved |= first
        ret = (~resolved) & (cand == prev)
        accept[ret] = dart[ret] <= inv_p
        resolved |= ret
        lo2, hi2 = min(1.0, inv_q), max(1.0, inv_q)
        pre_acc = (~resolved) & (dart <= lo2)  # lower-bound pre-acceptance
        accept |= pre_acc
        resolved |= pre_acc
        pre_rej = (~resolved) & (dart > hi2)
        resolved |= pre_rej  # accept stays False
        local_prev = (~resolved) & (part_of(prev, self.boundaries) == self.part_id)
        if local_prev.any():
            member = self.csr.contains_edges(prev[local_prev] - self.lo, cand[local_prev])
            dyn = np.where(member, 1.0, inv_q)
            accept[local_prev] = dart[local_prev] <= dyn
            resolved[local_prev] = True
        if aseg is not None:
            # piggybacked prev-adjacency: membership = one searchsorted on
            # the wave's (segment << 32 | neighbour) composite — remote
            # prevs resolve HERE instead of parking on a forwarded query
            has = (~resolved) & (aseg >= 0)
            if has.any():
                comp = self._wave_comp
                keys = (aseg[has].astype(np.uint64) << np.uint64(32)) | cand[has].astype(np.uint64)
                pos = np.minimum(np.searchsorted(comp, keys), len(comp) - 1)
                member = comp[pos] == keys
                dyn = np.where(member, 1.0, inv_q)
                accept[has] = dart[has] <= dyn
                resolved[has] = True
        return accept, resolved

    def _n2v_apply(self, wid, step, cur, prev, cand, accept, resolved):
        """Move accepted walkers (footprint + route), keep rejected-resolved
        as next-superstep retry frontier. Parked rows are excluded."""
        P = self.num_parts
        acc = accept & resolved
        rej = resolved & ~accept
        out = [_EMPTY() | {"prev": np.empty(0, np.int64)} for _ in range(P)]
        moved = 0
        if acc.any():
            wid_a = wid[acc]
            step_a = step[acc] + 1
            cand_a = cand[acc]
            prev_a = cur[acc]
            self._nsteps += int(len(wid_a))
            if self._collect:
                self._fp.append((wid_a.copy(), step_a.copy(), cand_a.copy()))
            cpart = part_of(cand_a, self.boundaries)
            stay = cpart == self.part_id
            if stay.any():
                st = {"wid": wid_a[stay], "step": step_a[stay], "cur": cand_a[stay], "prev": prev_a[stay]}
                self._append_frontier(st)
            mov = ~stay
            moved = int(mov.sum())
            if moved:
                mp = cpart[mov]
                order = np.argsort(mp, kind="stable")
                bounds = np.searchsorted(mp[order], np.arange(P + 1))
                for p in range(P):
                    s, e = bounds[p], bounds[p + 1]
                    if e > s:
                        sl = order[s:e]
                        out[p] = {
                            "wid": wid_a[mov][sl],
                            "step": step_a[mov][sl],
                            "cur": cand_a[mov][sl],
                            "prev": prev_a[mov][sl],
                        }
        if rej.any():  # retry same vertex next superstep (walk.hpp:1361-1364)
            self._append_frontier({"wid": wid[rej], "step": step[rej], "cur": cur[rej], "prev": prev[rej]})
        return out, moved, int(len(self._frontier.get("wid", ())))

    def _append_frontier(self, batch: dict):
        if self._frontier and len(self._frontier.get("wid", ())):
            self._frontier = _concat([self._frontier, batch])
        else:
            self._frontier = batch

    def n2v_run_local(self, max_supersteps: int = 1 << 20) -> int:
        """Replicated-pool fast path: this worker owns the FULL graph
        (P=1), so no proposal can ever park on a remote membership query —
        run the whole second-order walk to completion in one actor call
        (no per-superstep driver round-trips)."""
        ss = 0
        while len(self._frontier.get("wid", ())) and ss < max_supersteps:
            self.n2v_step(ss)
            ss += 1
        return ss

    # ------------------------------------------------------------------ #
    def walk_steps_taken(self) -> int:
        # 0 before the first walk_init (bench introspection must be total);
        # NOTE: walk_init resets the counter, so the value is per-walk, not
        # cumulative across walks on the same shard
        return getattr(self, "_nsteps", 0)

    def walk_final_states(self):
        """Terminal (wid, step, wstate) triples collected on this shard."""
        if not self._final:
            e = np.empty(0, np.int64)
            return e, e, e
        return tuple(np.concatenate([c[i] for c in self._final]) for i in range(3))

    def walk_footprints(self):
        """Return collected (wid, step, vertex) footprint arrays."""
        if not self._fp:
            return np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
        w = np.concatenate([c[0] for c in self._fp])
        s = np.concatenate([c[1] for c in self._fp])
        v = np.concatenate([c[2] for c in self._fp])
        return w, s, v

    def walk_footprints_table(self):
        """Footprints as ONE pyarrow Table: called via .remote(), the table
        lands in the object store and the driver only handles the ref
        (``from_arrow_refs``) — O(1) driver memory regardless of walk size
        (replaces the reference's footprint shuffle source, path.hpp:164-250)."""
        import pyarrow as pa

        w, s, v = self.walk_footprints()
        return pa.table({"walker_id": pa.array(w), "step": pa.array(s), "vertex": pa.array(v)})

    def walk_fp_clear(self):
        self._fp = []
        return True
