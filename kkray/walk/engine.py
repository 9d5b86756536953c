"""Walk driver: init walkers -> supersteps until the frontier drains ->
footprints -> assembled paths.

The superstep loop is the Dataset-free core exchange (walker batches are
small dicts of numpy arrays moved as object refs between shard actors —
the reference's ``distributed_execute`` message rounds, include/graph.hpp:704-918).
Footprints stay in the object store (one arrow table per shard); path
assembly is a routed exchange over those refs — split by walker hash, one
lexsort + run-detect per reducer — the Ray-native analogue of the
reference's footprint shuffle + bucket sort (include/path.hpp:164-477).
``assemble_paths`` offers the same assembly over an arbitrary footprint
Dataset (shuffled, or in place when blocks are walker-complete).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..graph.partition import part_of
from ..utils import rng_for, sort2
from .spec import Node2vecSpec, TransitionSpec, WalkerSpec

MAX_SUPERSTEPS = 100_000


def _add_custom_cols(chunk: dict, spec: dict):
    """Seed the custom-kind walker-state columns (reference
    walker_init_state_func, walk.hpp:147-193 — runs once per walker)."""
    n = len(chunk["wid"])
    if spec.get("track_prev"):
        chunk["prev"] = np.full(n, -1, dtype=np.int64)
    init = spec.get("state_init_fn")
    if init is not None or spec.get("state_update_fn") is not None:
        chunk["wstate"] = (
            np.asarray(init(chunk["wid"], chunk["cur"]), dtype=np.int64)
            if init is not None
            else np.zeros(n, dtype=np.int64)
        )


def _init_walkers(graph, wspec: WalkerSpec, seed: int) -> list[dict]:
    """Vectorized walker init + routing (reference init_walkers
    walk.hpp:440-497; equal dist walk.hpp:403-411 keeps the exact
    ``i % v_num`` semantics for parity)."""
    n = wspec.walker_num
    wid = np.arange(n, dtype=np.int64) + wspec.wid_offset
    if isinstance(wspec.start, np.ndarray):
        start = wspec.start.astype(np.int64)
        if len(start) != n:
            start = start[wid % len(start)]
    elif wspec.start == "equal":
        start = wid % graph.v_num
    elif wspec.start == "uniform":
        start = rng_for(seed, 0xA11CE).integers(0, graph.v_num, n)
    else:
        raise ValueError(wspec.start)
    parts = part_of(start, graph.boundaries)
    order = np.argsort(parts, kind="stable")
    bounds = np.searchsorted(parts[order], np.arange(graph.num_parts + 1))
    out = []
    for p in range(graph.num_parts):
        sl = order[bounds[p] : bounds[p + 1]]
        out.append({"wid": wid[sl], "step": np.zeros(len(sl), dtype=np.int64), "cur": start[sl]})
    return out


def random_walk(
    graph,
    wspec: WalkerSpec,
    tspec: TransitionSpec | Node2vecSpec,
    seed: int = 42,
    collect_paths: bool = True,
    return_dataset: bool = False,
    walk_rate: float | None = None,
    output_dir: str | None = None,
    checkpoint=None,
    checkpoint_every: int = 5,
    resume: bool = False,
    max_supersteps: int = MAX_SUPERSTEPS,
):
    """Run a walk; returns assembled paths (see assemble_paths) or the raw
    footprints Dataset. Stateless wrt the graph: multiple walks can run on
    one loaded Graph (reference README.md:20 semantics).

    walk_rate (reference E12, walk.hpp:706-711): run `rate`-sized walker
    epochs to bound in-flight footprint memory; with `output_dir`, each
    epoch writes `epoch=K/` parquet and an existing complete epoch dir is
    SKIPPED on rerun (resumable layout)."""
    if walk_rate is not None and 0 < walk_rate < 1:
        import os

        n = wspec.walker_num
        size = max(1, int(np.ceil(n * walk_rate)))
        outs = []
        for ei, lo in enumerate(range(0, n, size)):
            epoch_walkers = min(size, n - lo)
            sub = WalkerSpec(epoch_walkers, wspec.start, wid_offset=lo)
            edir = os.path.join(output_dir, "epoch=%05d" % ei) if output_dir else None
            # write_parquet is multi-file and non-atomic: an epoch counts as
            # complete only once its _SUCCESS sentinel exists (written AFTER
            # the parquet write returns); a crash mid-epoch leaves no
            # sentinel and the rerun rewrites the whole epoch dir.
            sentinel = os.path.join(edir, "_SUCCESS") if edir else None
            if sentinel and os.path.exists(sentinel):
                outs.append(ray.data.read_parquet(edir))
                continue
            if edir and os.path.isdir(edir):
                import shutil

                shutil.rmtree(edir)  # partial epoch from a crashed run
            r = random_walk(
                graph, sub, tspec, seed=seed + ei, collect_paths=collect_paths,
                return_dataset=return_dataset,
            )
            if edir:
                r.write_parquet(edir)
                with open(sentinel, "w") as f:
                    f.write("ok\n")
                r = ray.data.read_parquet(edir)
            outs.append(r)
        out = outs[0]
        for o in outs[1:]:
            out = out.union(o)
        return out
    actors = graph.actors
    P = graph.num_parts
    spec = tspec.to_dict()
    ray.get([a.walk_begin.remote(spec, seed, collect_paths) for a in actors])
    if spec["kind"] == "mh" and P > 1:
        # routed degree exchange: the MH acceptance needs deg(candidate),
        # remote under vertex sharding — one (request, lookup, scatter)
        # round per walk, O(unique out-neighbours) per shard (the same
        # join shape as the triangle orientation, analytics/triangles.py)
        reqs = [a.mh_deg_requests.options(num_returns=P).remote() for a in actors]
        resp = [
            actors[p].deg_lookup.options(num_returns=P).remote(*[reqs[q][p] for q in range(P)])
            for p in range(P)
        ]
        ray.get([actors[q].mh_build.remote(*[resp[p][q] for p in range(P)]) for q in range(P)])
    if getattr(graph, "replicated", False):
        return _run_replicated(graph, wspec, spec, seed, return_dataset)
    start_ss = 0
    resume_info = None
    if resume and checkpoint is not None and (last := checkpoint.latest_complete()) is not None:
        # resume mid-walk: restore (frontier, pending in-flight batches,
        # footprints, finals, parked proposals, nsteps) per shard and
        # continue at the saved superstep counter — the keyed Philox
        # streams and the pure-snapshot dump make the continuation
        # bit-identical to the uninterrupted run
        parts, man = checkpoint.load_tables(last)
        resume_info = ray.get(
            [
                a.walk_ckpt_restore.remote(t, n)
                for a, t, n in zip(actors, parts, man["metrics"]["nsteps"])
            ]
        )
        start_ss = int(man["lineage"]["next_superstep"])
    else:
        seeds = _init_walkers(graph, wspec, seed)
        if spec["kind"] == "node2vec":
            for s in seeds:
                s["prev"] = np.full(len(s["wid"]), -1, dtype=np.int64)
        elif spec["kind"] == "metapath":
            n_schemes = len(spec["schemes"])
            for s in seeds:
                # scheme assignment: deliberate deterministic DEVIATION from
                # the reference (metapath.hpp:88-94 draws the scheme
                # uniformly at random per walker); wid round-robin keeps
                # replay/resume exact at the cost of a slightly skewed
                # scheme distribution when walker_num % n_schemes != 0
                s["scheme"] = s["wid"] % n_schemes
                s["mstate"] = np.zeros(len(s["wid"]), dtype=np.int64)
        elif spec["kind"] == "custom":
            for s in seeds:
                _add_custom_cols(s, spec)
        ray.get([a.walk_seed.remote(s) for a, s in zip(actors, seeds)])

    if spec["kind"] == "node2vec":
        _drive_second_order(actors, P, checkpoint, checkpoint_every, start_ss, max_supersteps, resume_info)
    elif spec["kind"] == "geometric":
        # unbounded tail: keep the pruned per-superstep driver (light mode)
        _drive_first_order(actors, P, checkpoint, checkpoint_every, start_ss, max_supersteps, resume_info)
    else:
        _drive_first_order_windowed(actors, P, checkpoint, checkpoint_every, start_ss, max_supersteps)

    # footprints stay in the object store: one arrow-table ref per shard,
    # never concatenated on the driver (reference path.hpp:164-250 shuffle)
    refs = [a.walk_footprints_table.remote() for a in actors]
    if return_dataset:
        return ray.data.from_arrow_refs(refs)
    return assemble_footprint_refs(refs)


def _run_replicated(graph, wspec: WalkerSpec, spec: dict, seed: int, return_dataset: bool):
    """Replicated-CSR drive (WalkerPool): walkers split round-robin across
    workers; every step is local, so first-order walks finish in ONE call
    per worker and second-order in pure-local supersteps with no query
    exchange."""
    actors = graph.actors
    W = len(actors)
    n = wspec.walker_num
    wid = np.arange(n, dtype=np.int64) + wspec.wid_offset
    if isinstance(wspec.start, np.ndarray):
        start = wspec.start.astype(np.int64)
        start = start[wid % len(start)] if len(start) != n else start
    elif wspec.start == "equal":
        start = wid % graph.v_num
    elif wspec.start == "uniform":
        start = rng_for(seed, 0xA11CE).integers(0, graph.v_num, n)
    else:
        raise ValueError(wspec.start)
    chunks = []
    for i in range(W):
        m = (wid % W) == i
        chunk = {"wid": wid[m], "step": np.zeros(int(m.sum()), dtype=np.int64), "cur": start[m]}
        if spec["kind"] == "node2vec":
            chunk["prev"] = np.full(int(m.sum()), -1, dtype=np.int64)
        elif spec["kind"] == "metapath":
            chunk["scheme"] = chunk["wid"] % len(spec["schemes"])
            chunk["mstate"] = np.zeros(int(m.sum()), dtype=np.int64)
        elif spec["kind"] == "custom":
            _add_custom_cols(chunk, spec)
        chunks.append(chunk)
    ray.get([a.walk_seed.remote(c) for a, c in zip(actors, chunks)])
    if spec["kind"] == "node2vec":
        ray.get([a.n2v_run_local.remote(MAX_SUPERSTEPS) for a in actors])
    else:
        ray.get([a.walk_step.remote(0) for a in actors])
    refs = [a.walk_footprints_table.remote() for a in actors]
    ds = ray.data.from_arrow_refs(refs)
    # pool workers partition walkers by id: every block is walker-complete
    return ds if return_dataset else assemble_paths(ds, colocated=True)


def _ckpt_walk(actors, checkpoint, incoming, P, next_superstep, incoming_q=None):
    """PURE-SNAPSHOT checkpoint: each shard dumps (frontier + the in-flight
    batches addressed to it + footprints + finals + in-flight forwarded
    queries) without mutating anything — the continuing run is
    bit-identical to a run that never checkpointed; a resumed run
    re-injects the dumped walker batches (shard-side ``_pending``) and
    query batches (shard-side ``_pending_q``, resolved RNG-free exactly
    like the live refs would have been)."""
    iq = incoming_q if incoming_q is not None else [[] for _ in range(P)]
    dumps = ray.get(
        [
            a.walk_ckpt_dump.remote(len(incoming[p]), *incoming[p], *iq[p])
            for p, a in enumerate(actors)
        ]
    )
    checkpoint.save_tables(
        next_superstep,
        [d[0] for d in dumps],
        metrics={"nsteps": [int(d[1]) for d in dumps]},
        lineage={"op": "walk", "next_superstep": int(next_superstep), "num_parts": P},
    )


def _drive_first_order_windowed(
    actors, P, checkpoint=None, checkpoint_every=5, start_ss=0, max_supersteps=MAX_SUPERSTEPS
):
    """Pipelined window drive for LENGTH-BOUNDED first-order kinds
    (truncated/mh/metapath/custom): supersteps chain as pure dataflow
    (wave t+1's tasks consume wave t's per-target emigrant refs) and the
    driver pays one ray.get per K-wave window instead of one per
    superstep — the same shape as the second-order forwarding mesh.
    Geometric (PPR) walks keep the pruned per-superstep driver below:
    their tail is unbounded, so unpruned windows would burn O(P) no-op
    tasks per wave for the whole tail."""
    superstep = start_ss
    # broadcast-bundle mesh: each wave is P walk_step_b tasks; every task
    # consumes the SAME P bundle refs from the previous wave (one per
    # sender, plasma-backed at frontier scale) and returns (bundle, meta)
    # — O(P) objects per wave instead of O(P^2) driver-funneled envelopes
    w_in: list = []
    K = max(1, int(checkpoint_every)) if checkpoint is not None else int(__import__("os").environ.get("KKRAY_WALK_WINDOW", "16"))
    while superstep < max_supersteps:
        window = min(K, max_supersteps - superstep)
        last = None
        for _ in range(window):
            refs = {
                p: actors[p].walk_step_b.options(num_returns=2).remote(superstep, *w_in)
                for p in range(P)
            }
            w_in = [refs[p][0] for p in range(P)]
            last = refs
            superstep += 1
        if checkpoint is not None and superstep % checkpoint_every == 0:
            _ckpt_walk(actors, checkpoint, [list(w_in) for _ in range(P)], P, superstep)
        metas = ray.get([last[p][1] for p in range(P)])
        if all(not any(m["sizes"]) for m in metas):
            break


def _drive_first_order(
    actors, P, checkpoint=None, checkpoint_every=5, start_ss=0, max_supersteps=MAX_SUPERSTEPS, resume_info=None
):
    superstep = start_ss
    incoming: list[list] = [[] for _ in range(P)]
    # small-frontier fast path (the reference's light mode): per-target
    # emigrant sizes returned by walk_step let each round touch ONLY the
    # shards that actually hold walkers — geometric/PPR tails with a
    # handful of live walkers cost O(active shards) calls, not O(P^2)
    if resume_info is not None:
        active = {p for p, (work, _) in enumerate(resume_info) if work}
    else:
        active = set(range(P))
    while superstep < max_supersteps and active:
        targets = sorted(active)
        refs = {
            p: actors[p].walk_step.options(num_returns=P + 1).remote(superstep, *incoming[p])
            for p in targets
        }
        metas = ray.get([refs[p][P] for p in targets])
        moved = sum(m["moved"] for m in metas)
        incoming = [[] for _ in range(P)]
        active = set()
        for p, m in zip(targets, metas):
            for q in range(P):
                if m["sizes"][q]:
                    incoming[q].append(refs[p][q])
                    active.add(q)
        superstep += 1
        if checkpoint is not None and moved and superstep % checkpoint_every == 0:
            _ckpt_walk(actors, checkpoint, incoming, P, superstep)
        if moved == 0:
            break


def _drive_second_order(
    actors, P, checkpoint=None, checkpoint_every=5, start_ss=0, max_supersteps=MAX_SUPERSTEPS, resume_info=None
):
    """PIPELINED single-phase query-forwarding mesh: each superstep is ONE
    n2v_step task wave consuming the previous wave's per-target envelope
    refs (inline-small batches ride in the task spec, big ones go through
    plasma by reference — Ray picks the transport per batch), so
    supersteps chain as pure dataflow and the driver pays one ray.get per
    WINDOW of K supersteps, not one (or three, as in the reference's
    propose/respond/resolve stateQuery mesh — walk.hpp:1082-1381) per
    superstep. node2vec walks are length-bounded, so the unpruned P
    tasks/superstep cost is bounded by ~length windows of near-empty tasks
    in the retry tail; long-tail geometric walks keep the pruned
    per-superstep first-order driver instead."""
    superstep = start_ss
    # broadcast-bundle mesh (see _drive_first_order_windowed): every wave's
    # P n2v_step_b tasks consume the same P sender bundles and return
    # (bundle, counts) — O(P) objects per wave, not O(P^2)
    w_in: list = []
    # resume: restored pending walker/query rows live shard-side and are
    # consumed by the first wave automatically (nothing to replay — query
    # resolution is RNG-free and happens inside the normal step)
    K = max(1, int(checkpoint_every)) if checkpoint is not None else int(__import__("os").environ.get("KKRAY_WALK_WINDOW", "16"))
    while superstep < max_supersteps:
        window = min(K, max_supersteps - superstep)
        last = None
        for _ in range(window):
            refs = {
                p: actors[p].n2v_step_b.options(num_returns=2).remote(superstep, *w_in)
                for p in range(P)
            }
            w_in = [refs[p][0] for p in range(P)]
            last = refs
            superstep += 1
        if checkpoint is not None and superstep % checkpoint_every == 0:
            dumps = ray.get([a.n2v_ckpt_dump.remote(*w_in) for a in actors])
            checkpoint.save_tables(
                superstep,
                [d[0] for d in dumps],
                metrics={"nsteps": [int(d[1]) for d in dumps]},
                lineage={"op": "walk", "next_superstep": int(superstep), "num_parts": P},
            )
        counts = ray.get([last[p][1] for p in range(P)])
        if all(c["n_out"] == 0 for c in counts):
            break


def _assemble_block(t: pa.Table) -> pa.Table:
    """One co-located footprint block -> paths table (lexsort + run-detect
    + arrow list column). All steps of a walker must be in `t`."""
    w = t.column("walker_id").to_numpy(zero_copy_only=False)
    if len(w) == 0:
        return pa.table(
            {
                "walker_id": pa.array([], pa.int64()),
                "length": pa.array([], pa.int64()),
                "path": pa.array([], pa.list_(pa.int64())),
            }
        )
    s = t.column("step").to_numpy(zero_copy_only=False)
    v = t.column("vertex").to_numpy(zero_copy_only=False)
    order = sort2(w, s)  # composite-key radix argsort (walker, step)
    w, v = w[order], np.ascontiguousarray(v[order], dtype=np.int64)
    starts = np.flatnonzero(np.diff(w) != 0) + 1
    offsets = np.concatenate(([0], starts, [len(w)])).astype(np.int32)
    wids = w[offsets[:-1]]
    lengths = (np.diff(offsets.astype(np.int64))) - 1
    path = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(v, pa.int64()))
    return pa.table({"walker_id": pa.array(wids), "length": pa.array(lengths), "path": path})


@ray.remote
def _split_by_walker(t: pa.Table, num_reducers: int):
    """Route a footprint table's rows to reducers by walker-id hash."""
    w = t.column("walker_id").to_numpy(zero_copy_only=False)
    h = (w.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
    r = (h % np.uint64(num_reducers)).astype(np.int64)
    order = np.argsort(r, kind="stable")
    bounds = np.searchsorted(r[order], np.arange(num_reducers + 1))
    return tuple(t.take(order[bounds[k] : bounds[k + 1]]) for k in range(num_reducers))


@ray.remote
def _reduce_assemble(*tabs) -> pa.Table:
    return _assemble_block(pa.concat_tables(tabs))


def assemble_footprint_refs(refs: list, num_reducers: int | None = None) -> ray.data.Dataset:
    """Engine-native path assembly over per-shard footprint table refs:
    split each table by walker-id hash (one task per shard,
    num_returns=R), reducers concat + assemble their bucket. The same
    routed-exchange shape as the walk supersteps — ~5-10x faster than a
    generic Dataset shuffle for this fixed (key, sort, fold) pattern, and
    nothing ever lands on the driver."""
    if num_reducers is None:
        num_reducers = max(2, int(ray.cluster_resources().get("CPU", 4)))
    if num_reducers == 1:
        # no routing needed — one reducer concats every ref directly
        # (num_returns=1 would hand the reducer an unsplit 1-tuple)
        return ray.data.from_arrow_refs([_reduce_assemble.remote(*refs)])
    parts = [_split_by_walker.options(num_returns=num_reducers).remote(r, num_reducers) for r in refs]
    out = [_reduce_assemble.remote(*[parts[i][k] for i in range(len(parts))]) for k in range(num_reducers)]
    return ray.data.from_arrow_refs(out)


def assemble_paths(
    footprints: ray.data.Dataset, num_shards: int = 64, colocated: bool = False
) -> ray.data.Dataset:
    """footprints(walker_id, step, vertex) -> paths(walker_id, length,
    path list<int64>).

    Shard-then-vectorize (kkray.ops pattern; reference footprint shuffle +
    bucket sort, path.hpp:338-391): hash walker ids into coarse shards so
    every step of a walker co-locates, then ONE lexsort + run-detect per
    shard builds all paths as a zero-copy arrow list column — no per-walker
    Python call, no driver materialization.

    colocated=True: every block already holds ALL steps of its walkers
    (true for the replicated WalkerPool, whose workers partition walkers by
    id) — skip the shuffle entirely and assemble each block in place."""

    def add_shard(t: pa.Table) -> pa.Table:
        w = t.column("walker_id").to_numpy(zero_copy_only=False)
        # splitmix-style avalanche so contiguous wid ranges spread evenly
        h = (w.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        return t.append_column("_shard", pa.array((h % np.uint64(num_shards)).astype(np.int32)))

    if colocated:
        return footprints.map_batches(_assemble_block, batch_format="pyarrow", batch_size=None)
    return (
        footprints.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(_assemble_block, batch_format="pyarrow")
    )


def paths_to_numpy(paths_ds: ray.data.Dataset) -> dict[int, np.ndarray]:
    """Small-result helper for tests: walker_id -> vertex sequence."""
    out = {}
    for row in paths_ds.take_all():
        out[int(row["walker_id"])] = np.asarray(row["path"], dtype=np.int64)
    return out
