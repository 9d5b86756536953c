"""K-hop neighborhood sampling over an edge table — the GNN-minibatch
prep operator (GraphSAGE-style fanout sampling expressed Ray-Data-first;
new scope beyond the reference, but the same frontier-expansion shape as
the walk engine's supersteps: `include/walk.hpp:926-1079` expands walker
frontiers one hop at a time, here the frontier is (root, vertex) pairs
and the per-vertex transition is a fanout-capped adjacency slice).

Design: per hop, the bounded (root, v) frontier is broadcast once
(`ray.put`), every edge batch probes it with one vectorized pandas merge
(a many-to-many lookup join: one edge row fans out to every root whose
frontier contains its src), and the per-(root, src) fanout cap rides
``grouped_top_k`` — so each input batch contributes at most
fanout x frontier rows to the shuffle. The frontier is bounded by
construction (|seeds| x prod(fanouts) after h hops); at 10^12-edge scale
the operator is run per root-batch (the same batching a GNN trainer does
anyway), keeping every broadcast under the documented limit."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..ops import grouped_top_k, to_pandas_typed
from ..utils import splitmix64

# frontier pairs broadcast per hop; above this, batch the roots instead
FRONTIER_BROADCAST_LIMIT = 5_000_000


def khop_neighbors(
    edges: ray.data.Dataset,
    seeds,
    fanouts: list[int],
    mode: str = "first",
    rng_seed: int = 0,
) -> ray.data.Dataset:
    """Sample a k-hop neighborhood around each seed vertex: hop i keeps at
    most ``fanouts[i-1]`` out-neighbors per (root, vertex). Returns a
    Dataset of (root, hop, src, dst) edge rows — hop 1 rows have
    src == root; hop i expands the distinct (root, dst) pairs of hop i-1.

    ``mode="first"`` keeps the fanout smallest dst per (root, src) — the
    deterministic SQL-parity mode (row_number over the sorted adjacency).
    ``mode="uniform"`` ranks neighbors by a keyed splitmix64 hash of
    (root, src, dst, rng_seed): a reproducible uniform
    sample-without-replacement per (root, src) — re-running with the same
    seed yields the identical sample, any other seed an independent one.

    Assumes a deduped edge table (see ``exact_dedup`` /
    ``kkray.io.edges``); duplicate (src, dst) rows would re-enter the
    fanout cap once per copy."""
    if mode not in ("first", "uniform"):
        raise ValueError(f"unknown mode {mode!r}: use 'first' or 'uniform'")
    roots = np.unique(np.asarray(seeds, dtype=np.int64))
    frontier = pd.DataFrame({"root": roots, "v": roots})

    typed_empty = ray.data.from_pandas(
        pd.DataFrame(
            {
                "root": pd.Series(dtype="int64"),
                "hop": pd.Series(dtype="int64"),
                "src": pd.Series(dtype="int64"),
                "dst": pd.Series(dtype="int64"),
            }
        )
    )
    out = typed_empty

    for hop, fanout in enumerate(fanouts, start=1):
        if len(frontier) > FRONTIER_BROADCAST_LIMIT:
            raise ValueError(
                f"hop-{hop} frontier has {len(frontier)} (root, v) pairs "
                f"(> {FRONTIER_BROADCAST_LIMIT}); batch the seed roots and "
                "run khop_neighbors per batch"
            )
        if not len(frontier):
            break
        fref = ray.put(frontier)

        def probe(t: pa.Table, _fref=fref) -> pa.Table:
            fdf = ray.get(_fref)
            df = pd.DataFrame(
                {
                    "src": t.column("src").to_numpy(zero_copy_only=False),
                    "dst": t.column("dst").to_numpy(zero_copy_only=False),
                }
            )
            m = df.merge(fdf, left_on="src", right_on="v", how="inner")
            return pa.table(
                {
                    "root": m["root"].to_numpy().astype(np.int64),
                    "src": m["src"].to_numpy().astype(np.int64),
                    "dst": m["dst"].to_numpy().astype(np.int64),
                }
            )

        expanded = edges.map_batches(probe, batch_format="pyarrow")
        if mode == "first":
            top = grouped_top_k(expanded, ["root", "src"], ["dst"], k=fanout, descending=False)
        else:

            def add_rank(df: pd.DataFrame, _hop=hop) -> pd.DataFrame:
                df = df.copy()
                with np.errstate(over="ignore"):
                    key = (
                        df["root"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                        ^ df["src"].to_numpy().astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
                        ^ df["dst"].to_numpy().astype(np.uint64) * np.uint64(0x94D049BB133111EB)
                        ^ np.uint64((rng_seed << 8) + _hop)
                    )
                df["_rank"] = splitmix64(key).astype(np.int64)
                return df

            top = grouped_top_k(
                expanded.map_batches(add_rank, batch_format="pandas"),
                ["root", "src"],
                ["_rank", "dst"],
                k=fanout,
                descending=False,
            ).map_batches(lambda df: df.drop(columns=["_rank"]), batch_format="pandas")

        def add_hop(df: pd.DataFrame, _hop=hop) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "root": df["root"].to_numpy().astype(np.int64),
                    "hop": np.full(len(df), _hop, dtype=np.int64),
                    "src": df["src"].to_numpy().astype(np.int64),
                    "dst": df["dst"].to_numpy().astype(np.int64),
                }
            )

        # materialize: the hop result is bounded (frontier x fanout) and is
        # consumed twice (frontier extraction now, the returned union later)
        hop_ds = top.map_batches(add_hop, batch_format="pandas").union(typed_empty).materialize()
        out = out.union(hop_ds)
        # next frontier: distinct (root, dst) — bounded by frontier x fanout,
        # and needed on the driver anyway for the next hop's broadcast
        nxt = to_pandas_typed(hop_ds)
        frontier = (
            nxt[["root", "dst"]].drop_duplicates().rename(columns={"dst": "v"}).reset_index(drop=True)
            if len(nxt)
            else frontier.iloc[:0]
        )

    return out
