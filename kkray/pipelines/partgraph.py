"""Canonical graphs derived deterministically from the driver testdata
(TPC-H-ish tables) — the SQL-oracle-checkable input for the graph engine.

Two graphs over part keys from ``lineitem``:

* **order-chain digraph**: a directed edge (a.l_partkey -> b.l_partkey) for
  consecutive line numbers within an order (b.l_linenumber =
  a.l_linenumber + 1), distinct, self-loops removed. DuckDB-expressible as
  a self-join — the PageRank/degree oracle graph.
* **co-occurrence graph** (undirected): distinct {a,b} part pairs sharing
  an order, a < b; engine side materializes both directions. The
  CC/LP/triangle oracle graph.

Vertex ids are the part keys themselves (dense enough: p_partkey is
1..P*200); v_num = max partkey + 1.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..relational.join import consecutive_pairs


def lineitem_ds(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_partkey"]
    )


def order_chain_edges(sf_dir: str) -> ray.data.Dataset:
    """Directed distinct (src,dst) part pairs, consecutive within order."""
    pairs = consecutive_pairs(lineitem_ds(sf_dir), "l_orderkey", "l_linenumber", "l_partkey")
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t.column("src"), t.column("dst")))),
        batch_format="pyarrow",
    )
    from ..io.edges import dedup_edges

    return dedup_edges(pairs)


def order_chain_edges_weighted(sf_dir: str) -> ray.data.Dataset:
    """Directed (src, dst, weight) part pairs where weight = how many times
    the consecutive pair occurs across orders (the weighted-graph oracle
    input: SQL `GROUP BY src, dst -> COUNT(*)`). Pre-aggregated per batch
    (pyarrow group_by combiner) before the global two-key groupby, so the
    shuffle moves partial counts, not the raw pair explode."""
    pairs = consecutive_pairs(lineitem_ds(sf_dir), "l_orderkey", "l_linenumber", "l_partkey")

    def partial_counts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("src"), t.column("dst"))))
        g = t.group_by(["src", "dst"]).aggregate([("src", "count")])
        return pa.table(
            {"src": g.column("src"), "dst": g.column("dst"), "n": g.column("src_count")}
        )

    counted = (
        pairs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .sum("n")
    )
    return counted.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "weight": pc.cast(t.column("sum(n)"), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )


def cooccurrence_edges(sf_dir: str, num_partitions: int = 16) -> ray.data.Dataset:
    """Undirected distinct co-occurring part pairs (both directions).
    Expressed as a hash-partitioned self-join on the order key (the
    all-pairs-within-group explode), then src<dst filter + exact dedup —
    fully vectorized, no per-group python calls."""
    li = lineitem_ds(sf_dir)

    def left(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t.column("l_orderkey"), "src": t.column("l_partkey").cast(pa.int64())})

    def right(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t.column("l_orderkey"), "dst": t.column("l_partkey").cast(pa.int64())})

    joined = li.map_batches(left, batch_format="pyarrow").join(
        li.map_batches(right, batch_format="pyarrow"),
        "inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
    )
    pairs = joined.map_batches(
        lambda t: t.filter(pc.less(t.column("src"), t.column("dst"))).select(["src", "dst"]),
        batch_format="pyarrow",
    )
    from ..io.edges import dedup_edges, undirect

    return undirect(dedup_edges(pairs))


def graph_from_edges(edges: ray.data.Dataset, num_parts: int = 8):
    from ..graph import Graph

    return Graph.from_dataset(edges, num_parts=num_parts)
