"""Host-level link graph — collapse page edges to (src_host, dst_host, weight).

The classic webgraph "domain graph" rollup: each page vertex maps to its
URL's host, and the host edge weight is the number of page-level links
between the two hosts. Same id-compaction pattern as the page pipeline
(reference src/tools/gconverter.cpp semantics lifted one level): distinct
hosts get dense ids, edges remap through the vid->hid map, then a
two-key grouped count with per-batch pre-aggregation so the shuffle moves
partial counts, not raw edges.

Scale notes: the host map (host string -> hid) is tiny relative to the
url map and broadcasts; the vid->hid map has url cardinality, so above
``broadcast_limit`` the remap switches to two hash-partitioned
``Dataset.join`` passes instead of a driver-assembled dense array.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .edges import _distinct, zip_with_index

_HOST_PATTERN = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?P<host>[^/?#]+)"


def host_of(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized host extraction (scheme://HOST/...); no match -> ''."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ex = pc.extract_regex(col, pattern=_HOST_PATTERN)
    return pc.fill_null(pc.struct_field(ex, "host"), "")


def _aggregate_edge_weights(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(src, dst) rows -> (src, dst, weight=count): per-batch pyarrow
    group_by combiner, then ONE global two-key groupby over the partials."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["src", "dst"]).aggregate([("src", "count")])
        return pa.table({"src": g.column("src"), "dst": g.column("dst"), "n": g.column("src_count")})

    counted = edges.map_batches(partial, batch_format="pyarrow").groupby(["src", "dst"]).sum("n")
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


def build_host_map(url_map: ray.data.Dataset) -> ray.data.Dataset:
    """(url, vid) -> (host, hid) with dense contiguous hids."""
    hosts = url_map.map_batches(
        lambda t: pa.table({"host": host_of(t.column("url"))}), batch_format="pyarrow"
    )
    return zip_with_index(_distinct(hosts, ["host"]), id_col="hid")


def host_edges(
    edges: ray.data.Dataset,
    url_map: ray.data.Dataset,
    broadcast_limit: int = 50_000_000,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Page edge table (src, dst vids) + url map -> (host edge Dataset
    (src, dst, weight), host map Dataset (host, hid)). Self-loops (links
    within one host) are kept; callers can filter them."""
    host_map = build_host_map(url_map)

    # vid -> hid: probe the (small) host map per url batch, vectorized
    _hm_empty = pa.table({"host": pa.array([], pa.string()), "hid": pa.array([], pa.uint64())})
    hm_tbl = pa.concat_tables(
        [t for t in ray.get(host_map.to_arrow_refs()) if t.num_rows] or [_hm_empty]
    )
    hm_ref = ray.put(
        (
            hm_tbl.column("host").combine_chunks(),
            hm_tbl.column("hid").to_numpy(zero_copy_only=False).astype(np.uint64),
        )
    )

    class HostJoin:
        def __init__(self):
            self.hosts, self.hids = ray.get(hm_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            h = host_of(t.column("url"))
            idx = pc.fill_null(pc.index_in(h, value_set=self.hosts), 0)
            pos = idx.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            return pa.table(
                {"vid": t.column("vid"), "hid": pa.array(self.hids[pos], pa.uint64())}
            )

    vmap = url_map.map_batches(HostJoin, batch_format="pyarrow", concurrency=(1, 8))

    n_urls = url_map.count()
    if n_urls <= broadcast_limit:
        # dense vid->hid array broadcast once (vids are zip_with_index
        # contiguous); zero-copy from plasma per node
        _vm_empty = pa.table({"vid": pa.array([], pa.uint64()), "hid": pa.array([], pa.uint64())})
        vm_tbl = pa.concat_tables(
            [t for t in ray.get(vmap.to_arrow_refs()) if t.num_rows] or [_vm_empty]
        )
        dense = np.zeros(n_urls, dtype=np.uint64)
        dense[vm_tbl.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)] = (
            vm_tbl.column("hid").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        dense_ref = ray.put(dense)

        class EdgeRemap:
            def __init__(self):
                self.hid_of = ray.get(dense_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                return pa.table(
                    {
                        "src": pa.array(self.hid_of[s], pa.uint64()),
                        "dst": pa.array(self.hid_of[d], pa.uint64()),
                    }
                )

        remapped = edges.map_batches(EdgeRemap, batch_format="pyarrow", concurrency=(1, 8))
    else:
        # scale path: two hash-partitioned joins, no driver-side array
        nparts = max(2, int(ray.cluster_resources().get("CPU", 4)))
        as_src = vmap.map_batches(
            lambda t: pa.table({"src": t.column("vid"), "src_hid": t.column("hid")}),
            batch_format="pyarrow",
        )
        as_dst = vmap.map_batches(
            lambda t: pa.table({"dst": t.column("vid"), "dst_hid": t.column("hid")}),
            batch_format="pyarrow",
        )
        remapped = (
            edges.join(as_src, "inner", num_partitions=nparts, on=("src",))
            .join(as_dst, "inner", num_partitions=nparts, on=("dst",))
            .map_batches(
                lambda t: pa.table({"src": t.column("src_hid"), "dst": t.column("dst_hid")}),
                batch_format="pyarrow",
            )
        )

    return _aggregate_edge_weights(remapped), host_map
