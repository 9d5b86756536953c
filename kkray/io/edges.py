"""Pages -> url-id-mapped, deduplicated Parquet edge table (SURVEY.md §7.1 M0.5).

Replaces the reference's ``gconverter`` text->binary converter
(reference src/tools/gconverter.cpp:93-115) with an idiomatic Ray Data
pipeline:

    pages ─ map_batches(ExtractLinks) ─> (src_url, dst_url)
          ─ distinct urls ─ sort ─ distributed zip-with-index ─> url map
          ─ id join (broadcast dict; bucketed hash join is the >RAM path)
          ─ local pre-dedup + global (src,dst) distinct  [exact dedup]
          ─ optional undirect (reference include/graph.hpp:430-443)
          ─> edges(src: uint64, dst: uint64)

Scale notes (100 TB design): the url dictionary at 10^12 docs does not fit
one node — ``zip_with_index`` below is already distributed (block-wise
prefix offsets over object-store refs, no driver materialization), and
``map_edge_ids`` switches from the broadcast dict to a hash-bucketed join
when the dictionary exceeds ``broadcast_limit`` rows.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .extract import ExtractLinks


def links_from_pages(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(url, html, ...) -> (src_url, dst_url), normalized, dupes preserved."""
    return pages.map_batches(ExtractLinks, batch_format="pyarrow", concurrency=(1, 8))


def _distinct(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """Exact distinct on `cols` (SURVEY.md §2.6 'set ops'): local per-batch
    dedup combiner, then the shard-then-vectorize global dedup
    (kkray.ops.distinct_rows — one vectorized call per coarse shard, not
    one python call per distinct key)."""
    from ..ops import distinct_rows

    return distinct_rows(ds, cols)


def zip_with_index(ds: ray.data.Dataset, id_col: str = "vid") -> ray.data.Dataset:
    """Distributed dense-id assignment over a (sorted) Dataset.

    Block-wise: fetch row counts per block (small scalar tasks over
    zero-copy refs), prefix-sum the offsets on the driver (O(#blocks)),
    then append the id column per block. No full materialization on the
    driver; this is the Ray-native analogue of the reference's contiguous
    per-rank vertex ranges (reference include/graph.hpp:461-494).
    """
    refs = ds.to_arrow_refs()

    # to_arrow_refs can still hand back PANDAS blocks (groupby/map_groups
    # emits empty pandas blocks for unpopulated groups) — count and
    # convert defensively
    @ray.remote
    def _count(t) -> int:
        return t.num_rows if isinstance(t, pa.Table) else len(t)

    counts = ray.get([_count.remote(r) for r in refs])
    # zero-row blocks can come out of a groupby with a degenerate schema —
    # drop them (they contribute no ids anyway)
    refs = [r for r, c in zip(refs, counts) if c > 0]
    counts = [c for c in counts if c > 0]
    if not refs:
        schema = ds.schema(fetch_if_missing=True)
        base = getattr(schema, "base_schema", None) if schema is not None else None
        fields = list(base) if base is not None else []
        cols = {f.name: pa.array([], f.type) for f in fields}
        cols[id_col] = pa.array([], pa.uint64())
        return ray.data.from_arrow(pa.table(cols))
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.uint64)

    @ray.remote
    def _add(t, off: int) -> pa.Table:
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        ids = pa.array(np.arange(off, off + t.num_rows, dtype=np.uint64), pa.uint64())
        return t.append_column(id_col, ids)

    out_refs = [_add.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def build_url_map(links: ray.data.Dataset, restrict_to_crawled: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """Distinct urls -> sorted -> dense uint64 vids.

    If `restrict_to_crawled` (a Dataset with a `url` column) is given, only
    crawled pages get vertex ids — edges to external urls are dropped at the
    id join (the controlled-graph mode used by the analytics tests).
    """
    if restrict_to_crawled is not None:
        urls = restrict_to_crawled.map_batches(
            lambda t: t.select(["url"]), batch_format="pyarrow"
        )
    else:
        srcs = links.map_batches(lambda t: pa.table({"url": t.column("src_url")}), batch_format="pyarrow")
        dsts = links.map_batches(lambda t: pa.table({"url": t.column("dst_url")}), batch_format="pyarrow")
        urls = srcs.union(dsts)
    distinct = _distinct(urls, ["url"]).sort("url")
    return zip_with_index(distinct, "vid")


def map_edge_ids(
    links: ray.data.Dataset,
    url_map: ray.data.Dataset,
    broadcast_limit: int = 50_000_000,
) -> ray.data.Dataset:
    """Join (src_url, dst_url) against the url map twice -> (src, dst).

    Small-side broadcast: the dict is `ray.put` ONCE and read per actor in
    __init__ — never re-shipped per batch. Edges whose endpoint is not in
    the map (external urls in restricted mode) are dropped.
    """
    n = url_map.count()
    if n > broadcast_limit:
        return _map_edge_ids_shuffle(links, url_map)
    map_tbl = pa.concat_tables(
        [t for t in ray.get(url_map.to_arrow_refs()) if t.num_rows > 0 or t.num_columns == 2]
        or [pa.table({"url": pa.array([], pa.string()), "vid": pa.array([], pa.uint64())})]
    )
    # broadcast the dictionary as ARROW ARRAYS (zero-copy from plasma per
    # node) and probe with the vectorized pc.index_in kernel — no python
    # dict, no per-row loop
    lookup_ref = ray.put(
        (
            map_tbl.column("url").combine_chunks(),
            map_tbl.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64),
        )
    )

    class IdJoin:
        def __init__(self):
            self.urls, self.vids = ray.get(lookup_ref)

        def _probe(self, col) -> tuple[np.ndarray, np.ndarray]:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if len(self.vids) == 0:
                return np.zeros(len(col), np.uint64), np.zeros(len(col), bool)
            idx = pc.index_in(col, value_set=self.urls)
            found = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            # fill nulls BEFORE to_numpy (nulls would force a NaN float cast)
            pos = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            vid = self.vids[pos]
            return vid, found

        def __call__(self, t: pa.Table) -> pa.Table:
            src, ok_s = self._probe(t.column("src_url"))
            dst, ok_d = self._probe(t.column("dst_url"))
            keep = ok_s & ok_d
            return pa.table({"src": pa.array(src[keep], pa.uint64()), "dst": pa.array(dst[keep], pa.uint64())})

    return links.map_batches(IdJoin, batch_format="pyarrow", concurrency=(1, 8))


def _map_edge_ids_shuffle(
    links: ray.data.Dataset, url_map: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """The >broadcast_limit path: two hash-partitioned ``Dataset.join``s
    against the url dictionary (inner joins drop unmapped endpoints — same
    semantics as the broadcast probe). Each join is one all-to-all on the
    url key; at 10^12 urls this is the only shape that works.

    num_partitions defaults to the cluster CPU count: the hash-shuffle
    aggregator pool holds one actor per partition, and a partition count
    far above the CPU count stalls small clusters (verified: 64 partitions
    deadlock a 4-CPU session)."""
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))

    def as_src_map(t: pa.Table) -> pa.Table:
        return pa.table({"src_url": t.column("url"), "src": t.column("vid")})

    def as_dst_map(t: pa.Table) -> pa.Table:
        return pa.table({"dst_url": t.column("url"), "dst": t.column("vid")})

    smap = url_map.map_batches(as_src_map, batch_format="pyarrow")
    dmap = url_map.map_batches(as_dst_map, batch_format="pyarrow")
    j1 = links.select_columns(["src_url", "dst_url"]).join(
        smap, "inner", num_partitions=num_partitions, on=("src_url",)
    )
    j2 = j1.join(dmap, "inner", num_partitions=num_partitions, on=("dst_url",))
    return j2.select_columns(["src", "dst"])


def dedup_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Exact (src,dst) first-wins dedup (SURVEY.md §2.7)."""
    return _distinct(edges, ["src", "dst"])


def undirect(edges: ray.data.Dataset, drop_self_loops: bool = False) -> ray.data.Dataset:
    """Emit each edge both ways (reference include/graph.hpp:430-443 emits
    the reversed copy of every edge when load_as_undirected)."""

    def rev(t: pa.Table) -> pa.Table:
        out = pa.table({"src": t.column("dst"), "dst": t.column("src")})
        both = pa.concat_tables([t.select(["src", "dst"]), out])
        if drop_self_loops:
            both = both.filter(pc.invert(pc.equal(both.column("src"), both.column("dst"))))
        return both

    return edges.map_batches(rev, batch_format="pyarrow")


def build_edge_table(
    pages: ray.data.Dataset,
    restrict_to_crawled: bool = True,
    deduplicate: bool = True,
    undirected: bool = False,
    broadcast_limit: int = 50_000_000,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """End-to-end pages -> (edges, url_map). The M0.5 pipeline."""
    links = links_from_pages(pages)
    url_map = build_url_map(links, pages if restrict_to_crawled else None)
    edges = map_edge_ids(links, url_map, broadcast_limit=broadcast_limit)
    if deduplicate:
        edges = dedup_edges(edges)
    if undirected:
        edges = undirect(edges)
    return edges, url_map
