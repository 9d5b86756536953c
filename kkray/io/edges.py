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

    @ray.remote
    def _count(t: pa.Table) -> int:
        return t.num_rows

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
    def _add(t: pa.Table, off: int) -> pa.Table:
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
        raise NotImplementedError(
            "url dictionary > broadcast_limit: use the bucketed hash join "
            "(kkray.relational.join.hash_join) — wired in a later milestone"
        )
    map_tbl = pa.concat_tables(
        [t for t in ray.get(url_map.to_arrow_refs()) if t.num_rows > 0 or t.num_columns == 2]
        or [pa.table({"url": pa.array([], pa.string()), "vid": pa.array([], pa.uint64())})]
    )
    lookup_ref = ray.put(dict(zip(map_tbl.column("url").to_pylist(), map_tbl.column("vid").to_numpy(zero_copy_only=False))))

    class IdJoin:
        def __init__(self):
            self.lut = ray.get(lookup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            src = np.array([self.lut.get(u, np.uint64(0xFFFFFFFFFFFFFFFF)) for u in t.column("src_url").to_pylist()], dtype=np.uint64)
            dst = np.array([self.lut.get(u, np.uint64(0xFFFFFFFFFFFFFFFF)) for u in t.column("dst_url").to_pylist()], dtype=np.uint64)
            keep = (src != np.uint64(0xFFFFFFFFFFFFFFFF)) & (dst != np.uint64(0xFFFFFFFFFFFFFFFF))
            return pa.table({"src": pa.array(src[keep], pa.uint64()), "dst": pa.array(dst[keep], pa.uint64())})

    return links.map_batches(IdJoin, batch_format="pyarrow", concurrency=(1, 8))


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
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """End-to-end pages -> (edges, url_map). The M0.5 pipeline."""
    links = links_from_pages(pages)
    url_map = build_url_map(links, pages if restrict_to_crawled else None)
    edges = map_edge_ids(links, url_map)
    if deduplicate:
        edges = dedup_edges(edges)
    if undirected:
        edges = undirect(edges)
    return edges, url_map
