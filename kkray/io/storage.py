"""Edge-file storage formats — parity with the reference's readers/writers
(SURVEY.md §2.1).

* binary edge file (reference read_graph/write_graph, include/storage.hpp:36-66):
  raw packed little-endian records — (src u64, dst u64) unweighted or
  (src u64, dst u64, weight f32) weighted. (The reference packs u32 vids,
  type.hpp:30; we widen to u64 for 10^12-doc scale — SURVEY §4 scale
  limits. Record layout is otherwise the same idea: edge count =
  filesize / record size, readers slice by byte ranges.)
* text edge list (reference read_edgelist/write_edgelist,
  include/storage.hpp:107-186): "src dst" or "src dst weight" lines;
  reading is a Ray Data read_text + vectorized parse map_batches (the
  newline-boundary partitioning of storage.hpp:84-105 comes free with
  block splitting).
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

_REC_UNW = np.dtype([("src", "<u8"), ("dst", "<u8")])
_REC_W = np.dtype([("src", "<u8"), ("dst", "<u8"), ("weight", "<f4")])


def write_binary_edges(path: str, src: np.ndarray, dst: np.ndarray, weight: np.ndarray | None = None):
    rec = np.empty(len(src), dtype=_REC_W if weight is not None else _REC_UNW)
    rec["src"] = src
    rec["dst"] = dst
    if weight is not None:
        rec["weight"] = weight
    rec.tofile(path)


def read_binary_edges(path: str, weighted: bool = False, num_blocks: int = 8) -> ray.data.Dataset:
    """Distributed binary edge read: byte-range slices at record
    boundaries, one read task per slice (the per-rank contiguous slicing of
    reference storage.hpp:36-55, expressed as Ray tasks -> Dataset)."""
    rec = _REC_W if weighted else _REC_UNW
    n = os.path.getsize(path) // rec.itemsize
    bounds = np.linspace(0, n, num_blocks + 1).astype(np.int64)

    @ray.remote
    def read_slice(lo: int, hi: int) -> pa.Table:
        arr = np.fromfile(path, dtype=rec, count=hi - lo, offset=lo * rec.itemsize)
        cols = {"src": pa.array(arr["src"], pa.uint64()), "dst": pa.array(arr["dst"], pa.uint64())}
        if weighted:
            cols["weight"] = pa.array(arr["weight"], pa.float32())
        return pa.table(cols)

    refs = [read_slice.remote(int(lo), int(hi)) for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]
    if not refs:
        cols = {"src": pa.array([], pa.uint64()), "dst": pa.array([], pa.uint64())}
        if weighted:
            cols["weight"] = pa.array([], pa.float32())
        return ray.data.from_arrow(pa.table(cols))
    return ray.data.from_arrow_refs(refs)


def _write_text_blocks(ds: ray.data.Dataset, out_dir: str, col: str = "text"):
    """Plain-text sink: one file per block (reference writes one file per
    rank, walk.hpp:829-832)."""
    os.makedirs(out_dir, exist_ok=True)
    refs = ds.to_arrow_refs()

    @ray.remote
    def dump(t: pa.Table, path: str) -> int:
        with open(path, "w") as f:
            for line in t.column(col).to_pylist():
                f.write(line + "\n")
        return t.num_rows

    ray.get([dump.remote(r, os.path.join(out_dir, "part-%05d.txt" % i)) for i, r in enumerate(refs)])


def write_edgelist_text(edges: ray.data.Dataset, path: str):
    """Text edge list writer (reference write_edgelist, storage.hpp:159-186):
    one "src dst [weight]" line per edge, one file per block."""

    def to_lines(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        if "weight" in t.column_names:
            w = t.column("weight").to_numpy(zero_copy_only=False)
            lines = ["%d %d %g" % (a, b, c) for a, b, c in zip(src, dst, w)]
        else:
            lines = ["%d %d" % (a, b) for a, b in zip(src, dst)]
        return pa.table({"text": pa.array(lines, pa.string())})

    _write_text_blocks(edges.map_batches(to_lines, batch_format="pyarrow"), path)


def read_edgelist_text(paths: str | list[str], weighted: bool = False) -> ray.data.Dataset:
    """Text edge list reader (reference read_edgelist, storage.hpp:124-157):
    whitespace-separated "src dst [weight]" lines. The parse is fully
    vectorized pyarrow.compute (SURVEY §2.1 S4): one whitespace-run split
    per batch, list-element extraction, and string->numeric casts — no
    Python loop over lines (this is the 100-TB text-ingest route)."""
    import pyarrow.compute as pc

    txt = ray.data.read_text(paths)
    need = 3 if weighted else 2

    def parse(t: pa.Table) -> pa.Table:
        col = pc.cast(t.column("text"), pa.string())
        # split_whitespace merges interior runs but does NOT drop
        # leading/trailing whitespace (it emits empty tokens there, which
        # would shift fields / fail the numeric cast) — trim first
        col = pc.utf8_trim_whitespace(col)
        toks = pc.utf8_split_whitespace(col)
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        keep = pc.greater_equal(pc.list_value_length(toks), need)
        toks = pc.filter(toks, keep)
        cols = {
            "src": pc.cast(pc.list_element(toks, 0), pa.uint64()),
            "dst": pc.cast(pc.list_element(toks, 1), pa.uint64()),
        }
        if weighted:
            cols["weight"] = pc.cast(pc.list_element(toks, 2), pa.float32())
        return pa.table(cols)

    return txt.map_batches(parse, batch_format="pyarrow")


def gconvert(text_path: str, bin_path: str, weighted: bool = False):
    """Text -> binary converter (the reference's gconverter tool,
    src/tools/gconverter.cpp:93-115). Streams batch-by-batch through
    ``iter_batches`` (backpressured; O(batch) driver memory) — never
    materializes the edge list on the driver."""
    rec_t = _REC_W if weighted else _REC_UNW
    ds = read_edgelist_text(text_path, weighted=weighted)
    with open(bin_path, "wb") as f:
        for t in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            rec = np.empty(t.num_rows, dtype=rec_t)
            rec["src"] = t.column("src").to_numpy(zero_copy_only=False)
            rec["dst"] = t.column("dst").to_numpy(zero_copy_only=False)
            if weighted:
                rec["weight"] = t.column("weight").to_numpy(zero_copy_only=False)
            rec.tofile(f)


def dump_paths_text(paths: ray.data.Dataset, out_dir: str, with_head_info: bool = False):
    """Walk-path text dump (reference PathSet::dump, include/path.hpp:85-109):
    one path per line, vertices space-separated; with_head_info prepends
    "walker_id length"."""

    def to_lines(t: pa.Table) -> pa.Table:
        wids = t.column("walker_id").to_pylist()
        lens = t.column("length").to_pylist()
        ps = t.column("path").to_pylist()
        if with_head_info:
            lines = ["%d %d %s" % (w, l, " ".join(map(str, p))) for w, l, p in zip(wids, lens, ps)]
        else:
            lines = [" ".join(map(str, p)) for p in ps]
        return pa.table({"text": pa.array(lines, pa.string())})

    _write_text_blocks(paths.map_batches(to_lines, batch_format="pyarrow"), out_dir)


def read_metapath_schemes(path: str) -> list[list[int]]:
    """Scheme config reader (reference read_metapath_schemes,
    src/apps/metascheme.hpp:69-116) — JSON list of schemes, each a list of
    allowed-edge-type bitmasks per position."""
    import json

    with open(path) as f:
        return [[int(m) for m in s] for s in json.load(f)]


def write_metapath_schemes(path: str, schemes: list[list[int]]):
    import json

    with open(path, "w") as f:
        json.dump([[int(m) for m in s] for s in schemes], f)
