"""Edge-table build (pages -> id-mapped deduped edges) vs pure-python oracle.

Mirrors the reference's structural round-trip technique
(reference src/tests/test_graph.cpp:70-124: loaded edge multiset must equal
the generator's, including the undirected expansion)."""
import numpy as np
import pyarrow as pa
import ray.data

from kkray.io.edges import build_edge_table, dedup_edges, undirect, zip_with_index
from kkray.io.extract import normalize_url
from kkray.io.synth import synth_pages


def _oracle(meta):
    crawled = sorted({normalize_url(u) for u in meta.urls})
    ids = {u: i for i, u in enumerate(crawled)}
    exp = set()
    for a, b in meta.expected_edges:
        na, nb = normalize_url(a), normalize_url(b)
        if na in ids and nb in ids:
            exp.add((ids[na], ids[nb]))
    return crawled, exp


def test_build_edge_table_matches_oracle(ray_session):
    t, meta = synth_pages(150, seed=42)
    edges, url_map = build_edge_table(ray.data.from_arrow(t))
    crawled, exp = _oracle(meta)
    um = url_map.to_pandas().sort_values("vid")
    assert list(um["url"]) == crawled
    ep = edges.to_pandas()
    got = set(zip(ep["src"].astype(int), ep["dst"].astype(int)))
    assert got == exp
    assert len(ep) == len(got)  # dedup removed duplicates


def test_build_edge_table_shuffle_join_path(ray_session):
    """Force broadcast_limit below the dictionary size so the hash-
    partitioned Dataset.join path runs; it must match the broadcast-probe
    path edge-for-edge."""
    t, meta = synth_pages(150, seed=42)
    edges, _ = build_edge_table(ray.data.from_arrow(t), broadcast_limit=10)
    _, exp = _oracle(meta)
    ep = edges.to_pandas()
    got = set(zip(ep["src"].astype(int), ep["dst"].astype(int)))
    assert got == exp
    assert len(ep) == len(got)


def test_undirect_adds_reverse_edges(ray_session):
    tbl = pa.table({"src": pa.array([0, 1, 2], pa.uint64()), "dst": pa.array([1, 2, 0], pa.uint64())})
    out = undirect(ray.data.from_arrow(tbl)).to_pandas()
    got = sorted(zip(out["src"].astype(int), out["dst"].astype(int)))
    assert got == sorted([(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2)])


def test_dedup_edges_first_wins(ray_session):
    tbl = pa.table(
        {
            "src": pa.array([5, 5, 5, 1, 1], pa.uint64()),
            "dst": pa.array([7, 7, 8, 2, 2], pa.uint64()),
        }
    )
    out = dedup_edges(ray.data.from_arrow(tbl)).to_pandas()
    got = sorted(zip(out["src"].astype(int), out["dst"].astype(int)))
    assert got == [(1, 2), (5, 7), (5, 8)]


def test_zip_with_index_dense_and_ordered(ray_session):
    ds = ray.data.from_items([{"url": "u%04d" % i} for i in range(977)]).repartition(7).sort("url")
    out = zip_with_index(ds).to_pandas().sort_values("vid")
    assert list(out["vid"]) == list(range(977))
    assert list(out["url"]) == ["u%04d" % i for i in range(977)]


def test_parquet_round_trip(ray_session, tmp_path):
    """Storage round-trip, the reference's test_storage.cpp:114-119 analogue."""
    t, _ = synth_pages(60, seed=42)
    edges, _ = build_edge_table(ray.data.from_arrow(t))
    before = edges.to_pandas()
    path = str(tmp_path / "edges")
    edges.write_parquet(path)
    after = ray.data.read_parquet(path).to_pandas()
    key = lambda df: sorted(zip(df["src"].astype(int), df["dst"].astype(int)))
    assert key(before) == key(after)
