"""Host-level link graph rollup vs a pure-python oracle (the domain-graph
analogue of the reference's gconverter id-compaction, one level up)."""
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from kkray.io.edges import build_edge_table
from kkray.io.hostgraph import host_edges, host_of
from kkray.io.synth import synth_pages

_HOST_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)")


def _oracle(edges_df, url_df):
    vid2host = {
        v: _HOST_RE.match(u).group(1) for v, u in zip(url_df["vid"], url_df["url"])
    }
    return Counter((vid2host[s], vid2host[d]) for s, d in zip(edges_df["src"], edges_df["dst"]))


def _named(he_df, hm_df):
    hid2host = dict(zip(hm_df["hid"], hm_df["host"]))
    return {(hid2host[s], hid2host[d]): int(w) for s, d, w in zip(he_df["src"], he_df["dst"], he_df["weight"])}


def test_host_edges_matches_oracle(ray_session):
    pages = ray.data.from_arrow(synth_pages(400, seed=7)[0])
    edges, url_map = build_edge_table(pages)
    exp = _oracle(edges.to_pandas(), url_map.to_pandas())
    he, hm = host_edges(edges, url_map)
    got = _named(he.to_pandas(), hm.to_pandas())
    assert got == dict(exp)
    # hids dense and contiguous
    hm_df = hm.to_pandas()
    assert sorted(hm_df["hid"]) == list(range(len(hm_df)))


def test_host_edges_join_path_matches_broadcast(ray_session):
    pages = ray.data.from_arrow(synth_pages(300, seed=11)[0])
    edges, url_map = build_edge_table(pages)
    he_b, _ = host_edges(edges, url_map)
    he_j, _ = host_edges(edges, url_map, broadcast_limit=10)  # force joins
    key = lambda df: sorted(zip(df["src"].astype(int), df["dst"].astype(int), df["weight"].astype(int)))
    assert key(he_b.to_pandas()) == key(he_j.to_pandas())


def test_host_of_hostile_inputs():
    col = pa.array(
        [
            "http://a.b/x",
            "https://h.example.com:8080/p?q#f",
            "ftp://f.example.org",
            "notaurl",
            "",
            "://missing-scheme.com/",
        ]
    )
    assert host_of(col).to_pylist() == [
        "a.b",
        "h.example.com:8080",
        "f.example.org",
        "",
        "",
        "",
    ]


def test_host_pagerank_weighted_end_to_end(ray_session):
    """Weighted pagerank over the host rollup — top host must be the one
    with the most inbound link weight (sanity, not an exact oracle)."""
    from kkray.analytics import pagerank
    from kkray.graph import Graph

    pages = ray.data.from_arrow(synth_pages(400, seed=7)[0])
    edges, url_map = build_edge_table(pages)
    he, hm = host_edges(edges, url_map)
    he_df = he.to_pandas()
    n_hosts = hm.count()
    src = he_df["src"].to_numpy(np.int64)
    dst = he_df["dst"].to_numpy(np.int64)
    w = he_df["weight"].to_numpy(np.float64)
    with Graph.from_arrays(src, dst, num_parts=2, v_num=n_hosts, weight=w) as g:
        r = pagerank(g, max_iters=50, tol=None, weighted=True)
    assert abs(r.sum() - 1.0) < 1e-8
    # python oracle
    from graphgen import pagerank_w_oracle

    exp = pagerank_w_oracle(src, dst, w, n_hosts, iters=50)
    assert np.allclose(r, exp, atol=1e-10)
