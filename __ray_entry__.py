"""Driver contract for the kkray engine.

``queries()`` exposes one entry per operator family from SURVEY.md §2 (plus
the training-data ops the build brief adds); ``oracle_sql()`` gives the
DuckDB-equivalent for every SQL-expressible one, over the pre-registered
testdata views. Graph queries run on two canonical graphs derived
deterministically from ``lineitem`` (kkray.pipelines.partgraph) so the SQL
side can reconstruct exactly the same edges.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.

Float columns are rounded identically on both sides (engine + SQL) so the
driver's order-insensitive value-hash is deterministic.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------- helpers

_ORDER_CHAIN_SQL = """
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
    WHERE a.l_partkey <> b.l_partkey
"""

_COOC_HALF_SQL = """
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
"""

_COOC_BOTH_SQL = f"""
    SELECT src, dst FROM ({_COOC_HALF_SQL})
    UNION ALL
    SELECT dst AS src, src AS dst FROM ({_COOC_HALF_SQL})
"""

# weighted chain graph: weight = occurrence count of the consecutive pair
_ORDER_CHAIN_W_SQL = """
    SELECT a.l_partkey AS src, b.l_partkey AS dst, CAST(COUNT(*) AS DOUBLE) AS weight
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
    WHERE a.l_partkey <> b.l_partkey
    GROUP BY 1, 2
"""


_GRAPH_CACHE: dict = {}


def _chain_arrays(sf_dir: str):
    key = ("chain", sf_dir)
    if key not in _GRAPH_CACHE:
        from kkray.pipelines.partgraph import order_chain_edges

        df = order_chain_edges(sf_dir).to_pandas()
        _GRAPH_CACHE[key] = (df["src"].to_numpy(dtype=np.int64), df["dst"].to_numpy(dtype=np.int64))
    return _GRAPH_CACHE[key]


def _cooc_arrays(sf_dir: str):
    key = ("cooc", sf_dir)
    if key not in _GRAPH_CACHE:
        from kkray.pipelines.partgraph import cooccurrence_edges

        df = cooccurrence_edges(sf_dir).to_pandas()
        _GRAPH_CACHE[key] = (df["src"].to_numpy(dtype=np.int64), df["dst"].to_numpy(dtype=np.int64))
    return _GRAPH_CACHE[key]


def _chain_w_arrays(sf_dir: str):
    key = ("chain_w", sf_dir)
    if key not in _GRAPH_CACHE:
        from kkray.pipelines.partgraph import order_chain_edges_weighted

        df = order_chain_edges_weighted(sf_dir).to_pandas()
        _GRAPH_CACHE[key] = (
            df["src"].to_numpy(dtype=np.int64),
            df["dst"].to_numpy(dtype=np.int64),
            df["weight"].to_numpy(dtype=np.float64),
        )
    return _GRAPH_CACHE[key]


def _dense_graph(src, dst, num_parts=8):
    """Remap sparse part keys to dense vids; return (graph, verts) where
    verts[i] is the part key of dense id i."""
    from kkray.graph import Graph

    verts = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(verts, src)
    d = np.searchsorted(verts, dst)
    return Graph.from_arrays(s, d, num_parts=num_parts, v_num=len(verts)), verts


PR_ITERS = 10
PR_DAMPING = 0.85
LP_ITERS = 3
HITS_ITERS = 5
BFS_CAP = 64  # distance cap == engine max_iters == SQL recursion bound
SSSP_ROUNDS = 16  # >= observed Bellman-Ford convergence (4 worst case)
KCORE_K = 68  # nontrivial partial core on the cooc graph at sf0.001 AND sf0.01
KCORE_SQL_ROUNDS = 24  # >= observed peel rounds (7 worst case) at both SFs, 3.4x margin; _q_kcore asserts engine rounds <= this


def _pagerank_sql() -> str:
    """Unrolled fixed-iteration PageRank with dangling mass, matching
    kkray.analytics.pagerank semantics exactly."""
    pre = f"""
WITH edges AS MATERIALIZED ({_ORDER_CHAIN_SQL}),
verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
nn AS MATERIALIZED (SELECT count(*) AS cnt FROM verts),
outdeg AS MATERIALIZED (SELECT src AS v, count(*) AS d FROM edges GROUP BY src),
pr0 AS (SELECT v, 1.0/(SELECT cnt FROM nn) AS score FROM verts)"""
    its = []
    for k in range(1, PR_ITERS + 1):
        p = k - 1
        its.append(
            f""",
dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.score),0) AS s FROM pr{p} p LEFT JOIN outdeg o ON p.v=o.v WHERE o.v IS NULL),
agg{k} AS MATERIALIZED (SELECT e.dst AS v, SUM(p.score/o.d) AS s
           FROM edges e JOIN pr{p} p ON e.src=p.v JOIN outdeg o ON e.src=o.v GROUP BY e.dst),
pr{k} AS MATERIALIZED (SELECT vt.v,
                 (1-{PR_DAMPING})/(SELECT cnt FROM nn)
                 + {PR_DAMPING}*(COALESCE(a.s,0)+(SELECT s FROM dang{k})/(SELECT cnt FROM nn)) AS score
          FROM verts vt LEFT JOIN agg{k} a ON vt.v=a.v)"""
        )
    return (
        pre
        + "".join(its)
        + f"""
SELECT v AS partkey, ROUND(score*(SELECT cnt FROM nn), 6) AS score_n FROM pr{PR_ITERS}"""
    )


def _pagerank_w_sql() -> str:
    """Unrolled weighted PageRank (rank flows along out-edges proportional
    to weight / Σ weight_out), matching pagerank(weighted=True) exactly."""
    pre = f"""
WITH edges AS MATERIALIZED ({_ORDER_CHAIN_W_SQL}),
verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
nn AS MATERIALIZED (SELECT count(*) AS cnt FROM verts),
outw AS MATERIALIZED (SELECT src AS v, SUM(weight) AS d FROM edges GROUP BY src),
pr0 AS (SELECT v, 1.0/(SELECT cnt FROM nn) AS score FROM verts)"""
    its = []
    for k in range(1, PR_ITERS + 1):
        p = k - 1
        its.append(
            f""",
dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.score),0) AS s FROM pr{p} p LEFT JOIN outw o ON p.v=o.v WHERE o.v IS NULL),
agg{k} AS MATERIALIZED (SELECT e.dst AS v, SUM(p.score*e.weight/o.d) AS s
           FROM edges e JOIN pr{p} p ON e.src=p.v JOIN outw o ON e.src=o.v GROUP BY e.dst),
pr{k} AS MATERIALIZED (SELECT vt.v,
                 (1-{PR_DAMPING})/(SELECT cnt FROM nn)
                 + {PR_DAMPING}*(COALESCE(a.s,0)+(SELECT s FROM dang{k})/(SELECT cnt FROM nn)) AS score
          FROM verts vt LEFT JOIN agg{k} a ON vt.v=a.v)"""
        )
    return (
        pre
        + "".join(its)
        + f"""
SELECT v AS partkey, ROUND(score*(SELECT cnt FROM nn), 6) AS score_n FROM pr{PR_ITERS}"""
    )


# --- synth-page fixtures: the generator's independently recorded ground
# truth (FIXTURES.md; pytest pins each fixture to a fresh regeneration) ---
_PAGES_GOLDEN_FIX = "/root/repo/fixtures/pages_golden_1000_seed42.parquet"
_EDGE_MANIFEST_FIX = "/root/repo/fixtures/edge_manifest_1000_seed42.parquet"
_HOST_RE_SQL = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"  # mirrors hostgraph._HOST_PATTERN

# page edge table recomputed from ground truth: dense vids are the rank of
# the crawled url in sorted order (build_url_map: distinct -> sort ->
# zip_with_index), edges to non-crawled urls drop at the id join
# (restrict_to_crawled), exact (src,dst) dedup
_PAGE_EDGES_SQL = f"""
WITH um AS MATERIALIZED (
  SELECT url, CAST(row_number() OVER (ORDER BY url) - 1 AS BIGINT) AS vid
  FROM '{_PAGES_GOLDEN_FIX}')
SELECT DISTINCT s.vid AS src, d.vid AS dst
FROM '{_EDGE_MANIFEST_FIX}' m
JOIN um s ON m.src_url = s.url
JOIN um d ON m.dst_url = d.url"""

# host-graph rollup of the deduped crawled-only page edges: weight = number
# of distinct page-level (src,dst) links between the host pair (self-loops
# kept), matching kkray.io.hostgraph.host_edges
_HOST_EDGES_SQL = f"""
WITH um AS MATERIALIZED (SELECT url FROM '{_PAGES_GOLDEN_FIX}'),
pe AS MATERIALIZED (
  SELECT DISTINCT m.src_url, m.dst_url
  FROM '{_EDGE_MANIFEST_FIX}' m
  JOIN um s ON m.src_url = s.url
  JOIN um d ON m.dst_url = d.url)
SELECT regexp_extract(src_url, '{_HOST_RE_SQL}', 1) AS src_host,
       regexp_extract(dst_url, '{_HOST_RE_SQL}', 1) AS dst_host,
       count(*) AS weight
FROM pe GROUP BY src_host, dst_host"""


def _host_pagerank_sql() -> str:
    """Unrolled weighted PageRank over the host rollup, keyed by host
    string; vertex universe = every crawled host (v_num = len(host_map)),
    matching _q_host_pagerank exactly."""
    pre = f"""
WITH hedges AS MATERIALIZED ({_HOST_EDGES_SQL}),
verts AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(url, '{_HOST_RE_SQL}', 1) AS v
  FROM '{_PAGES_GOLDEN_FIX}'),
nn AS MATERIALIZED (SELECT count(*) AS cnt FROM verts),
outw AS MATERIALIZED (SELECT src_host AS v, SUM(weight) AS d FROM hedges GROUP BY src_host),
pr0 AS (SELECT v, 1.0/(SELECT cnt FROM nn) AS score FROM verts)"""
    its = []
    for k in range(1, PR_ITERS + 1):
        p = k - 1
        its.append(
            f""",
dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.score),0) AS s FROM pr{p} p LEFT JOIN outw o ON p.v=o.v WHERE o.v IS NULL),
agg{k} AS MATERIALIZED (SELECT e.dst_host AS v, SUM(p.score*e.weight/o.d) AS s
           FROM hedges e JOIN pr{p} p ON e.src_host=p.v JOIN outw o ON e.src_host=o.v GROUP BY e.dst_host),
pr{k} AS MATERIALIZED (SELECT vt.v,
                 (1-{PR_DAMPING})/(SELECT cnt FROM nn)
                 + {PR_DAMPING}*(COALESCE(a.s,0)+(SELECT s FROM dang{k})/(SELECT cnt FROM nn)) AS score
          FROM verts vt LEFT JOIN agg{k} a ON vt.v=a.v)"""
        )
    return (
        pre
        + "".join(its)
        + f"""
SELECT v AS host, ROUND(score*(SELECT cnt FROM nn), 6) AS score_n FROM pr{PR_ITERS}"""
    )


PPR_SEEDS = 5  # personalized teleport set = the 5 smallest vertex ids


def _pagerank_p_sql() -> str:
    """Unrolled personalized PageRank: teleport and dangling mass land
    uniformly on the seed set (the PPR_SEEDS smallest vertex ids), matching
    pagerank(seeds=...) exactly."""
    pre = f"""
WITH edges AS MATERIALIZED ({_ORDER_CHAIN_SQL}),
verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
outdeg AS MATERIALIZED (SELECT src AS v, count(*) AS d FROM edges GROUP BY src),
nn AS MATERIALIZED (SELECT count(*) AS cnt FROM verts),
seeds AS MATERIALIZED (SELECT v FROM verts ORDER BY v LIMIT {PPR_SEEDS}),
reset AS MATERIALIZED (SELECT vt.v, CASE WHEN s.v IS NULL THEN 0.0 ELSE 1.0/{PPR_SEEDS} END AS r
         FROM verts vt LEFT JOIN seeds s ON vt.v = s.v),
pr0 AS (SELECT v, 1.0/(SELECT cnt FROM nn) AS score FROM verts)"""
    its = []
    for k in range(1, PR_ITERS + 1):
        p = k - 1
        its.append(
            f""",
dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.score),0) AS s FROM pr{p} p LEFT JOIN outdeg o ON p.v=o.v WHERE o.v IS NULL),
agg{k} AS MATERIALIZED (SELECT e.dst AS v, SUM(p.score/o.d) AS s
           FROM edges e JOIN pr{p} p ON e.src=p.v JOIN outdeg o ON e.src=o.v GROUP BY e.dst),
pr{k} AS MATERIALIZED (SELECT vt.v,
                 (1-{PR_DAMPING})*rs.r
                 + {PR_DAMPING}*(COALESCE(a.s,0)+(SELECT s FROM dang{k})*rs.r) AS score
          FROM verts vt JOIN reset rs ON vt.v=rs.v LEFT JOIN agg{k} a ON vt.v=a.v)"""
        )
    return (
        pre
        + "".join(its)
        + f"""
SELECT v AS partkey, ROUND(score*(SELECT cnt FROM nn), 6) AS score_n FROM pr{PR_ITERS}"""
    )


def _sssp_sql() -> str:
    """Unrolled synchronous Bellman-Ford from the smallest vertex id over
    the weighted chain graph: d_i(v) = min(d_{i-1}(v), min over in-edges
    d_{i-1}(u) + w). Round count covers convergence (once a round changes
    nothing the fixpoint is reached, so engine early-exit == K rounds).
    1e308 is the +inf sentinel; unreachable -> -1."""
    pre = f"""
WITH edges AS MATERIALIZED ({_ORDER_CHAIN_W_SQL}),
verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
d0 AS MATERIALIZED (SELECT v, CASE WHEN v = (SELECT MIN(v) FROM verts) THEN 0.0 ELSE 1e308 END AS d FROM verts)"""
    its = []
    for i in range(1, SSSP_ROUNDS + 1):
        p = i - 1
        its.append(
            f""",
r{i} AS MATERIALIZED (SELECT e.dst AS v, MIN(p.d + e.weight) AS md
          FROM edges e JOIN d{p} p ON e.src = p.v WHERE p.d < 1e308 GROUP BY 1),
d{i} AS MATERIALIZED (SELECT vt.v, LEAST(p.d, COALESCE(r.md, 1e308)) AS d
          FROM verts vt JOIN d{p} p ON vt.v = p.v LEFT JOIN r{i} r ON vt.v = r.v)"""
        )
    return (
        pre
        + "".join(its)
        + f"""
SELECT v AS partkey, CASE WHEN d >= 1e308 THEN -1.0 ELSE ROUND(d, 6) END AS cost FROM d{SSSP_ROUNDS}"""
    )


def _lp_sql() -> str:
    """Unrolled synchronous label propagation (majority in-neighbour label,
    ties -> smallest, isolated keep), matching kkray.analytics.label_propagation."""
    pre = f"""
WITH edges AS MATERIALIZED ({_COOC_BOTH_SQL}),
verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
lp0 AS (SELECT v, v AS lab FROM verts)"""
    its = []
    for k in range(1, LP_ITERS + 1):
        p = k - 1
        its.append(
            f""",
cand{k} AS MATERIALIZED (SELECT e.dst AS v, p.lab AS lab, count(*) AS c
            FROM edges e JOIN lp{p} p ON e.src=p.v GROUP BY 1,2),
win{k} AS MATERIALIZED (SELECT v, lab FROM (
             SELECT v, lab, row_number() OVER (PARTITION BY v ORDER BY c DESC, lab ASC) AS rn FROM cand{k})
           WHERE rn=1),
lp{k} AS MATERIALIZED (SELECT l.v, COALESCE(w.lab, l.lab) AS lab FROM lp{p} l LEFT JOIN win{k} w ON l.v=w.v)"""
        )
    return pre + "".join(its) + f"""
SELECT v AS partkey, lab AS label FROM lp{LP_ITERS}"""


def _cc_sql() -> str:
    """Min-label to fixpoint via recursive reachability (UNION dedups ->
    terminates); label(v) = min vertex id reaching v = min of component."""
    return f"""
WITH RECURSIVE edges AS MATERIALIZED ({_COOC_BOTH_SQL}),
verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
reach(v, lab) AS (
    SELECT v, v FROM verts
    UNION
    SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.v
    WHERE r.lab < e.dst
)
SELECT v AS partkey, MIN(lab) AS component FROM reach GROUP BY v"""


def _hits_sql() -> str:
    """Unrolled fixed-iteration HITS (auth = normalize2(A^T hub), hub =
    normalize2(A auth)), matching kkray.analytics.hits exactly."""
    pre = f"""
WITH edges AS MATERIALIZED ({_ORDER_CHAIN_SQL}),
verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
hub0 AS (SELECT v, 1.0 AS s FROM verts)"""
    its = []
    for k in range(1, HITS_ITERS + 1):
        p = k - 1
        its.append(
            f""",
ar{k} AS MATERIALIZED (SELECT e.dst AS v, SUM(h.s) AS s FROM edges e JOIN hub{p} h ON e.src=h.v GROUP BY 1),
an{k} AS MATERIALIZED (SELECT sqrt(SUM(s*s)) AS n FROM ar{k}),
auth{k} AS MATERIALIZED (SELECT vt.v, COALESCE(r.s,0)/(SELECT n FROM an{k}) AS s
            FROM verts vt LEFT JOIN ar{k} r ON vt.v=r.v),
hr{k} AS MATERIALIZED (SELECT e.src AS v, SUM(a.s) AS s FROM edges e JOIN auth{k} a ON e.dst=a.v GROUP BY 1),
hn{k} AS MATERIALIZED (SELECT sqrt(SUM(s*s)) AS n FROM hr{k}),
hub{k} AS MATERIALIZED (SELECT vt.v, COALESCE(r.s,0)/(SELECT n FROM hn{k}) AS s
            FROM verts vt LEFT JOIN hr{k} r ON vt.v=r.v)"""
        )
    return (
        pre
        + "".join(its)
        + f"""
SELECT a.v AS partkey, ROUND(a.s, 6) AS auth, ROUND(h.s, 6) AS hub
FROM auth{HITS_ITERS} a JOIN hub{HITS_ITERS} h ON a.v = h.v"""
    )


def _bfs_sql() -> str:
    """Min hop distance from the smallest vertex id via a depth-capped
    recursive CTE (UNION dedups (v,d) pairs and d <= cap bounds the
    recursion, so it terminates on cyclic graphs); unreachable -> -1."""
    # NB: inside WITH RECURSIVE, DuckDB gives any `X UNION Y`-shaped CTE
    # recursive-union semantics (dedup across iterations only), so `verts`
    # must dedup explicitly with DISTINCT over UNION ALL.
    return f"""
WITH RECURSIVE edges AS MATERIALIZED ({_ORDER_CHAIN_SQL}),
verts AS MATERIALIZED (SELECT DISTINCT v FROM (SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)),
walk(v, d) AS (
    SELECT (SELECT MIN(v) FROM verts), 0
    UNION
    SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v WHERE w.d < {BFS_CAP}
)
SELECT vt.v AS partkey, COALESCE(m.d, -1) AS dist
FROM verts vt LEFT JOIN (SELECT v, MIN(d) AS d FROM walk GROUP BY v) m ON vt.v = m.v"""


def _kcore_sql() -> str:
    """Unrolled synchronous k-core peel: keep_i = {{v in keep_(i-1) :
    degree within keep_(i-1) >= k}} — identical to the engine's
    simultaneous-removal rounds; unroll count covers convergence."""
    pre = f"""
WITH edges AS MATERIALIZED ({_COOC_BOTH_SQL}),
verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
keep0 AS MATERIALIZED (SELECT v FROM verts)"""
    its = []
    for i in range(1, KCORE_SQL_ROUNDS + 1):
        p = i - 1
        its.append(
            f""",
deg{i} AS MATERIALIZED (SELECT e.src AS v, count(*) AS d FROM edges e
           JOIN keep{p} a ON e.src = a.v JOIN keep{p} b ON e.dst = b.v GROUP BY 1),
keep{i} AS MATERIALIZED (SELECT v FROM deg{i} WHERE d >= {KCORE_K})"""
        )
    return (
        pre
        + "".join(its)
        + f"""
SELECT vt.v AS partkey, CASE WHEN k.v IS NULL THEN 0 ELSE 1 END AS in_kcore
FROM verts vt LEFT JOIN keep{KCORE_SQL_ROUNDS} k ON vt.v = k.v"""
    )


# ---------------------------------------------------------------- queries


def entry() -> Any:
    """Flagship, on the SCALE PATH end to end: synth pages -> byte-checked
    extraction -> edge table (Dataset) -> Graph.from_dataset (routed hive
    layout, never materialized on the driver) -> PageRank consumed as a
    per-shard-ref Dataset -> hash-partitioned join back to urls. Only the
    final O(V)-row result is collected (tiny at sf0.001; at scale, return
    the Dataset or take a top-k instead)."""
    import pyarrow as pa
    import ray.data
    from kkray.analytics import pagerank
    from kkray.graph import Graph
    from kkray.io.edges import build_edge_table
    from kkray.io.synth import synth_pages

    pages_tbl, _ = synth_pages(500, seed=42)
    pages = ray.data.from_arrow(pages_tbl)
    edges, url_map = build_edge_table(pages)
    n_urls = url_map.count()
    with Graph.from_dataset(edges, num_parts=4, v_num=n_urls) as g:
        ranks = pagerank(g, max_iters=30, tol=1e-10, as_dataset=True)
        nparts = max(2, min(8, int(ray.cluster_resources().get("CPU", 4))))
        joined = url_map.join(
            ranks.map_batches(
                lambda t: t.rename_columns(["vid", "pagerank"]).cast(
                    pa.schema([("vid", pa.uint64()), ("pagerank", pa.float64())])
                ),
                batch_format="pyarrow",
            ),
            "inner",
            num_partitions=nparts,
            on=("vid",),
        )
        out = joined.select_columns(["url", "vid", "pagerank"]).to_pandas()
    return out.sort_values("pagerank", ascending=False).reset_index(drop=True)


def _q_edges_build(sf_dir: str):
    src, dst = _chain_arrays(sf_dir)
    return pd.DataFrame({"src": src, "dst": dst}).sort_values(["src", "dst"]).reset_index(drop=True)


def _q_out_degrees(sf_dir: str):
    src, dst = _chain_arrays(sf_dir)
    df = pd.DataFrame({"src": src})
    return df.groupby("src", as_index=False).agg(out_degree=("src", "size"))


def _q_degree_histogram(sf_dir: str):
    deg = _q_out_degrees(sf_dir)
    return deg.groupby("out_degree", as_index=False).agg(n_vertices=("out_degree", "size"))


def _q_pagerank(sf_dir: str):
    from kkray.analytics import pagerank

    src, dst = _chain_arrays(sf_dir)
    g, verts = _dense_graph(src, dst)
    with g:
        scores = pagerank(g, damping=PR_DAMPING, max_iters=PR_ITERS, tol=None)
    return pd.DataFrame({"partkey": verts, "score_n": np.round(scores * len(verts), 6)})


def _q_cc(sf_dir: str):
    from kkray.analytics import connected_components

    src, dst = _cooc_arrays(sf_dir)
    g, verts = _dense_graph(src, dst)
    with g:
        labels = connected_components(g)
    return pd.DataFrame({"partkey": verts, "component": verts[labels]})


def _q_lp(sf_dir: str):
    from kkray.analytics import label_propagation

    src, dst = _cooc_arrays(sf_dir)
    g, verts = _dense_graph(src, dst)
    with g:
        labels = label_propagation(g, iters=LP_ITERS)
    return pd.DataFrame({"partkey": verts, "label": verts[labels]})


def _q_triangles(sf_dir: str):
    from kkray.analytics import triangle_count

    src, dst = _cooc_arrays(sf_dir)
    g, _ = _dense_graph(src, dst)
    with g:
        n = triangle_count(g)
    return pd.DataFrame({"triangles": [n]})


def _q_local_clustering(sf_dir: str):
    """Per-vertex triangle counts + local clustering coefficient over the
    co-occurrence graph: the streamed oriented wedge join with per-corner
    attribution (kkray/analytics/triangles.py local_triangle_counts —
    sparse shard-side increments, owner-routed once at end of stream),
    SQL-oracled by a three-way self-join."""
    from kkray.analytics import local_clustering

    src, dst = _cooc_arrays(sf_dir)
    g, verts = _dense_graph(src, dst)
    with g:
        tri, cc = local_clustering(g)
    return (
        pd.DataFrame(
            {
                "partkey": verts,
                "n_tri": tri.astype("int64"),
                "clustering": np.round(cc, 6),
            }
        )
        .sort_values("partkey")
        .reset_index(drop=True)
    )


def _q_assortativity(sf_dir: str):
    """Degree assortativity of the co-occurrence graph — exact integer
    moment partials per shard folded in unbounded ints, one float quotient
    (kkray/analytics/triangles.py degree_assortativity), so the SQL oracle
    agrees bit-for-bit before the 6-decimal round."""
    from kkray.analytics import degree_assortativity

    src, dst = _cooc_arrays(sf_dir)
    g, _ = _dense_graph(src, dst)
    with g:
        r = degree_assortativity(g)
    return pd.DataFrame({"assortativity": [float(np.round(r, 6))]})


def _q_pagerank_personalized(sf_dir: str):
    from kkray.analytics import pagerank

    src, dst = _chain_arrays(sf_dir)
    g, verts = _dense_graph(src, dst)
    with g:
        # dense ids 0..K-1 == the K smallest partkeys (np.unique sorts)
        scores = pagerank(
            g,
            damping=PR_DAMPING,
            max_iters=PR_ITERS,
            tol=None,
            seeds=np.arange(PPR_SEEDS, dtype=np.int64),
        )
    return pd.DataFrame({"partkey": verts, "score_n": np.round(scores * len(verts), 6)})


def _q_pagerank_weighted(sf_dir: str):
    """Runs on the DISTRIBUTED weighted build path (Graph.from_dataset:
    routed hive layout, per-shard slice reads) so the correctness gate
    exercises the 100 TB route, not just from_arrays."""
    import pyarrow as pa
    import ray.data
    from kkray.analytics import pagerank
    from kkray.graph import Graph

    src, dst, w = _chain_w_arrays(sf_dir)
    verts = np.unique(np.concatenate([src, dst]))
    s, d = np.searchsorted(verts, src), np.searchsorted(verts, dst)
    ds = ray.data.from_arrow(pa.table({"src": s, "dst": d, "weight": w}))
    with Graph.from_dataset(ds, num_parts=8, v_num=len(verts), weighted=True) as g:
        scores = pagerank(g, damping=PR_DAMPING, max_iters=PR_ITERS, tol=None, weighted=True)
    return pd.DataFrame({"partkey": verts, "score_n": np.round(scores * len(verts), 6)})


def _q_sssp(sf_dir: str):
    from kkray.analytics import sssp
    from kkray.graph import Graph

    src, dst, w = _chain_w_arrays(sf_dir)
    verts = np.unique(np.concatenate([src, dst]))
    s, d = np.searchsorted(verts, src), np.searchsorted(verts, dst)
    with Graph.from_arrays(s, d, num_parts=8, v_num=len(verts), weight=w) as g:
        # dense id 0 == smallest partkey; rounds cap == SQL unroll count
        cost = sssp(g, 0, max_iters=SSSP_ROUNDS)
    cost = np.where(np.isfinite(cost), np.round(cost, 6), -1.0)
    return pd.DataFrame({"partkey": verts, "cost": cost})


def _q_hits(sf_dir: str):
    from kkray.analytics import hits

    src, dst = _chain_arrays(sf_dir)
    g, verts = _dense_graph(src, dst)
    with g:
        auth, hub = hits(g, iters=HITS_ITERS)
    return pd.DataFrame({"partkey": verts, "auth": np.round(auth, 6), "hub": np.round(hub, 6)})


def _q_bfs(sf_dir: str):
    from kkray.analytics import bfs_distances

    src, dst = _chain_arrays(sf_dir)
    g, verts = _dense_graph(src, dst)
    with g:
        # dense id 0 == verts[0] == the smallest partkey (np.unique sorts)
        dist = bfs_distances(g, 0, max_iters=BFS_CAP)
    return pd.DataFrame({"partkey": verts, "dist": dist})


def _q_kcore(sf_dir: str):
    from kkray.analytics import kcore

    src, dst = _cooc_arrays(sf_dir)
    g, verts = _dense_graph(src, dst)
    with g:
        member, rounds = kcore(g, k=KCORE_K, return_rounds=True)
    # the SQL oracle unrolls exactly KCORE_SQL_ROUNDS peel rounds; a peel
    # needing more would make a CORRECT engine disagree with the oracle —
    # fail loudly here instead of reporting a silent mismatch
    assert rounds <= KCORE_SQL_ROUNDS, (
        f"kcore peel used {rounds} rounds > SQL unroll {KCORE_SQL_ROUNDS}; "
        "raise KCORE_SQL_ROUNDS"
    )
    return pd.DataFrame({"partkey": verts, "in_kcore": member})


def _q_deepwalk(sf_dir: str):
    from kkray.walk import deepwalk

    src, dst = _cooc_arrays(sf_dir)
    g, verts = _dense_graph(src, dst)
    with g:
        paths = deepwalk(g, walker_num=2000, length=20, seed=42).to_pandas()
    return paths.sort_values("walker_id").reset_index(drop=True)[["walker_id", "length"]]


def _q_node2vec(sf_dir: str):
    from kkray.walk import node2vec

    src, dst = _cooc_arrays(sf_dir)
    g, verts = _dense_graph(src, dst)
    with g:
        paths = node2vec(g, walker_num=500, p=2.0, q=0.5, length=10, seed=42).to_pandas()
    return paths.sort_values("walker_id").reset_index(drop=True)[["walker_id", "length"]]


def _q_mh(sf_dir: str):
    from kkray.walk import mh_walk

    src, dst = _cooc_arrays(sf_dir)
    g, verts = _dense_graph(src, dst)
    with g:
        paths = mh_walk(g, walker_num=1000, length=15, seed=42).to_pandas()
    return paths.sort_values("walker_id").reset_index(drop=True)[["walker_id", "length"]]


def _q_ppr(sf_dir: str):
    from kkray.walk import ppr_walk

    src, dst = _cooc_arrays(sf_dir)
    g, verts = _dense_graph(src, dst)
    with g:
        fp = ppr_walk(g, walker_num=2000, terminate_prob=1 / 8, seed=42, return_dataset=True).to_pandas()
    visits = fp.groupby("vertex", as_index=False).agg(n_visits=("vertex", "size"))
    visits["vertex"] = verts[visits["vertex"].to_numpy()]
    return visits


def _q_metapath(sf_dir: str):
    from kkray.walk import metapath_walk
    from kkray.walk.apps import scheme_from_type_sequence

    src, dst = _cooc_arrays(sf_dir)
    # deterministic edge types from the key pair
    et = ((src * 31 + dst) % 3).astype(np.int32)
    g, verts = _dense_graph(src, dst)
    # rebuild with etypes (dense ids)
    g.close()
    from kkray.graph import Graph

    s = np.searchsorted(verts, src)
    d = np.searchsorted(verts, dst)
    with Graph.from_arrays(s, d, etype=et, num_parts=8, v_num=len(verts)) as g2:
        paths = metapath_walk(
            g2, walker_num=1000, schemes=[scheme_from_type_sequence([0, 1, 2]), scheme_from_type_sequence([2, 1])],
            length=12, seed=42,
        ).to_pandas()
    return paths.sort_values("walker_id").reset_index(drop=True)[["walker_id", "length"]]


def _q_extract_text(sf_dir: str):
    """Frozen text extraction over the synth pages, returning the extracted
    bytes themselves — hash-oracled against the generator's golden `text`
    column persisted as fixtures/pages_golden_1000_seed42.parquet (the
    byte-identical-per-url invariant, adjudicated on the actual bytes; a
    pytest pins the fixture to a fresh regeneration)."""
    import ray.data
    from kkray.io.extract import ExtractText
    from kkray.io.synth import synth_pages

    pages_tbl, _ = synth_pages(1000, seed=42)
    pages = ray.data.from_arrow(pages_tbl.drop_columns(["text"]))
    out = pages.map_batches(ExtractText, batch_format="pyarrow", concurrency=4).to_pandas()
    return out[["url", "text"]].sort_values("url").reset_index(drop=True)


def _q_page_anchors(sf_dir: str):
    """Anchor-text corpus from the synth pages (the classic web ranking /
    retrieval training signal): exploded (src_url, dst_url, anchor) rows
    via the frozen extract_anchors spec. Oracled against the generator's
    INDEPENDENTLY-recorded ground truth (anchors captured before HTML
    escaping/rendering — the extractor must recover them through entity
    unescape + tag strip), persisted as
    fixtures/anchor_manifest_1000_seed42.parquet; a pytest asserts the
    fixture equals a fresh regeneration, so drift is caught."""
    import ray.data
    from kkray.io.extract import ExtractAnchors
    from kkray.io.synth import synth_pages

    pages_tbl, _ = synth_pages(1000, seed=42)
    pages = ray.data.from_arrow(pages_tbl.drop_columns(["text"]))
    out = pages.map_batches(ExtractAnchors, batch_format="pyarrow", concurrency=4).to_pandas()
    return out[["src_url", "dst_url", "anchor"]].sort_values(
        ["src_url", "dst_url", "anchor"], kind="stable"
    ).reset_index(drop=True)


def _q_page_anchor_profiles(sf_dir: str):
    """Per-target anchor-text profile (top-3 anchors by count per
    linked-to url, ties count DESC then anchor ASC) — oracled against the
    same persisted ground-truth manifest as page_anchor_texts (the SQL
    recomputes counts + top-3 from the fixture); pytest also verifies
    against a pandas brute reference on the same synth corpus."""
    import ray.data
    from kkray.io.extract import anchor_profiles
    from kkray.io.synth import synth_pages

    pages_tbl, _ = synth_pages(1000, seed=42)
    pages = ray.data.from_arrow(pages_tbl.drop_columns(["text"]))
    out = anchor_profiles(pages, k=3).to_pandas()
    return (
        out.astype({"n": "int64"})
        .sort_values(["dst_url", "anchor"])
        .reset_index(drop=True)
    )


def _q_page_edges(sf_dir: str):
    import ray.data
    from kkray.io.edges import build_edge_table
    from kkray.io.synth import synth_pages

    pages_tbl, _ = synth_pages(1000, seed=42)
    edges, url_map = build_edge_table(ray.data.from_arrow(pages_tbl))
    df = edges.to_pandas()
    return df.sort_values(["src", "dst"]).reset_index(drop=True)


def _q_host_edges(sf_dir: str):
    """Host-level (domain-graph) rollup of the synth page edge table, with
    host names joined back — deterministic; rows-only driver check (the
    synth pages aren't SQL-reconstructible), python-oracled in pytest."""
    import ray.data
    from kkray.io.edges import build_edge_table
    from kkray.io.hostgraph import host_edges
    from kkray.io.synth import synth_pages

    pages_tbl, _ = synth_pages(1000, seed=42)
    edges, url_map = build_edge_table(ray.data.from_arrow(pages_tbl))
    he, hm = host_edges(edges, url_map)
    he_df, hm_df = he.to_pandas(), hm.to_pandas()
    hid2host = dict(zip(hm_df["hid"], hm_df["host"]))
    he_df["src_host"] = he_df["src"].map(hid2host)
    he_df["dst_host"] = he_df["dst"].map(hid2host)
    out = he_df[["src_host", "dst_host", "weight"]].astype({"weight": "int64"})
    return out.sort_values(["src_host", "dst_host"]).reset_index(drop=True)


def _q_host_pagerank(sf_dir: str):
    """Weighted PageRank over the host rollup (rows-only; the weighted
    kernel itself is SQL-oracled via pagerank_weighted_10iter)."""
    import ray.data
    from kkray.analytics import pagerank
    from kkray.graph import Graph
    from kkray.io.edges import build_edge_table
    from kkray.io.hostgraph import host_edges
    from kkray.io.synth import synth_pages

    pages_tbl, _ = synth_pages(1000, seed=42)
    edges, url_map = build_edge_table(ray.data.from_arrow(pages_tbl))
    he, hm = host_edges(edges, url_map)
    he_df, hm_df = he.to_pandas(), hm.to_pandas()
    n_hosts = len(hm_df)
    with Graph.from_arrays(
        he_df["src"].to_numpy(np.int64),
        he_df["dst"].to_numpy(np.int64),
        num_parts=2,
        v_num=n_hosts,
        weight=he_df["weight"].to_numpy(np.float64),
    ) as g:
        r = pagerank(g, max_iters=PR_ITERS, tol=None, weighted=True)
    out = pd.DataFrame(
        {"host": hm_df.sort_values("hid")["host"].to_numpy(), "score_n": np.round(r * n_hosts, 6)}
    )
    return out.sort_values("host").reset_index(drop=True)


def _q_doc_dedup_exact(sf_dir: str):
    import ray.data
    from kkray.textops import exact_dedup

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    out = exact_dedup(docs).to_pandas()
    return out.astype({"doc_id": "int64", "dup_count": "int64"}).sort_values("doc_id").reset_index(drop=True)


def _q_doc_tokens(sf_dir: str):
    import ray.data
    from kkray.textops import TokenCount

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = docs.map_batches(TokenCount(), batch_format="pandas").to_pandas()
    return out[["doc_id", "n_tokens_ws"]].sort_values("doc_id").reset_index(drop=True)


def _q_doc_chars(sf_dir: str):
    import ray.data

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": texts.str.len().astype("int64"),
                "n_digits": texts.str.count(r"\d").astype("int64"),
            }
        )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(stats, batch_format="pandas").to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_lang_counts(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    out = docs.groupby("lang").aggregate(Count(alias_name="n_docs")).to_pandas()
    return out.astype({"n_docs": "int64"}).sort_values("lang").reset_index(drop=True)


def _q_source_stats(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count, Sum

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    out = (
        docs.groupby("source")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
        .to_pandas()
    )
    return out.astype({"n_docs": "int64", "total_chars": "int64"}).sort_values("source").reset_index(drop=True)


def _q_langid(sf_dir: str):
    import ray.data
    from kkray.textops import LangId

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = docs.map_batches(LangId, batch_format="pandas", concurrency=4).to_pandas()
    return out[["doc_id", "lang_pred"]].sort_values("doc_id").reset_index(drop=True)


def _q_fingerprints(sf_dir: str):
    import ray.data
    from kkray.textops import Fingerprint

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = docs.map_batches(Fingerprint(), batch_format="pandas").to_pandas()
    out["fingerprint"] = out["fingerprint"].astype("uint64")
    return out[["doc_id", "fingerprint"]].sort_values("doc_id").reset_index(drop=True)


def _q_minhash_pairs(sf_dir: str):
    import ray.data
    from kkray.ops import to_pandas_typed
    from kkray.textops import minhash_lsh_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = to_pandas_typed(minhash_lsh_pairs(docs, num_perm=64, bands=16, shingle_n=3, threshold=0.6))
    out["jaccard"] = out["jaccard"].round(6)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _q_ngram_jaccard(sf_dir: str):
    import ray.data
    from kkray.ops import to_pandas_typed
    from kkray.textops import ngram_jaccard_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = to_pandas_typed(ngram_jaccard_pairs(docs, shingle_n=5, threshold=0.5))
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _q_minhash_recall_vs_exact(sf_dir: str):
    """Self-checking cross-validation of MinHash-LSH against the EXACT
    inverted-index operator (same shingle_n/threshold): asserts (1) the
    LSH pair set is a subset of the exact operator's with bit-identical
    jaccard values, and (2) observed recall clears the banding-theory
    expectation E[1-(1-s^r)^b] minus 3-sigma binomial slack. Raises on
    violation; returns a one-row summary (rows-only driver check, but the
    correctness claim is enforced inside the query)."""
    import numpy as np
    import ray.data
    from kkray.ops import to_pandas_typed
    from kkray.textops import minhash_lsh_pairs, ngram_jaccard_pairs

    n, t, num_perm, bands = 3, 0.6, 64, 16
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    exact = to_pandas_typed(ngram_jaccard_pairs(docs, shingle_n=n, threshold=t))
    lsh = to_pandas_typed(minhash_lsh_pairs(docs, num_perm=num_perm, bands=bands, shingle_n=n, threshold=t))
    ex = {(int(a), int(b)): float(j) for a, b, j in zip(exact["a"], exact["b"], exact["jaccard"])}
    got = {(int(a), int(b)): float(j) for a, b, j in zip(lsh["a"], lsh["b"], lsh["jaccard"])}
    extra = set(got) - set(ex)
    if extra:
        raise AssertionError(f"LSH emitted pairs the exact operator lacks: {sorted(extra)[:5]}")
    for k, j in got.items():
        if abs(ex[k] - j) > 1e-12:
            raise AssertionError(f"jaccard mismatch on {k}: lsh={j} exact={ex[k]}")
    r = num_perm // bands
    s = np.array(list(ex.values()), dtype=np.float64)
    p = 1.0 - (1.0 - s**r) ** bands
    expected = float(p.mean()) if len(ex) else 1.0
    sigma = (float(np.sqrt((p * (1.0 - p)).sum())) / len(ex)) if len(ex) else 0.0
    recall = (len(got) / len(ex)) if len(ex) else 1.0
    if recall < expected - 3.0 * sigma - 1e-9:
        raise AssertionError(f"recall {recall:.4f} below banding bound {expected:.4f} - 3*{sigma:.4f}")
    return pd.DataFrame(
        {
            "n_exact_pairs": [np.int64(len(ex))],
            "n_lsh_pairs": [np.int64(len(got))],
            "recall_millionths": [np.int64(round(recall * 1_000_000))],
            "theory_bound_millionths": [np.int64(round(expected * 1_000_000))],
        }
    )


def _q_top_docs_per_lang(sf_dir: str):
    import ray.data
    from kkray.ops import grouped_top_k

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "doc_id", "n_chars"]
    )
    out = grouped_top_k(
        docs, ["lang"], ["n_chars", "doc_id"], k=3, descending=[True, False]
    ).to_pandas()
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def _q_simhash_pairs(sf_dir: str):
    import ray.data
    from kkray.ops import to_pandas_typed
    from kkray.textops import simhash_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return to_pandas_typed(simhash_pairs(docs, max_hamming=3)).sort_values(["a", "b"]).reset_index(drop=True)


def _q_near_dedup(sf_dir: str):
    import ray.data
    from kkray.textops import minhash_lsh_pairs, near_dedup

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, num_perm=64, bands=16, shingle_n=3, threshold=0.6)
    return near_dedup(docs, pairs).to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_knn(sf_dir: str):
    import ray.data
    from kkray.textops import knn_brute

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id").head(3)
    q = np.stack(qdf["embedding"].to_numpy())
    out = knn_brute(emb, q, k=5)
    out["query_vec_id"] = qdf["vec_id"].to_numpy()[out["query_id"].to_numpy()]
    return out[["query_vec_id", "rank", "vec_id"]].astype("int64").reset_index(drop=True)


def _q_knn_lsh(sf_dir: str):
    import ray.data
    from kkray.textops import knn_lsh

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id").head(3)
    q = np.stack(qdf["embedding"].to_numpy())
    out = knn_lsh(emb, q, k=5, n_planes=6, probes=8)
    out["query_vec_id"] = qdf["vec_id"].to_numpy()[out["query_id"].to_numpy()]
    return out[["query_vec_id", "rank", "vec_id"]].astype("int64").reset_index(drop=True)


def _q_sessionize(sf_dir: str):
    """Gap-based sessionization over the events stream (30-min gap)."""
    import ray.data
    from kkray.relational.temporal import sessionize

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    out = sessionize(ev, gap="30min").to_pandas()
    out["session_start"] = pd.to_datetime(out["session_start"])
    return out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)


def _q_asof(sf_dir: str):
    """As-of join: each purchase event matched to the same user's latest
    click at-or-before it (ties by max event_id); no-match -> -1."""
    import ray.data
    from kkray.relational.temporal import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    p = ev.filter(expr="event_type == 'purchase'").select_columns(["event_id", "user_id", "ts"])
    c = ev.filter(expr="event_type == 'click'").select_columns(["event_id", "user_id", "ts"])
    out = asof_join(
        p, c, by="user_id", on="ts", tie="event_id",
        right_cols={"ts": "click_ts", "event_id": "click_event_id"},
    ).to_pandas()
    out["click_event_id"] = out["click_event_id"].fillna(-1).astype("int64")
    return (
        out[["event_id", "user_id", "click_event_id"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _q_range_join(sf_dir: str):
    """Range join (count form): purchases by the same user within +/-1h
    of each error event."""
    import ray.data
    from kkray.relational.temporal import range_join_count

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    e = ev.filter(expr="event_type == 'error'").select_columns(["event_id", "user_id", "ts"])
    p = ev.filter(expr="event_type == 'purchase'").select_columns(["user_id", "ts"])
    out = range_join_count(
        e, p, by="user_id", on="ts", lo_delta="-1h", hi_delta="1h", out_col="n_purchases"
    ).to_pandas()
    return (
        out[["event_id", "n_purchases"]].astype("int64").sort_values("event_id").reset_index(drop=True)
    )


def _q_knn_ivf(sf_dir: str):
    """IVF in its exact mode (nprobe == nlist scans every inverted list),
    so the brute-force SQL oracle applies verbatim; the recall<1
    approximate mode (nprobe < nlist) is pytest-covered instead."""
    import ray.data
    from kkray.textops import knn_ivf

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id").head(3)
    q = np.stack(qdf["embedding"].to_numpy())
    out = knn_ivf(emb, q, k=5, nlist=8, nprobe=8)
    out["query_vec_id"] = qdf["vec_id"].to_numpy()[out["query_id"].to_numpy()]
    return out[["query_vec_id", "rank", "vec_id"]].astype("int64").reset_index(drop=True)


TOP_TOKENS_K = 50


def _q_top_tokens(sf_dir: str):
    """Corpus-wide top-k token counts (vocabulary building): per-batch
    value_counts combiner -> one groupby(token).sum -> per-batch top-k
    candidates -> tiny driver merge. Tie-break (count DESC, token ASC)."""
    import ray.data
    from kkray.textops import top_tokens

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out = top_tokens(docs, k=TOP_TOKENS_K)
    return out.astype({"n": "int64"}).reset_index(drop=True)


def _q_tfidf_top_terms(sf_dir: str):
    """Per-doc top-3 tf-idf terms (score = tf * ln(N/df), tie-break score
    DESC then token ASC — identical formula and tie rule in the SQL)."""
    import ray.data
    from kkray.textops import tfidf_top_terms

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = tfidf_top_terms(docs, k=3).to_pandas()
    out["score"] = np.round(out["score"].astype(float), 6)
    return (
        out.astype({"doc_id": "int64", "token": "string"})
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )


def _q_repetition_stats(sf_dir: str):
    """Gopher-style intra-doc repetition signals over whitespace bigrams
    (dup-bigram fraction + top-bigram fraction; boilerplate/spam rule).
    One map_batches pass; identical bigram strings, integer counts, and
    round-6 fractions in the SQL."""
    import ray.data
    from kkray.textops import RepetitionStats

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = docs.map_batches(RepetitionStats, batch_format="pandas", concurrency=(1, 8)).to_pandas()
    return out.astype(
        {"doc_id": "int64", "n_bigrams": "int64", "n_dup_bigrams": "int64", "top_bigram_n": "int64"}
    ).sort_values("doc_id").reset_index(drop=True)


DECON_SHINGLE_N = 5
DECON_BENCH_MOD = 17


def _q_decontaminate(sf_dir: str):
    """Test-set decontamination: docs sharing >=1 distinct 5-token shingle
    with the benchmark subset (doc_id % 17 == 0), with the shared-shingle
    count. String-shingle mode (SQL-parity); the hashed mode (8-byte join
    keys, the 100-TB path) is pytest-verified equal on the same corpus."""
    import ray.data
    from kkray.textops import decontaminate

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # Ray 2.49's filter(expr=...) parser has no % operator; one vectorized
    # Arrow mask per side instead (same pushed-down scan, zero-copy batches)
    def _mod_filter(keep_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % DECON_BENCH_MOD == 0) == keep_bench
            return t.filter(pa.array(mask))

        return f

    train = docs.map_batches(_mod_filter(False), batch_format="pyarrow")
    bench = docs.map_batches(_mod_filter(True), batch_format="pyarrow")
    out = decontaminate(train, bench, shingle_n=DECON_SHINGLE_N).to_pandas()
    if "doc_id" not in out.columns:  # empty-overlap corpus keeps the schema
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "n_shared": pd.Series(dtype="int64")})
    return (
        out[["doc_id", "n_shared"]].astype("int64").sort_values("doc_id").reset_index(drop=True)
    )


def _q_latest_event_per_user(sf_dir: str):
    """Keep-latest-per-key (CDC/dedup-by-recency shape): each user's most
    recent event, ties by max event_id. Rides grouped_top_k (per-batch
    head-1 combiner; the shuffle carries <=1 row per user per batch)."""
    import ray.data
    from kkray.ops import grouped_top_k

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    )
    out = grouped_top_k(
        ev, ["user_id"], ["ts", "event_id"], k=1, descending=[True, True]
    ).to_pandas()
    out["ts"] = pd.to_datetime(out["ts"])
    return (
        out[["user_id", "event_id", "ts", "event_type"]]
        .astype({"user_id": "int64", "event_id": "int64"})
        .sort_values("user_id")
        .reset_index(drop=True)
    )


PII_SUFFIX_FMT = " contact user{did}@example.com or 555-123-4567 at 10.0.{oct}.1"
CHUNK_SIZE = 32
SHARD_N = 8


def _q_pii_redaction(sf_dir: str):
    """PII redaction (emails / dashed-or-dotted phones / IPv4 -> typed
    placeholders) with per-doc match counts. The synthetic corpus carries
    no PII, so the query appends a deterministic PII suffix built from
    doc_id on BOTH sides (engine and SQL) — the redaction kernels then
    run on identical strings and the redacted text is hash-checked
    byte-identical. Replacement order (email -> phone -> ip) is part of
    the contract; counts are taken on the pre-replacement text of each
    stage, mirroring the SQL's nested regexp_replace chain."""
    import ray.data
    from kkray.textops import RedactPII

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_pii(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        suffix = pd.Series(
            [PII_SUFFIX_FMT.format(did=i, oct=i % 256) for i in ids], index=df.index
        )
        out = df.copy()
        out["text"] = df["text"].fillna("") + suffix
        return out

    out = (
        docs.map_batches(add_pii, batch_format="pandas")
        .map_batches(RedactPII, batch_format="pandas", concurrency=(1, 8))
        .to_pandas()
    )
    return (
        out.astype({"doc_id": "int64", "n_emails": "int64", "n_phones": "int64", "n_ips": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _q_chunk_documents(sf_dir: str):
    """Fixed-size token chunking (LLM sequence-packing prep): each doc ->
    ceil(n_tokens/32) chunks of <=32 whitespace tokens; chunk_text is the
    literal joined window (hash-checked against DuckDB list slicing)."""
    import ray.data
    from kkray.ops import to_pandas_typed
    from kkray.textops import chunk_documents

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = to_pandas_typed(chunk_documents(docs, chunk_size=CHUNK_SIZE))
    return (
        out.astype({"doc_id": "int64", "chunk_id": "int64", "n_tokens": "int64"})
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )


def _q_shard_assignment(sf_dir: str):
    """Deterministic training-data shuffle: (doc_id -> shard, pos) from
    the SQL-parity multiplicative hash; pos is the 0-based (h, id) rank
    within the shard. Reproducible layout == resumable shard re-emission."""
    import ray.data
    from kkray.ops import shard_assignment

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = shard_assignment(docs, "doc_id", n_shards=SHARD_N).to_pandas()
    return (
        out[["doc_id", "shard", "pos"]]
        .astype("int64")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SKIPGRAM_WINDOW = 2
SKIPGRAM_MIN_COUNT = 2


def _q_skipgram_pairs(sf_dir: str):
    """Corpus-wide skip-gram (center, context) pair counts, symmetric
    window 2, min_count 2 — the word2vec training-corpus prep step.
    Per-batch value_counts combiner -> one (center, context) groupby."""
    import ray.data
    from kkray.ops import to_pandas_typed
    from kkray.textops import skipgram_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out = to_pandas_typed(skipgram_pairs(docs, window=SKIPGRAM_WINDOW, min_count=SKIPGRAM_MIN_COUNT))
    return (
        out.astype({"n": "int64"})
        .sort_values(["center", "context"])
        .reset_index(drop=True)
    )


KHOP_SEED_MOD = 97
KHOP_FANOUTS = [3, 2]


def _q_khop_neighbors(sf_dir: str):
    """GNN-minibatch neighbor sampling on the order-chain graph:
    2-hop fanout-[3,2] expansion around every root with root % 97 == 0,
    deterministic mode (fanout smallest dst per (root, src) — the
    SQL-parity rule, row_number over the sorted adjacency). The uniform
    sampling mode is pytest-covered (bounds + reproducibility)."""
    import ray.data
    from kkray.graph import khop_neighbors
    from kkray.ops import to_pandas_typed

    src, dst = _chain_arrays(sf_dir)
    seeds = np.unique(src[src % KHOP_SEED_MOD == 0])
    edges = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst})).repartition(8)
    out = to_pandas_typed(khop_neighbors(edges, seeds, KHOP_FANOUTS, mode="first"))
    return (
        out[["root", "hop", "src", "dst"]]
        .astype("int64")
        .sort_values(["root", "hop", "src", "dst"])
        .reset_index(drop=True)
    )


def _q_curated_corpus(sf_dir: str):
    """Composed pipeline: quality pre-filter -> exact text dedup (min
    doc_id wins) -> stratified k-per-lang sample; oracle composes the
    same three SQL stages."""
    from kkray.pipelines.corpus import curated_corpus

    return curated_corpus(sf_dir)


def _q_quality_filter(sf_dir: str):
    """Composite keep/drop quality pre-filter (QualityFilter docstring has
    the signal formulas; every signal reuses a SQL-parity count)."""
    import ray.data
    from kkray.textops import QualityFilter

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = docs.map_batches(QualityFilter, batch_format="pandas", concurrency=(1, 8)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_word_chars(sf_dir: str):
    """Non-whitespace char count per doc (vectorized str.count — oracle:
    length(regexp_replace(text,'\\s','','g')))."""
    import ray.data

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        return pd.DataFrame(
            # ASCII class matching RE2's \s in the oracle exactly
            {"doc_id": df["doc_id"], "n_word_chars": texts.str.count(r"[^\t\n\f\r ]").astype("int64")}
        )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(stats, batch_format="pandas").to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_emb_near_dup(sf_dir: str):
    """Embedding cosine near-dup pairs. Exact mode (n_planes=0, one
    bucket) so the result is SQL-oracle-comparable; the LSH-bucketed mode
    is recall<1 by design and is pytest-covered instead. Threshold 0.42
    sits >7e-4 away from every actual pair similarity in the fixtures, so
    the float boundary cannot flip membership between engines."""
    import ray.data
    from kkray.textops import embedding_near_dup

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = embedding_near_dup(emb, threshold=0.42, n_planes=0).to_pandas()
    if "a" not in out.columns:  # empty map_groups output loses its schema
        out = pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    out = out[["a", "b"]].astype("int64")
    lo = out.min(axis=1)  # engine pairs are bucket-positional; oracle wants a<b
    hi = out.max(axis=1)
    return (
        pd.DataFrame({"a": lo, "b": hi}).sort_values(["a", "b"]).reset_index(drop=True)
    )


def _q_emb_labels(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label"])
    out = emb.groupby("label").aggregate(Count(alias_name="n")).to_pandas()
    return out.astype({"label": "int64", "n": "int64"}).sort_values("label").reset_index(drop=True)


def _q_media_image_features(sf_dir: str):
    """REAL image decode in the gate: deterministic synthetic RGB images
    are encoded to genuine PNG bytes (kkray stdlib codec), decoded by the
    actor-pool DecodeImage('png') stage, resized and featurized. The
    round-trip is self-checking: decoded pixels must equal the
    pre-encoding arrays bit-for-bit or the query raises. Rows-only driver
    check (binary payloads aren't SQL-reconstructible); the codec itself
    is golden-tested in pytest (filters 0-4, gray/RGB/RGBA)."""
    import ray.data
    from kkray.textops.codecs import png_encode
    from kkray.textops.multimodal import DecodeImage, ImageFeatures, ResizeImage

    rng = np.random.Generator(np.random.Philox(99))
    n = 64
    imgs = [rng.integers(0, 256, (24, 18, 3), dtype=np.uint8) for _ in range(n)]
    media = pd.DataFrame(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "payload": [png_encode(im) for im in imgs],
            "height": np.full(n, 24, dtype=np.int64),
            "width": np.full(n, 18, dtype=np.int64),
        }
    )
    out = (
        ray.data.from_pandas(media)
        .map_batches(DecodeImage, fn_constructor_args=("png",), batch_format="pandas", batch_size=16, concurrency=(1, 4))
        .map_batches(ResizeImage(8, 8), batch_format="pandas")
        .map_batches(ImageFeatures(), batch_format="pandas")
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    # self-check: the REAL decode ran (resize of the true pixels, not the fake)
    exp0 = imgs[0][(np.arange(8) * 24 // 8)][:, (np.arange(8) * 18 // 8)].ravel()
    assert np.array_equal(np.asarray(out["pixels"].iloc[0]), exp0), "PNG decode mismatch"
    return pd.DataFrame(
        {
            "media_id": out["media_id"].astype("int64"),
            "mean_r": np.round([f[0] for f in out["features"]], 6),
            "mean_g": np.round([f[1] for f in out["features"]], 6),
            "mean_b": np.round([f[2] for f in out["features"]], 6),
        }
    )


def _q_media_audio_features(sf_dir: str):
    """REAL audio decode in the gate: deterministic tones encoded to
    genuine WAV bytes (stdlib wave), decoded by DecodeAudio, featurized
    (RMS / ZCR / spectral centroid). Self-checking: decoded samples must
    equal the pre-encoding arrays. Rows-only driver check."""
    import ray.data
    from kkray.textops.codecs import wav_encode
    from kkray.textops.multimodal import AudioFeatures, DecodeAudio

    rate = 8000
    t = np.arange(rate) / rate
    freqs = [220.0, 440.0, 880.0, 1760.0]
    tones = [(np.sin(2 * np.pi * f * t) * 18000).astype(np.int16) for f in freqs]
    audio = pd.DataFrame(
        {
            "media_id": np.arange(len(freqs), dtype=np.int64),
            "payload": [wav_encode(s, rate) for s in tones],
        }
    )
    out = (
        ray.data.from_pandas(audio)
        .map_batches(DecodeAudio, batch_format="pandas", concurrency=(1, 2))
        .map_batches(AudioFeatures(), batch_format="pandas")
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(np.asarray(out["samples"].iloc[0]), tones[0]), "WAV decode mismatch"
    cents = np.array([f[2] for f in out["features"]])
    assert np.all(np.abs(cents - np.array(freqs)) < 30.0), "spectral centroid off-tone"
    return pd.DataFrame(
        {
            "media_id": out["media_id"].astype("int64"),
            "sample_rate": out["sample_rate"].astype("int64"),
            "centroid_hz": np.round(cents, 3),
        }
    )


def _q_media_video_frames(sf_dir: str):
    """REAL video decode in the gate: deterministic RGB frame stacks are
    encoded to genuine uncompressed-AVI bytes (RIFF + 24-bit DIB stream,
    kkray container codec), decoded and frame-sampled by the actor-pool
    SampleFrames('avi') stage, then featurized per sampled frame.
    Self-checking: sampled pixels must equal the pre-encoding frames
    bit-for-bit or the query raises. Rows-only driver check (binary
    payloads aren't SQL-reconstructible); the codec round-trip is
    golden/fuzz-tested in pytest."""
    import ray.data
    from kkray.textops.codecs import avi_encode
    from kkray.textops.multimodal import SampleFrames

    rng = np.random.Generator(np.random.Philox(123))
    n_vids, n_frames, h, w = 6, 12, 16, 11
    vids = [rng.integers(0, 256, (n_frames, h, w, 3), dtype=np.uint8) for _ in range(n_vids)]
    media = pd.DataFrame(
        {
            "media_id": np.arange(n_vids, dtype=np.int64),
            "payload": [avi_encode(v, fps=10) for v in vids],
            "n_frames": np.full(n_vids, n_frames, dtype=np.int64),
            "height": np.full(n_vids, h, dtype=np.int64),
            "width": np.full(n_vids, w, dtype=np.int64),
        }
    )
    out = (
        ray.data.from_pandas(media)
        .map_batches(
            SampleFrames,
            fn_constructor_kwargs={"every": 5, "decoder": "avi"},
            batch_format="pandas",
            batch_size=2,
            concurrency=(1, 3),
        )
        .to_pandas()
        .sort_values(["media_id", "frame"])
        .reset_index(drop=True)
    )
    # self-check: the REAL container decode ran (exact pixels of frame 5)
    row = out[(out["media_id"] == 2) & (out["frame"] == 5)].iloc[0]
    assert np.array_equal(np.asarray(row["pixels"]), vids[2][5].ravel()), "AVI decode mismatch"
    px = np.stack([np.asarray(p).reshape(h, w, 3) for p in out["pixels"]])
    mean = px.reshape(len(out), -1, 3).mean(axis=1)
    return pd.DataFrame(
        {
            "media_id": out["media_id"].astype("int64"),
            "frame": out["frame"].astype("int64"),
            "mean_r": np.round(mean[:, 0], 6),
            "mean_g": np.round(mean[:, 1], 6),
            "mean_b": np.round(mean[:, 2], 6),
        }
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from kkray.relational.queries import (
        approx_distinct_users_per_event_type,
        customers_without_events,
        distinct_users_per_event_type,
        sample_docs_per_lang,
        value_quantiles_per_event_type,
        events_hopping_window,
        events_hourly_window,
        filter_pushdown_scan,
        pricing_summary,
        revenue_per_nation,
        top_customers,
    )

    # ORDERING CONTRACT (r5): the driver sweeps the FIRST 50 keys only.
    # Rounds 2-4 left 9 queries without a driver row in ANY round; this
    # round rotates them (temporal trio, media trio, curated_corpus,
    # sample_docs_per_lang, approx_distinct) plus the 13 queries green in
    # r02/r03 but outside the r04 window INTO the first 50, and rotates
    # OUT 22 textops queries already triple-green in r04 (most also in
    # r02/r03). The rotated-out 22 stay in the contract past position 50
    # and are re-verified every round via tools/check_contract.py (full
    # 72-query replay at sf0.001 + sf0.01); rotation listed in NOTES_r5.md.
    return {
        # graph construction + analytics (SURVEY §2.2, §2.7)
        "edges_build": _q_edges_build,
        "out_degrees": _q_out_degrees,
        "degree_histogram": _q_degree_histogram,
        "pagerank_10iter": _q_pagerank,
        "connected_components": _q_cc,
        "label_propagation_3iter": _q_lp,
        "triangle_count": _q_triangles,
        "pagerank_personalized_10iter": _q_pagerank_personalized,
        "pagerank_weighted_10iter": _q_pagerank_weighted,
        "sssp_costs": _q_sssp,
        "hits_5iter": _q_hits,
        "bfs_hops": _q_bfs,
        "kcore_membership": _q_kcore,
        # walker apps (SURVEY §2.4) — distribution-tested in pytest; driver
        # check is rows-only
        "deepwalk_paths": _q_deepwalk,
        "node2vec_paths": _q_node2vec,
        "ppr_visit_counts": _q_ppr,
        "mh_paths": _q_mh,
        "metapath_paths": _q_metapath,
        # ingestion (SURVEY §2.1/§2.7 new scope)
        "extract_text_pages": _q_extract_text,
        "page_edges": _q_page_edges,
        "page_anchor_texts": _q_page_anchors,
        "page_anchor_profiles": _q_page_anchor_profiles,
        "host_edges_synth": _q_host_edges,
        "host_pagerank_synth": _q_host_pagerank,
        # temporal/relational + curation + media: never driver-swept in
        # r02-r04 (sat past position 50) — in-window this round
        "curated_corpus": _q_curated_corpus,
        "sessionize_events": _q_sessionize,
        "asof_purchase_click": _q_asof,
        "range_join_error_purchases": _q_range_join,
        "sample_docs_per_lang": lambda sf: sample_docs_per_lang(sf),
        # rows-only: HLL sketch (deterministic); accuracy pytest-verified
        "approx_distinct_users_per_event_type": lambda sf: approx_distinct_users_per_event_type(sf),
        # multimodal: REAL in-container codecs (stdlib PNG/WAV/AVI) through
        # the actor-pool decode stages; self-checking round-trips, rows-only
        "media_image_features": _q_media_image_features,
        "media_audio_features": _q_media_audio_features,
        "media_video_frames": _q_media_video_frames,
        # ANN + embedding ops (green r02/r03, outside the r04 window)
        "knn_lsh_top5": _q_knn_lsh,
        "knn_ivf_top5": _q_knn_ivf,
        "embedding_label_counts": _q_emb_labels,
        "embedding_near_dup_pairs": _q_emb_near_dup,
        # relational surface (green r02/r03, outside the r04 window)
        "pricing_summary": lambda sf: pricing_summary(sf),
        "revenue_per_nation": lambda sf: revenue_per_nation(sf),
        "top_customers": lambda sf: top_customers(sf),
        "events_hourly_window": lambda sf: events_hourly_window(sf),
        "events_hopping_window": lambda sf: events_hopping_window(sf),
        "customers_without_events": lambda sf: customers_without_events(sf),
        "distinct_users_per_event_type": lambda sf: distinct_users_per_event_type(sf),
        "value_quantiles_per_event_type": lambda sf: value_quantiles_per_event_type(sf),
        "filter_pushdown_scan": lambda sf: filter_pushdown_scan(sf),
        # newly-oracled (r5) / re-architected (r5) ops: need fresh driver rows
        "langid_pred": _q_langid,
        "doc_fingerprints": _q_fingerprints,
        # NEW in r5: per-vertex clustering and degree assortativity take
        # the window slots of khop_neighbors / ngram_jaccard_pairs (both
        # triple-green in CORRECTNESS_r04)
        "local_clustering": _q_local_clustering,
        "degree_assortativity": _q_assortativity,
        # ---- position 51+ (past the driver window this round): all 24
        # below are triple-green in a past round (most in CORRECTNESS_r04),
        # re-verified each round by tools/check_contract.py ----
        "khop_neighbors": _q_khop_neighbors,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "doc_dedup_exact": _q_doc_dedup_exact,
        "doc_token_counts": _q_doc_tokens,
        "doc_char_digit_counts": _q_doc_chars,
        "doc_word_chars": _q_word_chars,
        "doc_quality_filter": _q_quality_filter,
        "top_tokens": _q_top_tokens,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "doc_repetition_stats": _q_repetition_stats,
        "decontaminate_overlap": _q_decontaminate,
        "latest_event_per_user": _q_latest_event_per_user,
        "pii_redaction": _q_pii_redaction,
        "chunk_documents": _q_chunk_documents,
        "shard_assignment": _q_shard_assignment,
        "skipgram_pairs": _q_skipgram_pairs,
        "lang_counts": _q_lang_counts,
        "source_stats": _q_source_stats,
        "minhash_pairs": _q_minhash_pairs,
        # rows-only but self-checking: containment + banding-recall vs exact
        "minhash_recall_vs_exact": _q_minhash_recall_vs_exact,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "simhash_pairs": _q_simhash_pairs,
        "near_dedup_keep": _q_near_dedup,
        "knn_cosine_top5": _q_knn,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "edges_build": _ORDER_CHAIN_SQL,
        "out_degrees": f"SELECT src, count(*) AS out_degree FROM ({_ORDER_CHAIN_SQL}) GROUP BY src",
        "degree_histogram": f"""
            SELECT out_degree, count(*) AS n_vertices FROM (
              SELECT src, count(*) AS out_degree FROM ({_ORDER_CHAIN_SQL}) GROUP BY src
            ) GROUP BY out_degree""",
        "pagerank_10iter": _pagerank_sql(),
        "connected_components": _cc_sql(),
        "label_propagation_3iter": _lp_sql(),
        "pagerank_personalized_10iter": _pagerank_p_sql(),
        "pagerank_weighted_10iter": _pagerank_w_sql(),
        "sssp_costs": _sssp_sql(),
        "hits_5iter": _hits_sql(),
        "bfs_hops": _bfs_sql(),
        "kcore_membership": _kcore_sql(),
        "triangle_count": f"""
            WITH e AS MATERIALIZED ({_COOC_HALF_SQL})
            SELECT count(*) AS triangles
            FROM e a JOIN e b ON b.src=a.dst JOIN e c ON c.src=a.src AND c.dst=b.dst""",
        # per-vertex triangle participation + local clustering: each
        # ordered triangle (x<y<z by id) credits all three corners; the
        # undirected simple degree comes from the both-direction expansion
        "local_clustering": f"""
            WITH e AS MATERIALIZED ({_COOC_HALF_SQL}),
            tri AS MATERIALIZED (
              SELECT a.src AS x, a.dst AS y, b.dst AS z
              FROM e a JOIN e b ON b.src=a.dst JOIN e c ON c.src=a.src AND c.dst=b.dst),
            tv AS (SELECT v, count(*)::BIGINT AS n_tri FROM (
                     SELECT x AS v FROM tri UNION ALL
                     SELECT y FROM tri UNION ALL
                     SELECT z FROM tri) GROUP BY v),
            deg AS (SELECT v, count(*)::BIGINT AS d FROM (
                     SELECT src AS v FROM e UNION ALL SELECT dst FROM e) GROUP BY v)
            SELECT deg.v AS partkey,
                   COALESCE(tv.n_tri, 0) AS n_tri,
                   ROUND(CASE WHEN deg.d >= 2
                              THEN 2.0*COALESCE(tv.n_tri, 0)/(deg.d*(deg.d-1))
                              ELSE 0.0 END, 6) AS clustering
            FROM deg LEFT JOIN tv ON tv.v = deg.v
            ORDER BY partkey""",
        # Pearson of (deg(src), deg(dst)) over the directed edges of the
        # undirected expansion; HUGEINT moments stay exact like the
        # engine's python-int fold, so only the final quotient is float
        "degree_assortativity": f"""
            WITH e AS MATERIALIZED ({_COOC_BOTH_SQL}),
            deg AS MATERIALIZED (SELECT src AS v, count(*)::BIGINT AS d FROM e GROUP BY src),
            m AS (SELECT count(*)::HUGEINT AS n,
                         SUM(d1.d)::HUGEINT AS sx, SUM(d2.d)::HUGEINT AS sy,
                         SUM(d1.d*d2.d)::HUGEINT AS sxy,
                         SUM(d1.d*d1.d)::HUGEINT AS sx2, SUM(d2.d*d2.d)::HUGEINT AS sy2
                  FROM e JOIN deg d1 ON e.src = d1.v JOIN deg d2 ON e.dst = d2.v)
            SELECT ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                         / SQRT(CAST((n*sx2 - sx*sx)*(n*sy2 - sy*sy) AS DOUBLE)), 6) AS assortativity
            FROM m""",
        "doc_dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS dup_count
            FROM documents GROUP BY text""",
        # text extraction adjudicated on the actual bytes: oracle = the
        # generator's golden `text` column (written independently of the
        # HTML renderer), persisted as a pinned fixture
        "extract_text_pages": f"""
            SELECT url, text FROM '{_PAGES_GOLDEN_FIX}' ORDER BY url""",
        # page edge table recomputed in SQL from the generator's edge
        # manifest (sorted-url dense vids + crawled-only join + dedup)
        "page_edges": _PAGE_EDGES_SQL,
        "host_edges_synth": _HOST_EDGES_SQL,
        "host_pagerank_synth": _host_pagerank_sql(),
        # the anchor extractor's oracle is the generator's independently
        # recorded ground truth (anchors captured BEFORE HTML rendering),
        # persisted to a repo fixture; a pytest pins fixture == fresh
        # regeneration, so this adjudicates the extractor, not itself
        "page_anchor_texts": """
            SELECT src_url, dst_url, anchor
            FROM '/root/repo/fixtures/anchor_manifest_1000_seed42.parquet'
            ORDER BY src_url, dst_url, anchor""",
        "page_anchor_profiles": """
            WITH counts AS (
              SELECT dst_url, anchor, count(*) AS n
              FROM '/root/repo/fixtures/anchor_manifest_1000_seed42.parquet'
              GROUP BY dst_url, anchor
            )
            SELECT dst_url, anchor, n FROM (
              SELECT dst_url, anchor, n,
                     row_number() OVER (PARTITION BY dst_url ORDER BY n DESC, anchor ASC) AS rn
              FROM counts)
            WHERE rn <= 3 ORDER BY dst_url, anchor""",
        # stopword-lexicon language vote: exact SQL re-implementation of
        # LangId (quality.py) — token rule \S+ (RE2 ASCII == _TOK_RE),
        # argmax tie-break = count DESC then lang ASC, no hits -> 'und'
        "langid_pred": r"""
            WITH lex(lang, word) AS (VALUES """ + ", ".join(
                f"('{lang}','{w}')"
                for lang, words in (
                    ("en", ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with"]),
                    ("de", ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "von", "zu"]),
                    ("fr", ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans", "que", "avec"]),
                    ("es", ["el", "la", "los", "las", "y", "de", "un", "una", "es", "para", "en", "con"]),
                )
                for w in words
            ) + r"""),
            toks AS (
              SELECT doc_id, lower(t.tok) AS tok
              FROM documents, unnest(regexp_extract_all(text, '\S+')) AS t(tok)
            ),
            hits AS (
              SELECT doc_id, lang, count(*) AS n
              FROM toks JOIN lex ON toks.tok = lex.word GROUP BY doc_id, lang
            ),
            best AS (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang ASC) AS rn
              FROM hits
            )
            SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred
            FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
            ORDER BY doc_id""",
        # 64-bit polynomial rolling hash recomputed from scratch in SQL:
        # canonical text = \S+ tokens joined by ' ' (Fingerprint's rule),
        # Horner fold over its UTF-8 bytes (hex(encode()) -> byte list)
        # with FNV-offset init, then the splitmix64 finalizer. All mod-2^64
        # arithmetic runs in HUGEINT; the two 64x64-bit splitmix multiplies
        # are split at 32 bits so no INT128 overflow.
        "doc_fingerprints": r"""
            WITH canon AS (
              SELECT doc_id,
                     hex(encode(array_to_string(regexp_extract_all(text, '\S+'), ' '))) AS hx
              FROM documents
            ),
            poly AS (
              SELECT doc_id,
                list_reduce(
                  list_prepend(14695981039346656037::HUGEINT,
                    list_transform(range(1, len(hx)//2 + 1),
                      i -> ((strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1))-1)*16
                            + strpos('0123456789ABCDEF', substr(hx, 2*i, 1))-1)::HUGEINT)),
                  (a, b) -> (a * 1000003 + b) % 18446744073709551616::HUGEINT) AS h
              FROM canon
            ),
            mix1 AS (SELECT doc_id,
                     (h + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS x
                     FROM poly),
            mix2 AS (SELECT doc_id,
                     ((xor(x::UBIGINT, x::UBIGINT >> 30)::HUGEINT % 4294967296) * 13787848793156543929::HUGEINT
                      + ((((xor(x::UBIGINT, x::UBIGINT >> 30)::HUGEINT // 4294967296)
                           * (13787848793156543929::HUGEINT % 4294967296)) % 4294967296) * 4294967296)
                     ) % 18446744073709551616::HUGEINT AS x FROM mix1),
            mix3 AS (SELECT doc_id,
                     ((xor(x::UBIGINT, x::UBIGINT >> 27)::HUGEINT % 4294967296) * 10723151780598845931::HUGEINT
                      + ((((xor(x::UBIGINT, x::UBIGINT >> 27)::HUGEINT // 4294967296)
                           * (10723151780598845931::HUGEINT % 4294967296)) % 4294967296) * 4294967296)
                     ) % 18446744073709551616::HUGEINT AS x FROM mix2)
            SELECT doc_id, xor(x::UBIGINT, x::UBIGINT >> 31) AS fingerprint
            FROM mix3 ORDER BY doc_id""",
        "doc_token_counts": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+')) AS n_tokens_ws
            FROM documents""",
        "doc_char_digit_counts": """
            SELECT doc_id, length(text) AS n_chars,
                   length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits
            FROM documents""",
        "doc_word_chars": r"""
            SELECT doc_id, length(regexp_replace(text, '\s', '', 'g'))::BIGINT AS n_word_chars
            FROM documents""",
        # composite quality pre-filter: every signal reuses a count whose
        # engine<->SQL parity is independently hash-checked above; ratio
        # divisions are the identical IEEE int/int double op on both sides
        "doc_quality_filter": r"""
            WITH sig AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '\S+')) AS n_tokens,
                     length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
                     length(regexp_replace(text, '\s', '', 'g')) AS n_wchars
              FROM documents),
            r AS (
              SELECT doc_id, n_chars, n_tokens,
                     n_digits / GREATEST(n_chars, 1) AS digit_ratio,
                     n_wchars / GREATEST(n_tokens, 1) AS mean_wl
              FROM sig)
            SELECT doc_id, n_chars, n_tokens,
                   ROUND(digit_ratio, 6) AS digit_ratio,
                   ROUND(mean_wl, 6) AS mean_wl,
                   CASE WHEN n_chars >= 200 AND n_tokens >= 20
                             AND digit_ratio <= 0.3
                             AND mean_wl BETWEEN 2.0 AND 4.8
                        THEN 1 ELSE 0 END::BIGINT AS keep
            FROM r""",
        "top_tokens": r"""
            WITH toks AS (
              SELECT unnest(regexp_extract_all(text, '\S+')) AS token
              FROM documents),
            c AS (SELECT token, COUNT(*)::BIGINT AS n FROM toks GROUP BY token)
            SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT 50""",
        # per-doc tf-idf top-3: identical formula (tf * ln(N/df), float
        # division) and tie-break (score DESC, token ASC) as the engine
        "tfidf_top_terms": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
              FROM documents),
            tf AS (SELECT doc_id, token, COUNT(*)::BIGINT AS tf FROM toks GROUP BY doc_id, token),
            dfreq AS (SELECT token, COUNT(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY token),
            n AS (SELECT COUNT(*)::BIGINT AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.token, tf.tf * ln(n.n / dfreq.df) AS score
              FROM tf JOIN dfreq USING (token), n)
            SELECT doc_id, token, ROUND(score, 6) AS score FROM (
              SELECT doc_id, token, score,
                     row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, token ASC) AS rn
              FROM scored)
            WHERE rn <= 3 ORDER BY doc_id, token""",
        # Gopher-style bigram repetition signals: identical literal bigram
        # strings (tok[i] || ' ' || tok[i+1]), integer counts, round-6
        # fractions with the same greatest(.,1) denominators as the engine
        "doc_repetition_stats": r"""
            WITH base AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
            bi AS (
              SELECT doc_id, tk[g] || ' ' || tk[g+1] AS bigram
              FROM base, unnest(generate_series(1, len(tk)-1)) t(g)),
            agg AS (
              SELECT doc_id, max(c)::BIGINT AS top_bigram_n,
                     (sum(c) - count(*))::BIGINT AS n_dup_bigrams
              FROM (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY doc_id, bigram)
              GROUP BY doc_id)
            SELECT b.doc_id,
                   greatest(len(tk)-1, 0)::BIGINT AS n_bigrams,
                   coalesce(n_dup_bigrams, 0)::BIGINT AS n_dup_bigrams,
                   round(coalesce(n_dup_bigrams, 0) / greatest(len(tk)-1, 1), 6) AS dup_bigram_frac,
                   coalesce(top_bigram_n, 0)::BIGINT AS top_bigram_n,
                   round(coalesce(top_bigram_n, 0) / greatest(len(tk)-1, 1), 6) AS top_bigram_frac
            FROM base b LEFT JOIN agg USING (doc_id)
            ORDER BY doc_id""",
        # decontamination: distinct 5-token shingles shared with the
        # doc_id%17==0 benchmark subset; strictly-windowed shingling (docs
        # with <5 tokens contribute none) matches the engine's rule
        "decontaminate_overlap": r"""
            WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(tk[g:g+4], ' ') AS shingle
              FROM toks, unnest(generate_series(1, len(tk)-4)) t(g)),
            bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0),
            train AS (SELECT * FROM sh WHERE doc_id % 17 <> 0)
            SELECT train.doc_id, count(*)::BIGINT AS n_shared
            FROM train JOIN bench USING (shingle)
            GROUP BY train.doc_id ORDER BY doc_id""",
        "latest_event_per_user": """
            SELECT user_id, event_id, ts, event_type FROM (
              SELECT user_id, event_id, ts, event_type,
                     row_number() OVER (PARTITION BY user_id
                         ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1 ORDER BY user_id""",
        # PII redaction: the identical deterministic PII suffix is built
        # from doc_id on both sides; patterns are ASCII-explicit and
        # Python-re <-> RE2 identical; counts are taken on each stage's
        # pre-replacement text exactly as the engine does (email -> phone
        # -> ip order is part of the operator contract)
        "pii_redaction": r"""
            WITH aug AS (
              SELECT doc_id,
                     text || ' contact user' || doc_id || '@example.com or 555-123-4567 at 10.0.'
                          || (doc_id % 256) || '.1' AS t0
              FROM documents),
            s1 AS (SELECT doc_id, t0,
                     regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
                   FROM aug),
            s2 AS (SELECT *, regexp_replace(t1, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '<PHONE>', 'g') AS t2
                   FROM s1),
            s3 AS (SELECT *, regexp_replace(t2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS t3
                   FROM s2)
            SELECT doc_id,
                   len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
                   len(regexp_extract_all(t1, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}'))::BIGINT AS n_phones,
                   len(regexp_extract_all(t2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))::BIGINT AS n_ips,
                   t3 AS text_redacted
            FROM s3 ORDER BY doc_id""",
        # fixed-size token chunking: literal joined windows via 1-based
        # inclusive list slicing; zero-token docs produce zero chunks
        "chunk_documents": r"""
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
            ch AS (
              SELECT doc_id, g AS chunk_id,
                     least(32, len(tk) - g*32)::BIGINT AS n_tokens,
                     array_to_string(tk[g*32+1 : g*32+32], ' ') AS chunk_text
              FROM toks,
                   unnest(generate_series(0, CAST(ceil(len(tk)/32.0) AS BIGINT) - 1)) t(g))
            SELECT doc_id, chunk_id::BIGINT AS chunk_id, n_tokens, chunk_text
            FROM ch ORDER BY doc_id, chunk_id""",
        # deterministic shard/pos assignment: identical multiplicative-hash
        # arithmetic as stratified_sample's oracle; rank ties break by id
        "shard_assignment": """
            WITH h AS (
              SELECT doc_id,
                     ((doc_id % 4294967291)::HUGEINT * 2654435761) % 4294967291 AS h
              FROM documents)
            SELECT doc_id, (h % 8)::BIGINT AS shard,
                   (row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1)::BIGINT AS pos
            FROM h ORDER BY doc_id""",
        # skip-gram pair counts: same ASCII \S+ tokens, ordered pairs at
        # distance 1..2 inside a doc (both directions), count >= 2
        "skipgram_pairs": r"""
            WITH toks AS (
              SELECT regexp_extract_all(text, '\S+') AS tk FROM documents),
            pos AS (
              SELECT tk, g FROM toks, unnest(generate_series(1, len(tk))) t(g)),
            pairs AS (
              SELECT tk[g] AS center, tk[g + o] AS context
              FROM pos, unnest([-2, -1, 1, 2]) t2(o)
              WHERE g + o BETWEEN 1 AND len(tk))
            SELECT center, context, count(*)::BIGINT AS n
            FROM pairs GROUP BY center, context
            HAVING count(*) >= 2 ORDER BY center, context""",
        # k-hop fanout sampling, deterministic mode: hop 1 = the 3 smallest
        # dst per root, hop 2 = the 2 smallest dst per distinct (root, hop-1
        # dst) pair; row_number over the sorted adjacency is the same rule
        # grouped_top_k applies in the engine
        "khop_neighbors": f"""
            WITH e AS MATERIALIZED ({_ORDER_CHAIN_SQL}),
            seeds AS (SELECT DISTINCT src AS root FROM e WHERE src % 97 = 0),
            h1 AS (
              SELECT root, src, dst FROM (
                SELECT s.root, e.src, e.dst,
                       row_number() OVER (PARTITION BY s.root, e.src ORDER BY e.dst) AS rn
                FROM seeds s JOIN e ON e.src = s.root) WHERE rn <= 3),
            f1 AS (SELECT DISTINCT root, dst AS v FROM h1),
            h2 AS (
              SELECT root, src, dst FROM (
                SELECT f.root, e.src, e.dst,
                       row_number() OVER (PARTITION BY f.root, e.src ORDER BY e.dst) AS rn
                FROM f1 f JOIN e ON e.src = f.v) WHERE rn <= 2)
            SELECT root, 1::BIGINT AS hop, src, dst FROM h1
            UNION ALL
            SELECT root, 2::BIGINT AS hop, src, dst FROM h2
            ORDER BY root, hop, src, dst""",
        "embedding_near_dup_pairs": """
            SELECT e1.vec_id::BIGINT AS a, e2.vec_id::BIGINT AS b
            FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
            WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.42
            ORDER BY a, b""",
        # exact n-gram (n=5) Jaccard near-dup pairs via the shared-shingle
        # inverted index; jaccard is the identical IEEE int64/int64 double
        # division on both sides, so values hash-match bitwise
        "ngram_jaccard_pairs": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS tk
              FROM documents WHERE len(regexp_extract_all(text, '\S+')) > 0),
            sh AS (
              SELECT doc_id, CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
                ELSE list_transform(range(1, len(tk) - 3), i -> array_to_string(tk[i:i+4], ' '))
                END AS gs
              FROM toks),
            e AS (SELECT DISTINCT doc_id, unnest(gs) AS g FROM sh),
            sizes AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM e x JOIN e y ON x.g = y.g AND x.doc_id < y.doc_id
              GROUP BY 1, 2)
            SELECT a, b, CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
            FROM inter
            JOIN sizes sa ON inter.a = sa.doc_id
            JOIN sizes sb ON inter.b = sb.doc_id
            WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
            ORDER BY a, b""",
        "lang_counts": "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang",
        # distributed per-group top-k (combiner head-k per batch, then a
        # k*groups-sized shuffle) vs the window-function formulation
        "top_docs_per_lang": """
            SELECT lang, doc_id, n_chars FROM (
              SELECT lang, doc_id, n_chars,
                     row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents)
            WHERE rn <= 3 ORDER BY lang, doc_id""",
        "source_stats": "SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars FROM documents GROUP BY source",
        "embedding_label_counts": "SELECT label::BIGINT AS label, count(*) AS n FROM embeddings GROUP BY label",
        # IVF exact mode == brute force, so the same SQL oracle applies
        # (column names identical; values are the same float64 cosine path)
        "knn_ivf_top5": """
            WITH q AS (SELECT vec_id AS query_vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 3),
            sims AS (
              SELECT q.query_vec_id, e.vec_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS sim
              FROM q CROSS JOIN embeddings e
            )
            SELECT query_vec_id, rank, vec_id FROM (
              SELECT query_vec_id, vec_id,
                     row_number() OVER (PARTITION BY query_vec_id ORDER BY sim DESC, vec_id ASC) - 1 AS rank
              FROM sims
            ) WHERE rank < 5""",
        "knn_cosine_top5": """
            WITH q AS (SELECT vec_id AS query_vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 3),
            sims AS (
              SELECT q.query_vec_id, e.vec_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS sim
              FROM q CROSS JOIN embeddings e
            )
            SELECT query_vec_id, rank, vec_id FROM (
              SELECT query_vec_id, vec_id,
                     row_number() OVER (PARTITION BY query_vec_id ORDER BY sim DESC, vec_id ASC) - 1 AS rank
              FROM sims
            ) WHERE rank < 5""",
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity),2) AS sum_qty,
                   round(sum(l_extendedprice),2) AS sum_base_price,
                   round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "revenue_per_nation": """
            SELECT n_name, round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey=c_custkey
            JOIN nation ON c_nationkey=n_nationkey
            GROUP BY n_name""",
        "top_customers": """
            SELECT o_custkey, round(sum(o_totalprice),2) AS total_spent
            FROM orders GROUP BY o_custkey
            ORDER BY sum(o_totalprice) DESC, o_custkey LIMIT 10""",
        "events_hourly_window": """
            SELECT user_id, event_type, date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events, round(sum(value),6) AS sum_value
            FROM events GROUP BY user_id, event_type, date_trunc('hour', ts)""",
        # hopping 60min/15min window: each event lands in 4 overlapping
        # windows (cross join with the 4 hop offsets)
        "events_hopping_window": """
            SELECT event_type,
                   time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS window_start,
                   count(*) AS n_events, round(sum(value),6) AS sum_value
            FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
            GROUP BY 1, 2""",
        "customers_without_events": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT user_id FROM events)
            ORDER BY c_custkey""",
        "distinct_users_per_event_type": """
            SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type ORDER BY event_type""",
        # exact SQL re-implementation of the HyperLogLog sketch
        # (kkray.ops.grouped_approx_distinct, p=12): pandas' int64 hash is
        # the bare splitmix64 finalizer (no increment), reproduced with the
        # same 32-bit-split HUGEINT multiplies as doc_fingerprints; rho uses
        # the SAME float64 floor(log2) (+ clip) as the numpy kernel so the
        # two sides agree bit-for-bit on register values, then the standard
        # alpha_m*m^2/sum(2^-rho) estimate with the linear-counting branch
        "approx_distinct_users_per_event_type": r"""
            WITH h0 AS (SELECT event_type, user_id::UBIGINT AS x FROM events),
            m1 AS (SELECT event_type,
                   ((xor(x, x >> 30)::HUGEINT % 4294967296) * 13787848793156543929::HUGEINT
                    + ((((xor(x, x >> 30)::HUGEINT // 4294967296)
                         * (13787848793156543929::HUGEINT % 4294967296)) % 4294967296) * 4294967296)
                   ) % 18446744073709551616::HUGEINT AS xh FROM h0),
            m2 AS (SELECT event_type,
                   ((xor(xh::UBIGINT, xh::UBIGINT >> 27)::HUGEINT % 4294967296) * 10723151780598845931::HUGEINT
                    + ((((xor(xh::UBIGINT, xh::UBIGINT >> 27)::HUGEINT // 4294967296)
                         * (10723151780598845931::HUGEINT % 4294967296)) % 4294967296) * 4294967296)
                   ) % 18446744073709551616::HUGEINT AS xh FROM m1),
            hh AS (SELECT event_type, xor(xh::UBIGINT, xh::UBIGINT >> 31) AS h FROM m2),
            reg AS (SELECT event_type, (h >> 52)::BIGINT AS b,
                    ((h::HUGEINT * 4096) % 18446744073709551616::HUGEINT)::UBIGINT | 4095::UBIGINT AS rest
                    FROM hh),
            rho AS (SELECT event_type, b,
                    LEAST(GREATEST(LEAST(63 - CAST(FLOOR(LOG2(rest::DOUBLE)) AS BIGINT), 52) + 1, 1), 53) AS r
                    FROM reg),
            regs AS (SELECT event_type, b, MAX(r) AS mr FROM rho GROUP BY event_type, b),
            est AS (SELECT event_type, SUM(POWER(2.0, -mr)) AS s_regs, COUNT(*) AS nregs
                    FROM regs GROUP BY event_type),
            fin AS (SELECT event_type,
                    (0.7213/(1 + 1.079/4096)) * 4096.0 * 4096.0 / ((4096 - nregs) + s_regs) AS e,
                    4096 - nregs AS zeros FROM est)
            SELECT event_type,
                   CAST(ROUND(CASE WHEN e <= 2.5*4096 AND zeros > 0
                                   THEN 4096.0 * LN(4096.0/zeros) ELSE e END) AS BIGINT) AS approx_distinct
            FROM fin ORDER BY event_type""",
        # composed pipeline oracle: the quality-filter signals, GROUP BY
        # text MIN(doc_id) dedup, and the hash-ranked sample stacked
        "curated_corpus": r"""
            WITH sig AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '\S+')) AS n_tokens,
                     length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
                     length(regexp_replace(text, '\s', '', 'g')) AS n_wchars
              FROM documents),
            kept AS (
              SELECT d.doc_id, d.text, d.lang FROM documents d JOIN sig s ON d.doc_id = s.doc_id
              WHERE s.n_chars >= 200 AND s.n_tokens >= 20
                    AND s.n_digits / GREATEST(s.n_chars, 1) <= 0.3
                    AND s.n_wchars / GREATEST(s.n_tokens, 1) BETWEEN 2.0 AND 4.8),
            dd AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text),
            win AS (SELECT k.doc_id, k.lang FROM kept k JOIN dd ON k.doc_id = dd.doc_id)
            SELECT lang, doc_id FROM (
              SELECT lang, doc_id,
                     row_number() OVER (PARTITION BY lang
                         ORDER BY ((doc_id % 4294967291)::HUGEINT * 2654435761) % 4294967291, doc_id) AS rn
              FROM win)
            WHERE rn <= 3 ORDER BY lang, doc_id""",
        # deterministic stratified sample: k smallest multiplicative hash
        # per group; identical mod arithmetic on both sides (int64-safe)
        "sample_docs_per_lang": """
            SELECT lang, doc_id FROM (
              SELECT lang, doc_id,
                     row_number() OVER (PARTITION BY lang
                         ORDER BY ((doc_id % 4294967291)::HUGEINT * 2654435761) % 4294967291, doc_id) AS rn
              FROM documents)
            WHERE rn <= 5 ORDER BY lang, doc_id""",
        # exact discrete quantiles: quantile_disc == sorted[ceil(q*n)-1],
        # the identical element-pick rule grouped_quantile implements
        "value_quantiles_per_event_type": """
            SELECT event_type,
                   ROUND(quantile_disc(value, 0.25), 6) AS q25,
                   ROUND(quantile_disc(value, 0.50), 6) AS q50,
                   ROUND(quantile_disc(value, 0.90), 6) AS q90
            FROM events GROUP BY event_type ORDER BY event_type""",
        # gap-based sessionization == lag/cumsum window formulation
        "sessionize_events": """
            WITH x AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS ns
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), y AS (
              SELECT user_id, ts,
                     sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
              FROM x
            )
            SELECT user_id, session_idx::BIGINT AS session_idx,
                   count(*)::BIGINT AS n_events, min(ts) AS session_start
            FROM y GROUP BY 1, 2""",
        # backward as-of join == rank-1 of the inequality join, ties by
        # max event_id (identical to merge_asof's last-of-equal-ts pick)
        "asof_purchase_click": """
            WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
                 c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click'),
                 m AS (
              SELECT p.event_id, p.user_id, c.event_id AS click_event_id,
                     row_number() OVER (PARTITION BY p.event_id
                                        ORDER BY c.ts DESC, c.event_id DESC) AS rn
              FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
            SELECT event_id, user_id, COALESCE(click_event_id, -1) AS click_event_id
            FROM m WHERE rn = 1""",
        # range join (count form) == left inequality join + group count
        "range_join_error_purchases": """
            SELECT e.event_id, count(p.event_id)::BIGINT AS n_purchases
            FROM events e LEFT JOIN events p
              ON p.user_id = e.user_id AND p.event_type = 'purchase'
             AND p.ts BETWEEN e.ts - INTERVAL 1 HOUR AND e.ts + INTERVAL 1 HOUR
            WHERE e.event_type = 'error' GROUP BY 1""",
        "filter_pushdown_scan": """
            SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
            FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0""",
    }
