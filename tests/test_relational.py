"""Relational pipelines + canonical part-graphs vs DuckDB oracles on the
driver testdata (the same comparisons the driver's correctness gate runs)."""
import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "nation", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_pricing_summary_matches_sql(ray_session):
    from kkray.relational.queries import pricing_summary

    got = pricing_summary(SF)
    exp = _con().execute(
        """
        SELECT l_returnflag, l_linestatus, sum(l_quantity) sum_qty,
               sum(l_extendedprice) sum_base_price,
               sum(l_extendedprice*(1-l_discount)) sum_disc_price,
               count(*) count_order
        FROM lineitem GROUP BY 1,2 ORDER BY 1,2"""
    ).df()
    pd.testing.assert_frame_equal(
        got.astype({"count_order": "int64"}), exp.astype({"count_order": "int64"}), rtol=1e-9
    )


def test_revenue_per_nation_matches_sql(ray_session):
    from kkray.relational.queries import revenue_per_nation

    got = revenue_per_nation(SF)
    exp = _con().execute(
        """
        SELECT n_name, sum(o_totalprice) revenue, count(*) n_orders
        FROM orders JOIN customer ON o_custkey=c_custkey
        JOIN nation ON c_nationkey=n_nationkey
        GROUP BY n_name ORDER BY n_name"""
    ).df()
    pd.testing.assert_frame_equal(got.astype({"n_orders": "int64"}), exp.astype({"n_orders": "int64"}), rtol=1e-9)


def test_top_customers_matches_sql(ray_session):
    from kkray.relational.queries import top_customers

    got = top_customers(SF, k=10)
    exp = _con().execute(
        """
        SELECT o_custkey, round(sum(o_totalprice),2) total_spent
        FROM orders GROUP BY o_custkey
        ORDER BY sum(o_totalprice) DESC, o_custkey LIMIT 10"""
    ).df()
    assert list(got["o_custkey"]) == list(exp["o_custkey"])
    assert np.allclose(got["total_spent"], exp["total_spent"])


def test_events_window_matches_sql(ray_session):
    from kkray.relational.queries import events_hourly_window

    got = events_hourly_window(SF)
    exp = _con().execute(
        """
        SELECT user_id, event_type, date_trunc('hour', ts) window_start,
               count(*) n_events, round(sum(value),6) sum_value
        FROM events GROUP BY 1,2,3 ORDER BY 1,2,3"""
    ).df()
    pd.testing.assert_frame_equal(
        got.astype({"n_events": "int64"}), exp.astype({"n_events": "int64"}), rtol=1e-9
    )


def test_order_chain_edges_match_sql(ray_session):
    from kkray.pipelines.partgraph import order_chain_edges

    got = order_chain_edges(SF).to_pandas()
    exp = _con().execute(
        """
        SELECT DISTINCT a.l_partkey src, b.l_partkey dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey=b.l_orderkey AND b.l_linenumber=a.l_linenumber+1
        WHERE a.l_partkey <> b.l_partkey"""
    ).df()
    g = set(zip(got["src"].astype(int), got["dst"].astype(int)))
    e = set(zip(exp["src"].astype(int), exp["dst"].astype(int)))
    assert g == e


def test_cooccurrence_edges_match_sql(ray_session):
    from kkray.pipelines.partgraph import cooccurrence_edges

    got = cooccurrence_edges(SF).to_pandas()
    exp = _con().execute(
        """
        SELECT DISTINCT a.l_partkey src, b.l_partkey dst
        FROM lineitem a JOIN lineitem b ON a.l_orderkey=b.l_orderkey
        WHERE a.l_partkey < b.l_partkey"""
    ).df()
    e = set(zip(exp["src"].astype(int), exp["dst"].astype(int)))
    e |= {(b, a) for a, b in e}
    g = set(zip(got["src"].astype(int), got["dst"].astype(int)))
    assert g == e


def test_consecutive_pairs_join_semantics(ray_session):
    import ray.data
    from kkray.relational.join import consecutive_pairs

    df = pd.DataFrame(
        {
            "g": [1, 1, 1, 2, 2, 3, 4, 4, 4],
            "s": [1, 2, 4, 1, 2, 1, 2, 2, 3],  # group 4: duplicate seq=2
            "v": [10, 11, 12, 20, 21, 30, 40, 41, 42],
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    out = consecutive_pairs(ds, "g", "s", "v").to_pandas()
    got = sorted(zip(out["src"].astype(int), out["dst"].astype(int)))
    # gap 2->4 excluded, group change excluded, BOTH dup-seq rows pair with 42
    assert got == [(10, 11), (20, 21), (40, 42), (41, 42)]


def test_grouped_top_k_matches_pandas(ray_session):
    """grouped_top_k (combiner head-k -> shard -> head-k) must equal the
    single-frame pandas answer across many small blocks, mixed sort
    directions, ties, and groups smaller than k."""
    import numpy as np
    import pandas as pd
    import ray.data
    from kkray.ops import grouped_top_k

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 12, 500),
            "v": rng.integers(0, 40, 500),  # heavy ties
            "id": np.arange(500),
        }
    )
    ds = ray.data.from_pandas(df).repartition(13)  # force many combiner batches
    got = (
        grouped_top_k(ds, ["g"], ["v", "id"], k=4, descending=[True, False])
        .to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
    )
    want = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .groupby("g", sort=False).head(4)
        .sort_values(["g", "id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "v", "id"]], want[["g", "v", "id"]])


def test_hopping_window_covers_and_sums(ray_session):
    """Each event must appear in exactly size/hop windows; per-type totals
    are 4x the raw counts/sums."""
    import duckdb
    from kkray.relational.queries import events_hopping_window

    sf = "/root/testdata/sf0.001"
    out = events_hopping_window(sf)
    con = duckdb.connect()
    raw = con.execute(
        f"SELECT event_type, count(*) n, sum(value) s FROM '{sf}/events.parquet' GROUP BY 1"
    ).df()
    got = out.groupby("event_type", as_index=False).agg(n=("n_events", "sum"), s=("sum_value", "sum"))
    m = got.merge(raw, on="event_type", suffixes=("_w", "_raw"))
    assert (m["n_w"] == 4 * m["n_raw"]).all()
    assert np.allclose(m["s_w"], 4 * m["s_raw"], rtol=1e-9)
    # window starts are 15-min aligned
    assert (out["window_start"].astype("int64") % (15 * 60 * 1_000_000) == 0).all()


def test_grouped_quantile_matches_numpy_rule(ray_session):
    """grouped_quantile == sorted[ceil(q*n)-1] per group, multi-key too."""
    import ray.data
    from kkray.ops import grouped_quantile

    rng = np.random.default_rng(5)
    n = 5000
    df = pd.DataFrame(
        {
            "k1": rng.integers(0, 7, n),
            "k2": rng.choice(["x", "y"], n),
            "v": rng.random(n).round(4),
        }
    )
    got = (
        grouped_quantile(ray.data.from_pandas(df).repartition(5), ["k1", "k2"], "v", [0.5, 0.9])
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )

    def disc(s, q):
        v = np.sort(s.to_numpy())
        return v[max(int(np.ceil(q * len(v))), 1) - 1]

    exp = (
        df.groupby(["k1", "k2"])["v"]
        .agg([("q50", lambda s: disc(s, 0.5)), ("q90", lambda s: disc(s, 0.9))])
        .reset_index()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    assert (got["k1"].to_numpy() == exp["k1"].to_numpy()).all()
    assert (got["k2"].to_numpy() == exp["k2"].to_numpy()).all()
    assert np.array_equal(got["q50"].to_numpy(), exp["q50"].to_numpy())
    assert np.array_equal(got["q90"].to_numpy(), exp["q90"].to_numpy())


def test_stratified_sample_deterministic_and_balanced(ray_session):
    import ray.data
    from kkray.ops import stratified_sample

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"grp": rng.choice(["a", "b", "c"], 900), "id": np.arange(900)})
    ds = ray.data.from_pandas(df).repartition(6)
    s1 = stratified_sample(ds, ["grp"], "id", k=7).to_pandas().sort_values(["grp", "id"]).reset_index(drop=True)
    s2 = stratified_sample(ds, ["grp"], "id", k=7).to_pandas().sort_values(["grp", "id"]).reset_index(drop=True)
    assert s1.equals(s2)  # deterministic across runs
    assert (s1.groupby("grp").size() == 7).all()
    # matches the direct rule on the full frame
    h = ((df["id"].to_numpy().astype(np.uint64) % np.uint64(4294967291)) * np.uint64(2654435761)) % np.uint64(4294967291)
    h = h.astype(np.int64)
    exp = (
        df.assign(_h=h)
        .sort_values(["_h", "id"])
        .groupby("grp", sort=False)
        .head(7)[["grp", "id"]]
        .sort_values(["grp", "id"])
        .reset_index(drop=True)
    )
    assert s1.equals(exp)


def test_stratified_sample_large_ids_match_sql(ray_session):
    """ids >= 2^32 (where the old int64 product wrapped): the reduce-first
    uint64 hash matches DuckDB's HUGEINT mod arithmetic exactly."""
    import ray.data
    from kkray.ops import stratified_sample

    rng = np.random.default_rng(5)
    ids = rng.integers(2**33, 2**62, size=400, dtype=np.int64)
    df = pd.DataFrame({"grp": rng.choice(["x", "y"], 400), "id": ids})
    ds = ray.data.from_pandas(df).repartition(4)
    got = (
        stratified_sample(ds, ["grp"], "id", k=6)
        .to_pandas()
        .sort_values(["grp", "id"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """SELECT grp, id FROM (
             SELECT grp, id, row_number() OVER (PARTITION BY grp
                 ORDER BY ((id % 4294967291)::HUGEINT * 2654435761) % 4294967291, id) AS rn
             FROM df) WHERE rn <= 6 ORDER BY grp, id"""
    ).df()
    assert got[["grp", "id"]].reset_index(drop=True).equals(exp)


def test_grouped_approx_distinct_accuracy(ray_session):
    """HLL estimate within 3% of exact at p=12 on the testdata AND on a
    wide synthetic cardinality range."""
    import ray.data
    from kkray.ops import grouped_approx_distinct

    ev = ray.data.read_parquet("/root/testdata/sf0.01/events.parquet",
                               columns=["event_type", "user_id"])
    got = grouped_approx_distinct(ev, ["event_type"], "user_id").to_pandas().set_index("event_type")
    exact = (
        pd.read_parquet("/root/testdata/sf0.01/events.parquet", columns=["event_type", "user_id"])
        .groupby("event_type")["user_id"].nunique()
    )
    for g in exact.index:
        assert abs(got.loc[g, "approx_distinct"] - exact[g]) / exact[g] < 0.03
    # tiny cardinality exercises the small-range (linear counting) branch
    df = pd.DataFrame({"g": ["x"] * 1000, "v": np.arange(1000) % 7})
    small = grouped_approx_distinct(ray.data.from_pandas(df), ["g"], "v").to_pandas()
    assert small["approx_distinct"].tolist() == [7]


def test_curated_corpus_pipeline_stages(ray_session):
    """The composed pipeline's survivors must each pass the quality filter,
    be the min doc_id of their text group, and number k per language."""
    from kkray.pipelines.corpus import curated_corpus
    from kkray.textops import QualityFilter

    sf = "/root/testdata/sf0.001"
    out = curated_corpus(sf, k_per_lang=3)
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    assert (out.groupby("lang").size() <= 3).all() and len(out) > 0
    qf = QualityFilter()(docs).set_index("doc_id")
    assert (qf.loc[out["doc_id"], "keep"] == 1).all()
    # winners are the min doc_id of their exact-text group among kept docs
    kept = docs[qf.loc[docs["doc_id"], "keep"].to_numpy() == 1]
    min_of_text = kept.groupby("text")["doc_id"].min()
    winners = set(min_of_text.to_numpy())
    assert set(out["doc_id"]).issubset(winners)
