"""Relational demo pipelines over the driver testdata — the general
operator surface (scans with column pruning, vectorized filters, grouped
aggregates with partial pre-aggregation, broadcast joins, sort/limit top-k,
tumbling-window aggregation over the events stream table).

Column names are frozen to match the DuckDB oracles in __ray_entry__.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .join import broadcast_join


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-flavoured grouped aggregate with a pre-aggregation combiner:
    per-batch partial sums -> tiny global groupby."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        t2 = t.append_column("disc_price", disc_price)
        return t2.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("disc_price", "sum"), ("l_quantity", "count")]
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity_sum", alias_name="sum_qty"),
            Sum("l_extendedprice_sum", alias_name="sum_base_price"),
            Sum("disc_price_sum", alias_name="sum_disc_price"),
            Sum("l_quantity_count", alias_name="count_order"),
        )
        .to_pandas()
    )
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = out[c].round(2)  # float sums rounded so the value-hash vs the SQL oracle is order-insensitive
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def revenue_per_nation(sf_dir: str) -> pd.DataFrame:
    """orders |x| customer |x| nation: broadcast-join the dimensions, partial
    revenue sums per batch, small final groupby."""
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[["c_custkey", "n_name"]]
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, dim.rename(columns={"c_custkey": "o_custkey"}), on="o_custkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n_name", as_index=False).agg(revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values("n_name").reset_index(drop=True)


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k customers by total order value: grouped sum -> global sort ->
    limit (deterministic tie-break by custkey)."""
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    from ray.data.aggregate import Sum

    agg = orders.groupby("o_custkey").aggregate(Sum("o_totalprice", alias_name="total_spent"))
    df = agg.sort(["total_spent", "o_custkey"], descending=[True, False]).limit(k).to_pandas()
    df["total_spent"] = df["total_spent"].round(2)
    return df


def events_hourly_window(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per (user, event_type): the streaming-shaped
    aggregate (windows computed per batch, then a grouped partial-sum —
    ordering-free because tumbling windows partition event time)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t.column("ts"), unit="hour").cast(pa.timestamp("us"))
        return t.append_column("window_start", w)

    from ray.data.aggregate import Count, Sum

    out = (
        ev.map_batches(add_window, batch_format="pyarrow")
        .groupby(["user_id", "event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(6)
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out.sort_values(["user_id", "event_type", "window_start"]).reset_index(drop=True)


def customers_without_events(sf_dir: str) -> pd.DataFrame:
    """Anti-join: customers who never appear in the events stream. The
    event-side key set is collected DISTINCT (per-batch unique combiner,
    one groupby — small relative to the fact table), broadcast once via
    ray.put, and probed per customer batch with pc.is_in — no row-level
    shuffle of the customer table. At a larger right side, swap the
    broadcast for a hash-partitioned left join + null filter."""
    import ray as _ray

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    from ..ops import collect_arrow, distinct_rows

    keys_tbl = collect_arrow(
        distinct_rows(ev, ["user_id"]), empty_schema=pa.schema([("user_id", pa.int64())])
    )
    keys_ref = _ray.put(keys_tbl.column("user_id").combine_chunks())

    class AntiProbe:
        def __init__(self):
            self.keys = _ray.get(keys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            hit = pc.is_in(t.column("c_custkey"), value_set=self.keys)
            return t.filter(pc.invert(hit))

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    out = cust.map_batches(AntiProbe, batch_format="pyarrow", concurrency=(1, 8)).to_pandas()
    if "c_custkey" not in out.columns:  # all-filtered: schema-less empty df
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"), "c_name": pd.Series([], dtype="str")})
    return out.sort_values("c_custkey").reset_index(drop=True)


def distinct_users_per_event_type(sf_dir: str) -> pd.DataFrame:
    """Exact grouped distinct count: per-batch (event_type, user_id) dedup
    combiner -> global two-key distinct -> grouped count. The shuffle
    carries unique pairs, not raw events."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    from ..ops import distinct_rows

    pairs = distinct_rows(ev, ["event_type", "user_id"])
    from ray.data.aggregate import Count

    out = pairs.groupby("event_type").aggregate(Count(alias_name="n_users")).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def approx_distinct_users_per_event_type(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog grouped distinct (p=12, ~1.6% error) — the sketch path
    beside the exact distinct_users_per_event_type; deterministic, and
    hash-oracled against an exact SQL re-implementation of the sketch
    (splitmix64 registers + estimate in __ray_entry__.oracle_sql);
    accuracy vs exact counts is additionally pytest-verified."""
    from ..ops import grouped_approx_distinct

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    out = grouped_approx_distinct(ev, ["event_type"], "user_id").to_pandas()
    out["approx_distinct"] = out["approx_distinct"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def sample_docs_per_lang(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Deterministic stratified sample: the k docs per language with the
    smallest keyed multiplicative hash — reproducible balanced-corpus
    sampling, SQL-expressible (same mod arithmetic in an ORDER BY)."""
    from ..ops import stratified_sample

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    out = stratified_sample(docs, ["lang"], "doc_id", k=k).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["lang", "doc_id"]].sort_values(["lang", "doc_id"]).reset_index(drop=True)


def value_quantiles_per_event_type(sf_dir: str) -> pd.DataFrame:
    """Exact per-group discrete quantiles (q25/q50/q90) of event value —
    grouped_quantile's sorted[ceil(q*n)-1] rule == DuckDB quantile_disc."""
    from ..ops import grouped_quantile

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    out = grouped_quantile(ev, ["event_type"], "value", [0.25, 0.5, 0.9]).to_pandas()
    for c in ("q25", "q50", "q90"):
        out[c] = out[c].round(6)
    return out.sort_values("event_type").reset_index(drop=True)


def events_hopping_window(sf_dir: str, size_min: int = 60, hop_min: int = 15) -> pd.DataFrame:
    """Hopping (sliding) window per event_type: each event lands in
    size/hop overlapping windows. Vectorized explode inside map_batches
    (np.repeat rows x np.tile window offsets — the shuffle then carries
    per-batch grouped partials, not the raw 4x explode), then one global
    grouped count/sum. Ordering-free like the tumbling variant."""
    assert size_min % hop_min == 0
    k = size_min // hop_min
    hop_us = hop_min * 60_000_000
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def explode_windows(t: pa.Table) -> pa.Table:
        base = (
            pc.floor_temporal(t.column("ts"), multiple=hop_min, unit="minute")
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n = len(base)
        starts = np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64) * hop_us, n)
        g = pa.table(
            {
                "event_type": pc.take(t.column("event_type"), pa.array(np.repeat(np.arange(n), k))),
                "window_start": pa.array(starts),
                "value": pc.take(t.column("value"), pa.array(np.repeat(np.arange(n), k))),
            }
        )
        # per-batch combiner: partial count+sum per (type, window)
        agg = g.group_by(["event_type", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return pa.table(
            {
                "event_type": agg.column("event_type"),
                "window_start": agg.column("window_start"),
                "n_partial": agg.column("value_count"),
                "sum_partial": agg.column("value_sum"),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ev.map_batches(explode_windows, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_partial", alias_name="n_events"), Sum("sum_partial", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(6)
    out["window_start"] = pd.to_datetime(out["window_start"], unit="us").astype("datetime64[us]")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


def filter_pushdown_scan(sf_dir: str, collect: bool = True):
    """Scan with column pruning + row filter pushed to the parquet read
    (predicate: high-value open orders). Returns the lazy Dataset when
    ``collect=False`` (the scale path — the filtered scan streams to its
    consumer; nothing materializes on the driver); collect=True is the
    small-SF contract mode that hands the driver's gate a sorted frame."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"],
        filter=(pc.field("o_orderstatus") == "O") & (pc.field("o_totalprice") > 100000.0),
    )
    if not collect:
        return ds
    return ds.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
