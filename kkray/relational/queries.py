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


def filter_pushdown_scan(sf_dir: str) -> pd.DataFrame:
    """Scan with column pruning + row filter pushed to the parquet read
    (predicate: high-value open orders)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"],
        filter=(pc.field("o_orderstatus") == "O") & (pc.field("o_totalprice") > 100000.0),
    )
    df = ds.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    return df
