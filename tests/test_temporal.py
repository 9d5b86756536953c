"""Temporal operators (as-of join, range join, sessionization) vs
DuckDB oracles on the driver testdata plus targeted edge cases."""
import duckdb
import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from kkray.relational.temporal import asof_join, range_join_count, sessionize

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return con


def test_sessionize_matches_sql(ray_session):
    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_id"])
    got = (
        sessionize(ev, gap="30min")
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    got["session_start"] = pd.to_datetime(got["session_start"])
    orc = _con().execute(
        """
        WITH x AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS ns
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), y AS (
          SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
          FROM x)
        SELECT user_id, session_idx::BIGINT AS session_idx, count(*)::BIGINT AS n_events,
               min(ts) AS session_start
        FROM y GROUP BY 1,2 ORDER BY 1,2"""
    ).df()
    pd.testing.assert_frame_equal(got, orc.reset_index(drop=True))
    # session invariant: per-user idx contiguous from 0
    for _, grp in got.groupby("user_id"):
        assert np.array_equal(grp["session_idx"].to_numpy(), np.arange(len(grp)))


def test_sessionize_gap_boundary(ray_session):
    """Events exactly `gap` apart stay in ONE session (strict > starts a
    new one); one microsecond beyond splits."""
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": [
                t0,
                t0 + pd.Timedelta("30min"),            # == gap -> same session
                t0 + pd.Timedelta("60min") + pd.Timedelta("1us"),  # > gap -> new
                t0,
                t0 + pd.Timedelta("31min"),            # > gap -> new
            ],
            "event_id": [0, 1, 2, 3, 4],
        }
    )
    out = (
        sessionize(ray.data.from_pandas(df), gap="30min", num_buckets=2)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    assert out["n_events"].tolist() == [2, 1, 1, 1]
    assert out["session_idx"].tolist() == [0, 1, 0, 1]


def test_asof_join_matches_sql(ray_session):
    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    p = ev.filter(expr="event_type == 'purchase'").select_columns(["event_id", "user_id", "ts"])
    c = ev.filter(expr="event_type == 'click'").select_columns(["event_id", "user_id", "ts"])
    got = asof_join(
        p, c, by="user_id", on="ts", tie="event_id",
        right_cols={"ts": "click_ts", "event_id": "click_event_id"},
    ).to_pandas()
    got["click_event_id"] = got["click_event_id"].fillna(-1).astype("int64")
    got = got[["event_id", "user_id", "click_event_id"]].sort_values("event_id").reset_index(drop=True)
    orc = _con().execute(
        """
        WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
             c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click'),
             m AS (
          SELECT p.event_id, p.user_id, c.event_id AS click_event_id,
                 row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
          FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
        SELECT event_id, user_id, COALESCE(click_event_id, -1) AS click_event_id
        FROM m WHERE rn=1 ORDER BY event_id"""
    ).df()
    pd.testing.assert_frame_equal(got, orc.reset_index(drop=True))
    assert (got["click_event_id"] >= 0).any()  # some matches exist
    assert (got["click_event_id"] == -1).any() or len(got) > 0


def test_asof_join_exact_ts_tie(ray_session):
    """Two right rows at the SAME timestamp <= probe: max tie id wins;
    exact-equal timestamps DO match (allow_exact_matches)."""
    l = pd.DataFrame({"event_id": [100], "user_id": [7], "ts": [pd.Timestamp("2024-01-01 12:00")]})
    r = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [7, 7, 7],
            "ts": pd.to_datetime(["2024-01-01 12:00", "2024-01-01 12:00", "2024-01-01 13:00"]),
        }
    )
    out = asof_join(
        ray.data.from_pandas(l), ray.data.from_pandas(r),
        by="user_id", on="ts", tie="event_id",
        right_cols={"ts": "r_ts", "event_id": "r_id"}, num_buckets=2,
    ).to_pandas()
    assert int(out["r_id"].iloc[0]) == 2  # equal-ts tie -> max id; 13:00 excluded


def test_range_join_matches_sql(ray_session):
    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    e = ev.filter(expr="event_type == 'error'").select_columns(["event_id", "user_id", "ts"])
    p = ev.filter(expr="event_type == 'purchase'").select_columns(["user_id", "ts"])
    got = (
        range_join_count(e, p, by="user_id", on="ts", lo_delta="-1h", hi_delta="1h", out_col="n_purchases")
        .to_pandas()[["event_id", "n_purchases"]]
        .astype("int64")
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    orc = _con().execute(
        """
        SELECT e.event_id, count(p.event_id)::BIGINT AS n_purchases
        FROM events e LEFT JOIN events p
          ON p.user_id = e.user_id AND p.event_type='purchase'
         AND p.ts BETWEEN e.ts - INTERVAL 1 HOUR AND e.ts + INTERVAL 1 HOUR
        WHERE e.event_type='error' GROUP BY 1 ORDER BY 1"""
    ).df()
    pd.testing.assert_frame_equal(got, orc.reset_index(drop=True))


def test_range_join_inclusive_bounds_and_absent_key(ray_session):
    """Window ends are inclusive; probe keys absent from cand count 0
    (and never borrow a neighbouring key's rows)."""
    probe = pd.DataFrame(
        {"event_id": [0, 1], "user_id": [5, 99], "ts": pd.to_datetime(["2024-01-01 12:00"] * 2)}
    )
    cand = pd.DataFrame(
        {
            "user_id": [5, 5, 5, 6],
            "ts": [
                pd.Timestamp("2024-01-01 11:00"),
                pd.Timestamp("2024-01-01 13:00"),
                pd.Timestamp("2024-01-01 13:00") + pd.Timedelta("1us"),
                pd.Timestamp("2024-01-01 12:00"),
            ],
        }
    )
    out = (
        range_join_count(
            ray.data.from_pandas(probe), ray.data.from_pandas(cand),
            by="user_id", on="ts", lo_delta="-1h", hi_delta="1h", num_buckets=2,
        )
        .to_pandas()
        .sort_values("event_id")
    )
    # user 5: 11:00 and 13:00 inclusive; 13:00.000001 excluded. user 99: 0.
    assert out["n_in_range"].tolist() == [2, 0]
