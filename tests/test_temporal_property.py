"""Property-based tests (hypothesis) for the temporal operators.

Tiny integer timestamp domains force heavy ties — the regime where
session-gap boundaries, as-of tie-breaks, and inclusive range ends are
easiest to get wrong and least likely to be exercised by the realistic
driver testdata.
"""
import numpy as np
import pandas as pd
import ray.data
from hypothesis import given, settings, strategies as st

from kkray.relational.temporal import asof_join, range_join_count, sessionize

EPOCH = pd.Timestamp("2024-01-01")


def _events(rows):
    """rows: list of (user, sec, eid) -> DataFrame with datetime64[us] ts."""
    df = pd.DataFrame(rows, columns=["user_id", "sec", "event_id"])
    df["ts"] = (EPOCH + pd.to_timedelta(df.pop("sec"), unit="s")).astype("datetime64[us]")
    return df[["user_id", "ts", "event_id"]]


event_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # user
        st.integers(min_value=0, max_value=30),  # second (heavy ties)
    ),
    min_size=1,
    max_size=40,
).map(lambda rs: [(u, s, i) for i, (u, s) in enumerate(rs)])  # unique event ids


@settings(max_examples=10, deadline=None)
@given(rows=event_rows, gap_s=st.integers(min_value=1, max_value=12), nb=st.integers(min_value=1, max_value=4))
def test_sessionize_matches_bruteforce(ray_session, rows, gap_s, nb):
    df = _events(rows)
    got = (
        sessionize(ray.data.from_pandas(df), gap=f"{gap_s}s", num_buckets=nb)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        t = g["ts"].to_numpy()
        sidx, start, n = 0, t[0], 0
        for i in range(len(t)):
            if i > 0 and (t[i] - t[i - 1]) > np.timedelta64(gap_s, "s"):
                exp_rows.append((u, sidx, n, start))
                sidx, start, n = sidx + 1, t[i], 0
            n += 1
        exp_rows.append((u, sidx, n, start))
    exp = pd.DataFrame(exp_rows, columns=["user_id", "session_idx", "n_events", "session_start"])
    exp["session_start"] = exp["session_start"].astype("datetime64[us]")
    got["session_start"] = pd.to_datetime(got["session_start"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got[exp.columns].astype({"session_idx": "int64", "n_events": "int64"}), exp
    )


@settings(max_examples=10, deadline=None)
@given(
    lrows=event_rows,
    rrows=event_rows,
    lo=st.integers(min_value=-10, max_value=5),
    width=st.integers(min_value=0, max_value=10),
    nb=st.integers(min_value=1, max_value=4),
)
def test_range_join_count_matches_bruteforce(ray_session, lrows, rrows, lo, width, nb):
    lp, rp = _events(lrows), _events(rrows)
    hi = lo + width
    got = (
        range_join_count(
            ray.data.from_pandas(lp),
            ray.data.from_pandas(rp),
            by="user_id",
            on="ts",
            lo_delta=f"{lo}s",
            hi_delta=f"{hi}s",
            num_buckets=nb,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp_n = []
    for _, row in lp.iterrows():
        w0, w1 = row["ts"] + pd.Timedelta(seconds=lo), row["ts"] + pd.Timedelta(seconds=hi)
        m = (rp["user_id"] == row["user_id"]) & (rp["ts"] >= w0) & (rp["ts"] <= w1)
        exp_n.append((row["event_id"], int(m.sum())))
    exp = pd.DataFrame(exp_n, columns=["event_id", "n_in_range"]).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "n_in_range"]].astype({"n_in_range": "int64"}), exp
    )


@settings(max_examples=10, deadline=None)
@given(lrows=event_rows, rrows=event_rows, nb=st.integers(min_value=1, max_value=4))
def test_asof_join_matches_bruteforce(ray_session, lrows, rrows, nb):
    lp, rp = _events(lrows), _events(rrows)
    got = (
        asof_join(
            ray.data.from_pandas(lp),
            ray.data.from_pandas(rp),
            by="user_id",
            on="ts",
            tie="event_id",
            right_cols={"ts": "r_ts", "event_id": "r_event"},
            num_buckets=nb,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp_rows = []
    for _, row in lp.iterrows():
        cand = rp[(rp["user_id"] == row["user_id"]) & (rp["ts"] <= row["ts"])]
        if len(cand):
            best = cand.sort_values(["ts", "event_id"], kind="mergesort").iloc[-1]
            exp_rows.append((row["event_id"], best["ts"], best["event_id"]))
        else:
            exp_rows.append((row["event_id"], pd.NaT, np.nan))
    exp = pd.DataFrame(exp_rows, columns=["event_id", "r_ts", "r_event"]).sort_values(
        "event_id"
    ).reset_index(drop=True)
    got_r = got[["event_id", "r_ts", "r_event"]].copy()
    got_r["r_ts"] = pd.to_datetime(got_r["r_ts"]).astype("datetime64[us]")
    exp["r_ts"] = pd.to_datetime(exp["r_ts"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got_r.astype({"r_event": "float64"}), exp.astype({"r_event": "float64"})
    )
