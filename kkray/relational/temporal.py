"""Temporal operators Ray Data has no built-in for — as-of join, range
join, gap-based sessionization — expressed as the brief's option (a):
compositions of ``map_batches`` + ``groupby().map_groups``.

Partitioning assumption (documented per the build brief): every operator
hash-buckets rows by the equality key (``by`` / ``user`` column) into
``num_buckets`` buckets, so all rows of one key land in one bucket and the
per-bucket kernel sees complete keys. The shuffle is ONE groupby over
``num_buckets`` distinct values (a few per CPU) — not per-key (Ray Data's
``map_groups`` invokes its fn once per group, so grouping by the raw key
would be a per-key Python call) — and the per-bucket kernel is a
vectorized sort / searchsorted / merge_asof pass, never a per-row loop.
Skew is bounded by the largest single key's row count (the same bound a
hash join has); the equality dimension never replicates rows.

At 100 TB: buckets stream through the groupby shuffle like any other
aggregate; each bucket kernel is O(rows log rows) in its own rows only.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..utils import splitmix64


def _nbuckets(num_buckets: int | None) -> int:
    if num_buckets is not None:
        return num_buckets
    return max(2, int(ray.cluster_resources().get("CPU", 4)))


def _with_bucket(df: pd.DataFrame, key: str, nb: int) -> pd.DataFrame:
    df = df.copy()
    df["__bucket"] = (splitmix64(df[key].to_numpy().astype(np.uint64)) % np.uint64(nb)).astype(
        np.int64
    )
    return df


def _pad_to(cols: list[str]):
    """Schema-align a side of a tagged union (missing columns -> nulls) so
    Ray sees one schema across both inputs."""

    def pad(df: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            if c not in df.columns:
                df[c] = None
        return df[cols]

    return pad


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    tie: str,
    right_cols: dict[str, str],
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Backward as-of join: for each left row, the single right row with
    the greatest ``on`` <= the left row's ``on`` within the same ``by``
    key; ties on equal ``on`` break toward the greatest ``tie``. Left
    rows without a match keep nulls (left-outer semantics).

    ``right_cols`` maps each kept right column (must include ``on``; may
    include ``tie``) to a distinct output name, so the merged frame never
    collides with left column names.

    Per bucket: one ``pandas.merge_asof`` over frames sorted by
    ``(on, tie)`` — with duplicate ``on`` values merge_asof matches the
    LAST right row in sort order, i.e. the max-``tie`` row, exactly the
    SQL ``row_number() OVER (ORDER BY on DESC, tie DESC) = 1`` pick."""
    nb = _nbuckets(num_buckets)
    lcols = list(left.schema().names)
    keep_r = list(dict.fromkeys([by, on, tie] + list(right_cols)))
    allcols = sorted(set(lcols) | set(keep_r)) + ["__side", "__bucket"]
    out_rcols = [right_cols[c] for c in right_cols]

    ltag = left.map_batches(
        lambda df: _pad_to(allcols)(_with_bucket(df.assign(__side=np.int8(0)), by, nb)),
        batch_format="pandas",
    )
    rtag = right.select_columns(keep_r).map_batches(
        lambda df: _pad_to(allcols)(_with_bucket(df.assign(__side=np.int8(1)), by, nb)),
        batch_format="pandas",
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == 0, lcols].infer_objects().sort_values([on, tie], kind="mergesort")
        r = g.loc[g["__side"] == 1, keep_r].infer_objects().sort_values([on, tie], kind="mergesort")
        # right 'by' under a private name so merge_asof never sees a
        # duplicate label
        r = r.rename(columns={by: "__rby", **right_cols})
        out = pd.merge_asof(
            l,
            r[["__rby", *out_rcols]],
            left_on=on,
            right_on=right_cols[on],
            left_by=by,
            right_by="__rby",
            direction="backward",
            allow_exact_matches=True,
        )
        return out.drop(columns=["__rby"])

    return ltag.union(rtag).groupby("__bucket").map_groups(merge, batch_format="pandas")


def range_join_count(
    probe: ray.data.Dataset,
    cand: ray.data.Dataset,
    by: str,
    on: str,
    lo_delta,
    hi_delta,
    out_col: str = "n_in_range",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Range join (count form): for each probe row, the number of cand
    rows sharing its ``by`` key whose ``on`` lies in
    ``[probe.on + lo_delta, probe.on + hi_delta]`` (inclusive ends).

    Per bucket the kernel sorts cand once by ``(key, time)`` and answers
    ALL probes with two vectorized ``np.searchsorted`` calls over a
    composite ``rank(key) * (span+2) + (time - tmin)`` int64 encoding
    (overflow-guarded; falls back to per-unique-key slicing when the
    key-count x time-span product would overflow). Cost is
    O((N+M) log M) per bucket regardless of output pair multiplicity —
    the property a naive inequality join lacks."""
    nb = _nbuckets(num_buckets)
    pcols = list(probe.schema().names)
    allcols = sorted(set(pcols) | {by, on}) + ["__side", "__bucket"]
    lo_us = np.int64(pd.Timedelta(lo_delta).value // 1000)
    hi_us = np.int64(pd.Timedelta(hi_delta).value // 1000)

    ptag = probe.map_batches(
        lambda df: _pad_to(allcols)(_with_bucket(df.assign(__side=np.int8(0)), by, nb)),
        batch_format="pandas",
    )
    ctag = cand.select_columns([by, on]).map_batches(
        lambda df: _pad_to(allcols)(_with_bucket(df.assign(__side=np.int8(1)), by, nb)),
        batch_format="pandas",
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        # the schema-padding union turns probe-only columns object-dtyped
        # (cand rows carry nulls there); restore native dtypes
        p = g.loc[g["__side"] == 0, pcols].infer_objects()
        c = g.loc[g["__side"] == 1]
        if len(p) == 0:
            out = p.copy()
            out[out_col] = pd.Series(dtype="int64")
            return out
        out = p.copy()
        if len(c) == 0:
            out[out_col] = np.int64(0)
            return out
        cu = c[by].to_numpy(np.int64)
        ct = c[on].to_numpy("datetime64[us]").astype(np.int64)
        order = np.lexsort((ct, cu))
        cu, ct = cu[order], ct[order]
        pu = p[by].to_numpy(np.int64)
        pt = p[on].to_numpy("datetime64[us]").astype(np.int64)
        tmin = ct.min()
        span = np.int64(ct.max() - tmin)
        ku = np.unique(cu)
        kidx = np.searchsorted(ku, pu)
        kidx_c = np.searchsorted(ku, cu)
        present = (kidx < len(ku)) & (ku[np.minimum(kidx, len(ku) - 1)] == pu)
        lo = np.clip(pt + lo_us - tmin, 0, span + 1)
        hi = np.clip(pt + hi_us - tmin, -1, span)
        if len(ku) * (int(span) + 2) < 2**62:
            stride = span + np.int64(2)
            comp_c = kidx_c * stride + (ct - tmin)
            a = np.searchsorted(comp_c, kidx * stride + lo, side="left")
            b = np.searchsorted(comp_c, kidx * stride + hi, side="right")
            n = (b - a).astype(np.int64)
        else:  # overflow fallback: per-unique-key slice, inner calls vectorized
            seg = np.searchsorted(cu, ku)
            seg = np.append(seg, len(cu))
            n = np.zeros(len(p), dtype=np.int64)
            for j in range(len(ku)):
                m = kidx == j
                if not m.any():
                    continue
                sl = ct[seg[j] : seg[j + 1]]
                n[m] = np.searchsorted(sl, hi[m], side="right") - np.searchsorted(
                    sl, lo[m], side="left"
                )
        n[~present] = 0
        out[out_col] = n
        return out

    return ptag.union(ctag).groupby("__bucket").map_groups(kernel, batch_format="pandas")


def sessionize(
    events: ray.data.Dataset,
    user: str = "user_id",
    ts: str = "ts",
    tie: str = "event_id",
    gap: str | pd.Timedelta = "30min",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Gap-based sessionization (streaming-window operator): order each
    user's events by ``(ts, tie)``; a new session starts when the gap to
    the user's previous event exceeds ``gap``. One output row per
    session: (user, session_idx 0-based per user, n_events,
    session_start).

    Per bucket: ONE lexsort + diff + two cumsums — shard-then-vectorize,
    no per-user loop."""
    nb = _nbuckets(num_buckets)
    gap_us = np.int64(pd.Timedelta(gap).value // 1000)
    tagged = events.select_columns([user, ts, tie]).map_batches(
        lambda df: _with_bucket(df, user, nb), batch_format="pandas"
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    user: pd.Series(dtype="int64"),
                    "session_idx": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                    "session_start": pd.Series(dtype="datetime64[us]"),
                }
            )
        u = g[user].to_numpy(np.int64)
        t = g[ts].to_numpy("datetime64[us]").astype(np.int64)
        k = g[tie].to_numpy(np.int64)
        order = np.lexsort((k, t, u))
        u, t = u[order], t[order]
        new_user = np.empty(len(u), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (t[1:] - t[:-1]) > gap_us
        sid = np.cumsum(new_sess) - 1  # session ids, contiguous in sort order
        first_sid = sid[new_user]  # each user's first session id
        user_ix = np.cumsum(new_user) - 1
        sess_idx = (sid - first_sid[user_ix])[new_sess]
        return pd.DataFrame(
            {
                user: u[new_sess],
                "session_idx": sess_idx.astype(np.int64),
                "n_events": np.bincount(sid).astype(np.int64),
                "session_start": t[new_sess].astype("datetime64[us]"),
            }
        )

    return tagged.groupby("__bucket").map_groups(kernel, batch_format="pandas")
