"""Shared distributed operator helpers.

Ray Data's ``groupby(key).map_groups(fn)`` invokes ``fn`` once per GROUP —
fine for thousands of groups, pathological for millions of distinct keys
(LSH buckets, distinct-row dedup). These helpers use the shard-then-
vectorize pattern instead: hash keys into ``num_shards`` coarse shards
(one shuffle, same volume), then process each whole shard with ONE
vectorized pandas/numpy call.

Row hashing uses ``pd.util.hash_pandas_object`` (stable 64-bit siphash,
deterministic across processes — safe for resumable runs).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def collect_arrow(ds: ray.data.Dataset, empty_schema: pa.Schema | None = None) -> pa.Table:
    """Collect a SMALL dataset into one arrow table, tolerating the pandas
    blocks ``to_arrow_refs`` can hand back (groupby/map_groups emits empty
    pandas blocks for unpopulated groups). Only for broadcast-sized data —
    never call on anything edge- or corpus-sized."""
    import ray as _ray

    tabs = []
    for t in _ray.get(ds.to_arrow_refs()):
        if not isinstance(t, pa.Table):
            if len(t) == 0:
                continue
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows:
            tabs.append(t)
    if tabs:
        return pa.concat_tables(tabs)
    if empty_schema is not None:
        return empty_schema.empty_table()
    schema = ds.schema(fetch_if_missing=True)
    base = getattr(schema, "base_schema", None) if schema is not None else None
    if isinstance(base, pa.Schema):
        return base.empty_table()
    if base is not None and hasattr(base, "names") and hasattr(base, "types"):
        # PandasBlockSchema (pandas-block pipelines): numpy dtypes -> arrow;
        # object columns (strings in pandas blocks) have no numpy mapping
        def _pa_type(t):
            d = np.dtype(t)
            return pa.string() if d == np.dtype(object) else pa.from_numpy_dtype(d)

        fields = [(n, _pa_type(t)) for n, t in zip(base.names, base.types)]
        return pa.schema(fields).empty_table()
    return pa.schema([]).empty_table()


def to_pandas_typed(ds: ray.data.Dataset) -> pd.DataFrame:
    """``ds.to_pandas()``, but an all-empty result keeps the dataset's
    schema. Ray 2.49's ``to_pandas`` returns a column-less frame when no
    non-degenerate block survives (e.g. a pair operator on an empty
    corpus), even though ``ds.schema()`` knows the unified columns —
    rebuild the typed empty frame from that schema instead."""
    df = ds.to_pandas()
    if len(df) == 0 and len(df.columns) == 0:
        return collect_arrow(ds).to_pandas()
    return df


def pa_from_pandas(df: pd.DataFrame) -> pa.Table:
    """pandas -> arrow WITHOUT the b'pandas' schema metadata: pyarrow
    schemas carrying that metadata are unhashable (hash(schema) raises
    "unhashable type: 'dict'"), which defeats Ray's schema dedup in every
    downstream join/shuffle and floods the log with warnings."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def _shard_of(df: pd.DataFrame, cols: list[str], num_shards: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(df[cols], index=False).to_numpy()
    return (h % np.uint64(num_shards)).astype(np.int32)


def distinct_rows(ds: ray.data.Dataset, cols: list[str], num_shards: int = 64) -> ray.data.Dataset:
    """Exact distinct over `cols`: per-batch local dedup (combiner) ->
    shard by row hash -> per-shard vectorized dedup."""

    def local(df: pd.DataFrame) -> pa.Table:
        out = df[cols].drop_duplicates()
        return pa_from_pandas(out.assign(_shard=_shard_of(out, cols, num_shards)))

    def per_shard(g: pd.DataFrame) -> pa.Table:
        # emit ARROW: pandas blocks out of map_groups carry a schema
        # wrapper that downstream join/groupby stages can't hash (log spam
        # + missed schema dedup)
        return pa_from_pandas(g.drop_duplicates(cols)[cols])

    return (
        ds.map_batches(local, batch_format="pandas")
        .groupby("_shard")
        .map_groups(per_shard, batch_format="pandas")
    )


def grouped_top_k(
    ds: ray.data.Dataset,
    group_cols: list[str],
    order_cols: list[str],
    k: int = 10,
    descending: bool | list[bool] = True,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Per-group top-k without a global sort — the 100 TB shape: each
    input batch keeps at most k rows per group (combiner), so the shuffle
    carries O(k x groups-per-batch) rows instead of the whole input; the
    per-shard pass applies the same head-k to the merged partials.
    Deterministic when ``order_cols`` is a total order (append a unique id
    column last to break ties)."""
    asc = (
        [not descending] * len(order_cols)
        if isinstance(descending, bool)
        else [not d for d in descending]
    )

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order_cols, ascending=asc).groupby(group_cols, sort=False).head(k)

    def local(df: pd.DataFrame) -> pa.Table:
        out = head_k(df)
        return pa_from_pandas(out.assign(_shard=_shard_of(out, group_cols, num_shards)))

    def per_shard(g: pd.DataFrame) -> pa.Table:
        return pa_from_pandas(head_k(g.drop(columns=["_shard"])))

    return (
        ds.map_batches(local, batch_format="pandas")
        .groupby("_shard")
        .map_groups(per_shard, batch_format="pandas")
    )


def bucket_pairs(
    ds: ray.data.Dataset,
    key_cols: list[str],
    id_col: str,
    payload_col: str | None = None,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """All unordered id pairs sharing a key (the LSH candidate-pair
    explode): shard by key hash, then per shard sort + run-detect + pair
    expansion; the python loop touches only multi-member buckets.
    Output: (a, b[, payload_a, payload_b]) with a < b, deduplicated."""

    def local(df: pd.DataFrame) -> pa.Table:
        keep = key_cols + [id_col] + ([payload_col] if payload_col else [])
        out = df[keep].copy()
        out["_shard"] = _shard_of(out, key_cols, num_shards)
        return pa_from_pandas(out)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_cols + [id_col]).drop_duplicates(key_cols + [id_col])
        keys = pd.util.hash_pandas_object(g[key_cols], index=False).to_numpy()
        ids = g[id_col].to_numpy()
        pay = g[payload_col].to_numpy() if payload_col else None
        starts = np.concatenate([[0], np.flatnonzero(np.diff(keys) != 0) + 1, [len(keys)]])
        a_out, b_out, pa_out, pb_out = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            k = e - s
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, 1)
            a_out.append(ids[s:e][ii])
            b_out.append(ids[s:e][jj])
            if pay is not None:
                pa_out.append(pay[s:e][ii])
                pb_out.append(pay[s:e][jj])
        if not a_out:
            cols = {"a": np.empty(0, ids.dtype), "b": np.empty(0, ids.dtype)}
            if payload_col:
                cols["payload_a"] = np.empty(0, pay.dtype)
                cols["payload_b"] = np.empty(0, pay.dtype)
            return pd.DataFrame(cols)
        out = {"a": np.concatenate(a_out), "b": np.concatenate(b_out)}
        if payload_col:
            out["payload_a"] = np.concatenate(pa_out)
            out["payload_b"] = np.concatenate(pb_out)
        df = pd.DataFrame(out)
        return df.drop_duplicates(["a", "b"])

    paired = (
        ds.map_batches(local, batch_format="pandas")
        .groupby("_shard")
        .map_groups(per_shard, batch_format="pandas")
    )
    # cross-shard (a,b) dedup: same pair can surface from different keys
    cols = ["a", "b"] + (["payload_a", "payload_b"] if payload_col else [])

    def local2(df: pd.DataFrame) -> pa.Table:
        out = df[cols].drop_duplicates(["a", "b"])
        return pa_from_pandas(out.assign(_shard=_shard_of(out, ["a", "b"], num_shards)))

    return (
        paired.map_batches(local2, batch_format="pandas")
        .groupby("_shard")
        .map_groups(
            lambda g: pa_from_pandas(g.drop_duplicates(["a", "b"])[cols]),
            batch_format="pandas",
        )
    )


def grouped_quantile(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    qs: list[float],
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """EXACT per-group discrete quantiles: value = sorted[ceil(q*n) - 1]
    (DuckDB ``quantile_disc`` semantics, verified empirically). Exact
    quantiles need every (key, value) pair co-located, so this shuffles
    the two projected columns once into key-hash buckets and runs ONE
    vectorized kernel per bucket (sort + per-group boundary indexing over
    all keys in the bucket — no per-key python). For sketch-accuracy at
    100 TB, pre-aggregate with a t-digest instead; this is the exact
    form."""

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keys + [col]].copy()
        out["_bucket"] = _shard_of(df, keys, num_buckets)
        return out

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(keys + [col], kind="mergesort")
        vals = d[col].to_numpy()
        sizes = d.groupby(keys, sort=False).size()
        ends = np.cumsum(sizes.to_numpy())
        starts = ends - sizes.to_numpy()
        idx_df = sizes.index.to_frame(index=False)
        idx_df.columns = keys
        res = {k: idx_df[k].to_numpy() for k in keys}
        for q in qs:
            idx = starts + np.maximum(np.ceil(q * sizes.to_numpy()).astype(np.int64), 1) - 1
            res[f"q{int(q * 100)}"] = vals[idx]
        return pd.DataFrame(res)

    return (
        ds.map_batches(bucketed, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def stratified_sample(
    ds: ray.data.Dataset,
    group_cols: list[str],
    id_col: str,
    k: int,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Deterministic per-group sample: the k rows with the smallest keyed
    multiplicative hash of ``id_col`` (h = (id mod 4294967291) * 2654435761
    mod 4294967291; the reduce-first keeps the product < 2^64, so the uint64
    arithmetic is EXACT for every non-negative int64 id — no silent wrap)
    — the balanced-corpus-sampling shape (k docs per language/source),
    reproducible across runs and SQL-expressible (mirror arithmetic:
    ``((id % 4294967291)::HUGEINT * 2654435761) % 4294967291``; ids must be
    non-negative — numpy floor-mod and SQL remainder diverge below zero).
    Rides grouped_top_k, so each input batch contributes at most k rows per
    group to the shuffle."""
    MUL, MOD = np.uint64(2654435761), np.uint64(4294967291)

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        if np.any(np.asarray(ids) < 0):
            raise ValueError("stratified_sample: id_col must be non-negative")
        out = df.copy()
        out["_h"] = (((ids.astype(np.uint64) % MOD) * MUL) % MOD).astype(np.int64)
        return out

    picked = grouped_top_k(
        ds.map_batches(add_hash, batch_format="pandas"),
        group_cols,
        ["_h", id_col],
        k=k,
        descending=False,
        num_shards=num_shards,
    )
    return picked.map_batches(lambda df: df.drop(columns=["_h"]), batch_format="pandas")


def grouped_approx_distinct(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    p: int = 12,
) -> ray.data.Dataset:
    """Approximate per-group distinct count (HyperLogLog, 2^p registers,
    relative error ~1.04/sqrt(2^p) ≈ 1.6% at p=12) — the sketch path for
    corpus-scale cardinalities where the exact form's unique-pair shuffle
    is too wide. Per batch: one vectorized (key, register)->max(rho)
    combiner, so the shuffle carries at most |groups| x 2^p rows total
    regardless of input size; the final estimate runs per key-bucket.
    Hashing is pd.util.hash_pandas_object (deterministic siphash), so
    results are reproducible across runs."""
    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[col], index=False).to_numpy()  # uint64
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits
        # rho = leading-zero count of the remaining 64-p bits + 1
        # log2 via float is exact for the leading-bit position
        nz = rest.astype(np.float64)
        lead = 63 - np.floor(np.log2(nz)).astype(np.int64)  # leading zeros of rest
        # float64 can round rest values within ~2^10 of 2^64 UP to 2^64
        # (log2 -> 64, lead -> -1); clip keeps rho in its legal [1, 64-p+1]
        rho = np.clip(np.minimum(lead, 64 - p) + 1, 1, 64 - p + 1)
        out = df[keys].copy()
        out["_b"] = bucket
        out["_rho"] = rho
        return out.groupby(keys + ["_b"], as_index=False)["_rho"].max()

    regs = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys + ["_b"])
        .max("_rho")
    )

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys)
        alpha = 0.7213 / (1 + 1.079 / m)
        rows = []
        for key, sub in g:
            rho = sub["max(_rho)"].to_numpy()
            zeros = m - len(rho)
            s = zeros * 1.0 + np.sum(np.exp2(-rho.astype(np.float64)))
            e = alpha * m * m / s
            if e <= 2.5 * m and zeros > 0:
                e = m * np.log(m / zeros)
            rows.append((*(key if isinstance(key, tuple) else (key,)), int(round(e))))
        return pd.DataFrame(rows, columns=keys + ["approx_distinct"])

    # bucket registers by key hash so the estimator sees every register of
    # a key in ONE group (few rows per key: <= 2^p)
    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_kb"] = _shard_of(df, keys, 64)
        return out

    return (
        regs.map_batches(rebucket, batch_format="pandas")
        .groupby("_kb")
        .map_groups(lambda g: estimate(g.drop(columns=["_kb"])), batch_format="pandas")
    )


def shard_assignment(
    ds: ray.data.Dataset,
    id_col: str,
    n_shards: int,
    carry_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Deterministic training-data shuffle: assign every row a shard and a
    position within that shard from a keyed multiplicative hash of
    ``id_col`` — the "global shuffle" prep step of an LLM training
    pipeline, made reproducible and resumable (re-running yields the
    identical layout; a failed run can re-emit exactly the missing
    shards). Output: (id_col, shard, pos) with shard = h % n_shards and
    pos = 0-based rank of (h, id) within the shard.

    Hash rule shares stratified_sample's SQL-parity arithmetic
    (h = (id mod 4294967291) * 2654435761 mod 4294967291, exact in
    uint64 for every non-negative int64 id); ties in h break by id, so
    the order is total and deterministic.

    100 TB shape: ONE shuffle keyed by shard; each shard is ranked by a
    single vectorized lexsort and is exactly one output partition —
    size ``n_shards`` so a shard fits a task (e.g. 100k shards for
    10^12 docs), the same knob a partitioned-Parquet sink needs anyway.
    ``carry_cols`` rides payload columns (e.g. the chunk text) through
    the same single shuffle, so callers never need a post-hoc join back
    onto the layout (Ray 2.49 ``Dataset.join`` crashes on empty hash
    partitions — see NOTES; the carry path avoids it entirely)."""
    MUL, MOD = np.uint64(2654435761), np.uint64(4294967291)
    carry = list(carry_cols or [])
    if id_col in carry:
        raise ValueError(f"shard_assignment: carry_cols must not repeat id_col {id_col!r}")

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        if np.any(np.asarray(ids) < 0):
            raise ValueError("shard_assignment: id_col must be non-negative")
        h = ((ids.astype(np.uint64) % MOD) * MUL) % MOD
        out = pd.DataFrame(
            {
                id_col: ids,
                "_h": h.astype(np.int64),
                "shard": (h % np.uint64(n_shards)).astype(np.int64),
            }
        )
        for c in carry:
            out[c] = df[c].to_numpy()
        return out

    def rank_shard(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g[id_col].to_numpy(), g["_h"].to_numpy()))
        pos = np.empty(len(g), dtype=np.int64)
        pos[order] = np.arange(len(g), dtype=np.int64)
        out = pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "shard": g["shard"].to_numpy(),
                "pos": pos,
            }
        )
        for c in carry:
            out[c] = g[c].to_numpy()
        return out

    return (
        ds.map_batches(add_shard, batch_format="pandas")
        .groupby("shard")
        .map_groups(rank_shard, batch_format="pandas")
    )
