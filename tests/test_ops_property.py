"""Property-based tests (hypothesis) for the grouped relational kernels.

Small value domains force the hostile cases — duplicate order values in
top-k, tied quantile values, groups split across many input blocks — and
every result is checked against an independent pandas/numpy reference.
"""
import numpy as np
import pandas as pd
import ray.data
from hypothesis import given, settings, strategies as st

from kkray.ops import grouped_quantile, grouped_top_k, stratified_sample

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),    # group
        st.integers(min_value=-5, max_value=5),   # value (heavy ties)
    ),
    min_size=1,
    max_size=60,
).map(lambda rs: [(g, v, i) for i, (g, v) in enumerate(rs)])  # unique id


def _ds(rows, nblocks, seed):
    df = pd.DataFrame(rows, columns=["grp", "val", "id"])
    df = df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    cuts = np.sort(np.random.default_rng(seed).integers(0, len(df) + 1, size=nblocks - 1))
    bounds = np.concatenate([[0], cuts, [len(df)]])
    frames = [df.iloc[a:b] for a, b in zip(bounds[:-1], bounds[1:])]
    return ray.data.from_pandas([f if len(f) else df.iloc[0:0] for f in frames]), df


@settings(max_examples=10, deadline=None)
@given(
    rows=rows_strategy,
    k=st.integers(min_value=1, max_value=6),
    nblocks=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_grouped_top_k_matches_pandas(ray_session, rows, k, nblocks, seed):
    ds, df = _ds(rows, nblocks, seed)
    got = (
        grouped_top_k(ds, ["grp"], ["val", "id"], k=k, descending=True, num_shards=3)
        .to_pandas()
        .sort_values(["grp", "val", "id"], ascending=[True, False, False])
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["val", "id"], ascending=False)
        .groupby("grp", sort=False)
        .head(k)
        .sort_values(["grp", "val", "id"], ascending=[True, False, False])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["grp", "val", "id"]], exp[["grp", "val", "id"]])


@settings(max_examples=10, deadline=None)
@given(
    rows=rows_strategy,
    nblocks=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_grouped_quantile_matches_quantile_disc(ray_session, rows, nblocks, seed):
    qs = [0.25, 0.5, 0.9, 1.0]
    ds, df = _ds(rows, nblocks, seed)
    got = (
        grouped_quantile(ds, ["grp"], "val", qs, num_buckets=3)
        .to_pandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    exp_rows = []
    for g, grp in df.groupby("grp"):
        vals = np.sort(grp["val"].to_numpy())
        row = {"grp": g}
        for q in qs:
            row[f"q{int(q * 100)}"] = vals[max(int(np.ceil(q * len(vals))), 1) - 1]
        exp_rows.append(row)
    exp = pd.DataFrame(exp_rows).sort_values("grp").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns].astype(exp.dtypes.to_dict()), exp)


@settings(max_examples=10, deadline=None)
@given(
    rows=rows_strategy,
    k=st.integers(min_value=1, max_value=5),
    nblocks=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_stratified_sample_matches_hash_reference(ray_session, rows, k, nblocks, seed):
    ds, df = _ds(rows, nblocks, seed)
    got = (
        stratified_sample(ds, ["grp"], "id", k=k, num_shards=3)
        .to_pandas()
        .sort_values(["grp", "id"])
        .reset_index(drop=True)
    )
    MUL, MOD = np.uint64(2654435761), np.uint64(4294967291)
    ref = df.copy()
    ref["_h"] = (((ref["id"].to_numpy().astype(np.uint64) % MOD) * MUL) % MOD).astype(np.int64)
    exp = (
        ref.sort_values(["_h", "id"])
        .groupby("grp", sort=False)
        .head(k)
        .drop(columns=["_h"])
        .sort_values(["grp", "id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["grp", "val", "id"]], exp[["grp", "val", "id"]])
    # determinism: a different block split / row order picks the same rows
    ds2, _ = _ds(rows, max(1, nblocks - 1), seed + 1)
    got2 = (
        stratified_sample(ds2, ["grp"], "id", k=k, num_shards=2)
        .to_pandas()
        .sort_values(["grp", "id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["grp", "val", "id"]], got2[["grp", "val", "id"]])
