"""Approximate-nearest-neighbour search over an embedding column.

* ``knn_brute`` — the exact baseline: per-batch float64 matmul against a
  broadcast query matrix, per-batch top-k (the combiner), then a single
  small global merge per query. O(rows x queries) compute, O(batches x k)
  shuffle.
* ``knn_lsh`` — the scale path: random-hyperplane buckets; each query
  probes its own bucket plus the `probes` nearest codes by Hamming
  distance. Recall < 1 by construction; exactness is traded for bucket-
  local work.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _norm_rows(v: np.ndarray) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)


def knn_brute(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact top-k cosine neighbours for each query row. Returns a small
    DataFrame (query_id, rank, vec_id, cosine), rank 0..k-1, deterministic
    tie-break by vec_id."""
    q = _norm_rows(np.asarray(queries, dtype=np.float64))
    qref = ray.put(q)

    class PartialTopK:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            v = _norm_rows(np.stack(df[vec_col].to_numpy()).astype(np.float64))
            ids = df[id_col].to_numpy()
            sims = self.q @ v.T  # (Q, B)
            kk = min(k, sims.shape[1])
            out = []
            for qi in range(sims.shape[0]):
                s = sims[qi]
                idx = np.argpartition(-s, kk - 1)[:kk]
                out.append(pd.DataFrame({"query_id": qi, "vec_id": ids[idx], "cosine": s[idx]}))
            return pd.concat(out, ignore_index=True)

    partial = emb.map_batches(PartialTopK, batch_format="pandas", concurrency=(1, 8))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
        g["rank"] = np.arange(len(g))
        return g

    return (
        partial.groupby("query_id")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def knn_lsh(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 6,
    probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> pd.DataFrame:
    """LSH-bucketed ANN: vectors hashed once into sign-pattern buckets;
    each query searches the `probes` bucket codes nearest in Hamming
    distance to its own. Same output schema as knn_brute."""
    q = _norm_rows(np.asarray(queries, dtype=np.float64))
    dim = q.shape[1]
    rng = np.random.Generator(np.random.Philox(seed))
    planes = rng.standard_normal((dim, n_planes))
    codes_all = np.arange(1 << n_planes)

    def code_of(v: np.ndarray) -> np.ndarray:
        return ((v @ planes) > 0) @ (1 << np.arange(n_planes))

    qcodes = code_of(q)
    # per query: allowed bucket codes (own + nearest by hamming)
    allowed = {}
    for qi, qc in enumerate(qcodes):
        ham = np.array([bin(int(qc ^ c)).count("1") for c in codes_all])
        allowed[qi] = set(codes_all[np.argsort(ham, kind="stable")[:probes]].tolist())
    qref = ray.put((q, allowed))
    pref = ray.put(planes)

    class BucketTopK:
        def __init__(self):
            self.q, self.allowed = ray.get(qref)
            self.planes = ray.get(pref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            v = _norm_rows(np.stack(df[vec_col].to_numpy()).astype(np.float64))
            ids = df[id_col].to_numpy()
            codes = ((v @ self.planes) > 0) @ (1 << np.arange(self.planes.shape[1]))
            out = []
            for qi in range(len(self.q)):
                mask = np.isin(codes, list(self.allowed[qi]))
                if not mask.any():
                    continue
                s = self.q[qi] @ v[mask].T
                kk = min(k, len(s))
                idx = np.argpartition(-s, kk - 1)[:kk]
                out.append(pd.DataFrame({"query_id": qi, "vec_id": ids[mask][idx], "cosine": s[idx]}))
            if not out:
                return pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []})
            return pd.concat(out, ignore_index=True)

    partial = emb.map_batches(BucketTopK, batch_format="pandas", concurrency=(1, 8))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
        g["rank"] = np.arange(len(g))
        return g

    return (
        partial.groupby("query_id")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
