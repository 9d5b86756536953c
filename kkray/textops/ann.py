"""Approximate-nearest-neighbour search over an embedding column.

* ``knn_brute`` — the exact baseline: per-batch float64 matmul against a
  broadcast query matrix, per-batch top-k (the combiner), then a single
  small global merge per query. O(rows x queries) compute, O(batches x k)
  shuffle.
* ``knn_lsh`` — the scale path: random-hyperplane buckets; each query
  probes its own bucket plus the `probes` nearest codes by Hamming
  distance. Recall < 1 by construction; exactness is traded for bucket-
  local work.
* ``knn_ivf`` — the coarse-quantizer scale path (IVF): k-means centroids
  trained on a deterministic hash-sample of the corpus (small driver-side
  Lloyd loop, the standard IVF recipe), centroids broadcast once with
  ``ray.put``; every data batch assigns its vectors to the nearest
  centroid list and only the lists a query probes are scanned. With
  ``nprobe == nlist`` the scan degenerates to exact brute force (the
  oracle-comparable mode); ``nprobe < nlist`` is the recall<1 scale mode.
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


def _topk_merge(k: int):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
        g["rank"] = np.arange(len(g))
        return g

    return merge


def _hash_sample(
    emb: ray.data.Dataset, id_col: str, vec_col: str, sample_size: int
) -> np.ndarray:
    """Deterministic ~``sample_size``-row sample of the embedding column:
    Knuth-hash the id column and keep rows under a threshold derived from
    the dataset count. One count pass + one filtered collect of only the
    sampled rows — O(sample) driver memory at any corpus size."""
    n = emb.count()
    if n == 0:
        raise ValueError("knn_ivf: empty embedding dataset")
    frac = min(1.0, (1.5 * sample_size) / n)  # 1.5x slack: hash jitter
    thresh = np.uint32(int(frac * (2**32 - 1)))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        h = (df[id_col].to_numpy().astype(np.uint64) * np.uint64(2654435761)).astype(np.uint32)
        return df.loc[h <= thresh, [vec_col]]

    rows = emb.map_batches(pick, batch_format="pandas").take_all()
    v = np.stack([r[vec_col] for r in rows[:sample_size]]).astype(np.float64)
    return _norm_rows(v)


def _kmeans(sample: np.ndarray, nlist: int, iters: int, seed: int) -> np.ndarray:
    """Spherical k-means (Lloyd) over the driver-side sample; greedy
    farthest-first init for determinism. The sample and the centroid
    matrix are both tiny (<= sample_size x dim)."""
    rng = np.random.Generator(np.random.Philox(seed))
    n = len(sample)
    nlist = min(nlist, n)
    cent = np.empty((nlist, sample.shape[1]))
    cent[0] = sample[int(rng.integers(n))]
    sim = sample @ cent[0]
    for i in range(1, nlist):  # farthest-first (max-min cosine distance)
        cent[i] = sample[int(np.argmin(sim))]
        sim = np.maximum(sim, sample @ cent[i])
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(nlist):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
        cent = _norm_rows(cent)
    return cent


def train_ivf(
    emb: ray.data.Dataset,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_size: int = 4096,
    kmeans_iters: int = 10,
) -> np.ndarray:
    """Train the IVF coarse quantizer (spherical k-means over a
    deterministic hash-sample) and return the (nlist, dim) centroid
    matrix for reuse across ``knn_ivf`` calls."""
    return _kmeans(_hash_sample(emb, id_col, vec_col, sample_size), nlist, kmeans_iters, seed)


def knn_ivf(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_size: int = 4096,
    kmeans_iters: int = 10,
    centroids: np.ndarray | None = None,
) -> pd.DataFrame:
    """IVF ANN: coarse k-means quantizer trained on a hash-sample, then a
    single streaming pass where each batch scores only (query, vector)
    pairs whose vector falls in one of that query's ``nprobe`` nearest
    centroid lists. ``nprobe >= nlist`` reproduces knn_brute exactly.
    Same output schema as knn_brute. Pass ``centroids`` (from
    ``train_ivf``) to skip training — the production shape: train once,
    reuse across query batches."""
    q = _norm_rows(np.asarray(queries, dtype=np.float64))
    cent = (
        _norm_rows(np.asarray(centroids, dtype=np.float64))
        if centroids is not None
        else train_ivf(emb, nlist, id_col=id_col, vec_col=vec_col, seed=seed,
                       sample_size=sample_size, kmeans_iters=kmeans_iters)
    )
    nlist = len(cent)
    nprobe = min(nprobe, nlist)
    # per-query probed lists: nprobe nearest centroids by cosine
    order = np.argsort(-(q @ cent.T), axis=1, kind="stable")[:, :nprobe]  # (Q, nprobe)
    bref = ray.put((q, cent, order))

    class ListTopK:
        def __init__(self):
            self.q, self.cent, self.order = ray.get(bref)
            # bitmask per query over centroid lists (nlist <= 64 typical;
            # fall back to a bool matrix above that)
            self.probe = np.zeros((len(self.q), len(self.cent)), dtype=bool)
            rows = np.repeat(np.arange(len(self.q)), self.order.shape[1])
            self.probe[rows, self.order.ravel()] = True

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            v = _norm_rows(np.stack(df[vec_col].to_numpy()).astype(np.float64))
            ids = df[id_col].to_numpy()
            assign = np.argmax(v @ self.cent.T, axis=1)  # (B,)
            out = []
            for qi in range(len(self.q)):
                mask = self.probe[qi, assign]
                if not mask.any():
                    continue
                s = self.q[qi] @ v[mask].T
                kk = min(k, len(s))
                idx = np.argpartition(-s, kk - 1)[:kk]
                out.append(pd.DataFrame({"query_id": qi, "vec_id": ids[mask][idx], "cosine": s[idx]}))
            if not out:
                return pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []})
            return pd.concat(out, ignore_index=True)

    partial = emb.map_batches(ListTopK, batch_format="pandas", concurrency=(1, 8))
    return (
        partial.groupby("query_id")
        .map_groups(_topk_merge(k), batch_format="pandas")
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
