"""Random test-graph generators + pure-python oracles.

Mirrors the reference's randomized generator + oracle technique
(reference src/tests/test.hpp:49-160: random deduped edge sets, compare
engine output against an independently-computed expectation)."""
import numpy as np


def random_edges(v, e, seed, undirected=False, self_loops=False):
    rng = np.random.Generator(np.random.Philox(seed))
    src = rng.integers(0, v, e * 2)
    dst = rng.integers(0, v, e * 2)
    if not self_loops:
        keep = src != dst
        src, dst = src[keep], dst[keep]
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)[:e]
    src, dst = pairs[:, 0], pairs[:, 1]
    if undirected:
        s = np.concatenate([src, dst])
        d = np.concatenate([dst, src])
        pairs = np.unique(np.stack([s, d], axis=1), axis=0)
        src, dst = pairs[:, 0], pairs[:, 1]
    return src.astype(np.int64), dst.astype(np.int64)


def pagerank_oracle(src, dst, v, damping=0.85, iters=200, tol=1e-14):
    outdeg = np.bincount(src, minlength=v)
    r = np.full(v, 1.0 / v)
    for _ in range(iters):
        contrib = np.where(outdeg > 0, r / np.maximum(outdeg, 1), 0.0)
        acc = np.zeros(v)
        np.add.at(acc, dst, contrib[src])
        dangling = r[outdeg == 0].sum()
        new = (1 - damping) / v + damping * (acc + dangling / v)
        if np.abs(new - r).sum() < tol:
            r = new
            break
        r = new
    return r


def cc_oracle(src, dst, v):
    """Union-find weak components; label = min member id."""
    parent = list(range(v))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(v)], dtype=np.int64)


def lp_oracle(src, dst, v, iters):
    """Synchronous LP, most-frequent in-neighbour label, tie -> smallest."""
    label = np.arange(v, dtype=np.int64)
    in_nbrs = [[] for _ in range(v)]
    for a, b in zip(src.tolist(), dst.tolist()):
        in_nbrs[b].append(a)
    for _ in range(iters):
        new = label.copy()
        for u in range(v):
            if not in_nbrs[u]:
                continue
            counts = {}
            for n in in_nbrs[u]:
                l = int(label[n])
                counts[l] = counts.get(l, 0) + 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[u] = best
        label = new
    return label


def triangle_oracle(src, dst, v):
    """Brute force over the undirected simple graph."""
    nbrs = [set() for _ in range(v)]
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    count = 0
    for u in range(v):
        for w in nbrs[u]:
            if w > u:
                count += len([x for x in nbrs[u] & nbrs[w] if x > w])
    return count


def local_tri_oracle(src, dst, v):
    """Brute-force per-vertex triangle participation counts."""
    import numpy as np

    nbrs = [set() for _ in range(v)]
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    t = np.zeros(v, dtype=np.int64)
    for u in range(v):
        for w in nbrs[u]:
            if w > u:
                for x in nbrs[u] & nbrs[w]:
                    if x > w:
                        t[u] += 1
                        t[w] += 1
                        t[x] += 1
    return t


def hits_oracle(src, dst, v, iters):
    """Dense HITS power iteration (L2-normalized each half-step)."""
    hub = np.ones(v, dtype=np.float64)
    auth = np.zeros(v, dtype=np.float64)
    for _ in range(iters):
        auth = np.zeros(v, dtype=np.float64)
        np.add.at(auth, dst, hub[src])
        n = np.linalg.norm(auth)
        if n > 0:
            auth /= n
        hub = np.zeros(v, dtype=np.float64)
        np.add.at(hub, src, auth[dst])
        n = np.linalg.norm(hub)
        if n > 0:
            hub /= n
    return auth, hub


def bfs_oracle(src, dst, v, source):
    """Level-synchronous BFS along directed edges; unreachable -> -1."""
    INF = np.iinfo(np.int64).max
    dist = np.full(v, INF, dtype=np.int64)
    dist[source] = 0
    order = np.argsort(src, kind="stable")
    s_sorted, d_sorted = src[order], dst[order]
    ptr = np.searchsorted(s_sorted, np.arange(v + 1))
    frontier = np.array([source], dtype=np.int64)
    d = 0
    while len(frontier):
        chunks = [d_sorted[ptr[u] : ptr[u + 1]] for u in frontier]
        nbrs = np.unique(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
        new = nbrs[dist[nbrs] > d + 1] if len(nbrs) else nbrs
        dist[new] = d + 1
        frontier = new
        d += 1
    dist[dist == INF] = -1
    return dist


def kcore_oracle(src, dst, v, k):
    """Synchronous peel on the undirected expansion (src/dst symmetric)."""
    deg = np.bincount(src, minlength=v).astype(np.int64)
    alive = np.ones(v, dtype=bool)
    while True:
        rm = alive & (deg < k)
        if not rm.any():
            break
        alive[rm] = False
        m = rm[src]
        if m.any():
            deg -= np.bincount(dst[m], minlength=v)
    return alive.astype(np.int64)


def pagerank_w_oracle(src, dst, w, v, damping=0.85, iters=10):
    """Weighted PageRank: rank flows proportional to w / Σ w_out."""
    wout = np.zeros(v)
    np.add.at(wout, src, w)
    r = np.full(v, 1.0 / v)
    for _ in range(iters):
        contrib = np.where(wout > 0, r / np.maximum(wout, 1e-300), 0.0)
        acc = np.zeros(v)
        np.add.at(acc, dst, contrib[src] * w)
        dangling = r[wout <= 0].sum()
        r = (1 - damping) / v + damping * (acc + dangling / v)
    return r


def sssp_oracle(src, dst, w, v, source):
    """Synchronous Bellman-Ford to fixpoint; unreachable -> inf."""
    dist = np.full(v, np.inf)
    dist[source] = 0.0
    for _ in range(v):
        nd = dist.copy()
        np.minimum.at(nd, dst, dist[src] + w)
        if np.array_equal(nd, dist, equal_nan=True):
            break
        dist = nd
    return dist


def pagerank_p_oracle(src, dst, v, seeds, damping=0.85, iters=10):
    """Personalized PageRank: teleport + dangling mass on the seed set."""
    reset = np.zeros(v)
    reset[np.asarray(seeds, dtype=np.int64)] = 1.0 / len(seeds)
    outdeg = np.bincount(src, minlength=v)
    r = np.full(v, 1.0 / v)
    for _ in range(iters):
        contrib = np.where(outdeg > 0, r / np.maximum(outdeg, 1), 0.0)
        acc = np.zeros(v)
        np.add.at(acc, dst, contrib[src])
        dangling = r[outdeg == 0].sum()
        r = (1 - damping) * reset + damping * (acc + dangling * reset)
    return r
