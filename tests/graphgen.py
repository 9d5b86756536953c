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
