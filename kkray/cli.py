"""Job entrypoint for ``ray job submit`` (north_rule requirement).

Examples:
    ray job submit -- python -m kkray.cli ingest --pages pages.parquet --out /tmp/out
    ray job submit -- python -m kkray.cli pagerank --edges /tmp/out/edges --out /tmp/pr \
        --num-parts 16 --iters 50 --checkpoint /tmp/ckpt --resume
    python -m kkray.cli pagerank --edges e.parquet --out /tmp/ppr --seeds 0,1,2   # personalized
    python -m kkray.cli walk --edges e.parquet --kind node2vec --walkers 100000 --p 2 --q 0.5
    python -m kkray.cli sssp --edges we.parquet --weighted --source 0 --out /tmp/sssp
    python -m kkray.cli hostgraph --edges /tmp/out/edges --url-map /tmp/out/url_map --out /tmp/hg

Owns its Ray session (guarded init — a no-op inside a cluster job where
Ray is already initialised).
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def _load_graph(args, undirected=False):
    import ray.data

    from .graph import Graph

    edges = ray.data.read_parquet(args.edges)
    if undirected:
        from .io.edges import undirect

        edges = undirect(edges, drop_self_loops=True)
    return Graph.from_dataset(edges, num_parts=args.num_parts, weighted=args.weighted)


def main(argv=None):
    p = argparse.ArgumentParser(prog="kkray")
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="pages parquet -> text + edge table parquet")
    ing.add_argument("--pages", required=True)
    ing.add_argument("--out", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--edges", required=True)
    common.add_argument("--out", required=True)
    common.add_argument("--num-parts", type=int, default=8)
    common.add_argument("--weighted", action="store_true")
    common.add_argument("--checkpoint")
    common.add_argument("--resume", action="store_true")

    pr = sub.add_parser("pagerank", parents=[common])
    pr.add_argument("--iters", type=int, default=50)
    pr.add_argument("--damping", type=float, default=0.85)
    pr.add_argument("--tol", type=float, default=1e-9)
    pr.add_argument("--seeds", help="comma-separated vertex ids for personalized teleport")

    sub.add_parser("cc", parents=[common])
    lp = sub.add_parser("lp", parents=[common])
    lp.add_argument("--iters", type=int, default=5)
    sub.add_parser("triangles", parents=[common])
    sub.add_parser("clustering", parents=[common], help="per-vertex triangles + local clustering + assortativity")

    ht = sub.add_parser("hits", parents=[common])
    ht.add_argument("--iters", type=int, default=20)
    bf = sub.add_parser("bfs", parents=[common])
    bf.add_argument("--source", type=int, default=0)
    ss = sub.add_parser("sssp", parents=[common])
    ss.add_argument("--source", type=int, default=0)
    kc = sub.add_parser("kcore", parents=[common])
    kc.add_argument("--k", type=int, required=True)

    hg = sub.add_parser("hostgraph", help="page edges + url map -> host edge table")
    hg.add_argument("--edges", required=True)
    hg.add_argument("--url-map", required=True)
    hg.add_argument("--out", required=True)

    dd = sub.add_parser("dedup", help="documents parquet -> dedup parquet (pairs or keep-set)")
    dd.add_argument("--docs", required=True, help="parquet with (doc_id, text)")
    dd.add_argument("--out", required=True)
    dd.add_argument("--mode", choices=["exact", "minhash", "ngram", "simhash"], default="exact")
    dd.add_argument("--threshold", type=float, default=0.5, help="jaccard threshold (minhash/ngram)")
    dd.add_argument("--shingle-n", type=int, default=3)
    dd.add_argument("--max-hamming", type=int, default=3, help="simhash hamming cutoff")

    dc = sub.add_parser("decontaminate", help="train + benchmark parquet -> shared-shingle overlap parquet")
    dc.add_argument("--train", required=True, help="training docs parquet with (doc_id, text)")
    dc.add_argument("--bench", required=True, help="benchmark/eval docs parquet with (doc_id, text)")
    dc.add_argument("--out", required=True)
    dc.add_argument("--shingle-n", type=int, default=5)
    dc.add_argument("--string-keys", action="store_true",
                    help="join on literal shingle strings instead of 63-bit hashes")

    kn = sub.add_parser("knn", help="embeddings parquet -> top-k cosine neighbours parquet")
    kn.add_argument("--embeddings", required=True, help="parquet with (vec_id, embedding)")
    kn.add_argument("--queries-file", required=True, help="parquet of query rows (same schema); all rows are queries")
    kn.add_argument("--out", required=True)
    kn.add_argument("--k", type=int, default=10)
    kn.add_argument("--mode", choices=["brute", "ivf"], default="brute")
    kn.add_argument("--nlist", type=int, default=64)
    kn.add_argument("--nprobe", type=int, default=8)

    pp = sub.add_parser("prep", help="documents parquet -> redacted, chunked, shard-assigned corpus parquet")
    pp.add_argument("--docs", required=True, help="parquet with (doc_id, text)")
    pp.add_argument("--out", required=True, help="output dir (partitioned by shard)")
    pp.add_argument("--chunk-size", type=int, default=512, help="tokens per training chunk")
    pp.add_argument("--shards", type=int, default=64, help="output shard count")
    pp.add_argument("--no-redact", action="store_true", help="skip the PII redaction pass")

    wk = sub.add_parser("walk", parents=[common])
    wk.add_argument("--kind", choices=["deepwalk", "ppr", "node2vec", "mh"], default="deepwalk")
    wk.add_argument("--walkers", type=int, required=True)
    wk.add_argument("--length", type=int, default=80)
    wk.add_argument("--terminate-prob", type=float, default=1 / 80)
    wk.add_argument("--p", type=float, default=1.0)
    wk.add_argument("--q", type=float, default=1.0)
    wk.add_argument("--seed", type=int, default=42)

    args = p.parse_args(argv)
    _ensure_ray()
    import numpy as np
    import pyarrow as pa
    import ray.data

    t0 = time.perf_counter()
    if args.cmd == "dedup":
        from .ops import collect_arrow
        from .textops.dedup import exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs

        docs = ray.data.read_parquet(args.docs, columns=["doc_id", "text"])
        if args.mode == "exact":
            out = exact_dedup(docs)
        elif args.mode == "minhash":
            out = minhash_lsh_pairs(docs, shingle_n=args.shingle_n, threshold=args.threshold)
        elif args.mode == "ngram":
            out = ngram_jaccard_pairs(docs, shingle_n=args.shingle_n, threshold=args.threshold)
        else:
            out = simhash_pairs(docs, max_hamming=args.max_hamming)
        n = out.count()
        if n:
            out.write_parquet(args.out)
        else:  # zero-row blocks would lose the schema through write_parquet
            ray.data.from_arrow(collect_arrow(out)).write_parquet(args.out)
        print(json.dumps({"cmd": "dedup", "mode": args.mode, "rows": n, "sec": round(time.perf_counter() - t0, 2)}))
        return 0

    if args.cmd == "decontaminate":
        from .ops import collect_arrow
        from .textops.dedup import decontaminate

        train = ray.data.read_parquet(args.train, columns=["doc_id", "text"])
        bench = ray.data.read_parquet(args.bench, columns=["doc_id", "text"])
        out = decontaminate(train, bench, shingle_n=args.shingle_n, hashed=not args.string_keys)
        n = out.count()
        if n:
            out.write_parquet(args.out)
        else:  # zero-row blocks would lose the schema through write_parquet
            ray.data.from_arrow(collect_arrow(out)).write_parquet(args.out)
        print(json.dumps({"cmd": "decontaminate", "rows": n, "sec": round(time.perf_counter() - t0, 2)}))
        return 0

    if args.cmd == "prep":
        from .ops import shard_assignment
        from .textops import RedactPII, chunk_documents

        docs = ray.data.read_parquet(args.docs, columns=["doc_id", "text"])
        if not args.no_redact:
            docs = docs.map_batches(RedactPII, batch_format="pandas", concurrency=(1, 8)).map_batches(
                lambda df: df.rename(columns={"text_redacted": "text"})[["doc_id", "text"]],
                batch_format="pandas",
            )
        chunks = chunk_documents(docs, chunk_size=args.chunk_size)

        def _uid(df):
            doc = df["doc_id"].to_numpy()
            cid = df["chunk_id"].to_numpy()
            if len(doc):
                # packing bounds: uid = doc_id << 20 | chunk_id must stay a
                # collision-free non-negative int64
                if int(cid.max()) >= (1 << 20):
                    raise ValueError(
                        f"prep: chunk_id {int(cid.max())} >= 2^20 — a document has too many "
                        f"chunks for the packed chunk_uid; raise --chunk-size"
                    )
                if int(doc.max()) >= (1 << 43):
                    raise ValueError(
                        f"prep: doc_id {int(doc.max())} >= 2^43 overflows the packed int64 "
                        f"chunk_uid; re-key doc ids below 2^43"
                    )
            df = df.copy()
            df["chunk_uid"] = doc * (1 << 20) + cid
            return df

        chunks = chunks.map_batches(_uid, batch_format="pandas")
        # the (shard, pos) layout carries the chunk payload through its one
        # shard-keyed shuffle — no Dataset.join (Ray 2.49 join crashes when a
        # hash partition receives zero rows, e.g. tiny or empty corpora)
        out = shard_assignment(
            chunks, "chunk_uid", args.shards,
            carry_cols=["doc_id", "chunk_id", "n_tokens", "chunk_text"],
        )
        n = out.count()
        out.write_parquet(args.out, partition_cols=["shard"])
        print(json.dumps({"cmd": "prep", "chunks": n, "shards": args.shards, "sec": round(time.perf_counter() - t0, 2)}))
        return 0

    if args.cmd == "knn":
        from .textops.ann import knn_brute, knn_ivf

        emb = ray.data.read_parquet(args.embeddings, columns=["vec_id", "embedding"])
        qdf = ray.data.read_parquet(args.queries_file, columns=["embedding"]).to_pandas()
        queries = np.stack(qdf["embedding"].to_numpy())
        if args.mode == "brute":
            res = knn_brute(emb, queries, k=args.k)
        else:
            res = knn_ivf(emb, queries, k=args.k, nlist=args.nlist, nprobe=args.nprobe)
        ray.data.from_pandas(res).write_parquet(args.out)
        print(json.dumps({"cmd": "knn", "mode": args.mode, "rows": len(res), "sec": round(time.perf_counter() - t0, 2)}))
        return 0

    if args.cmd == "ingest":
        from .io.edges import build_edge_table
        from .io.extract import ExtractText

        pages = ray.data.read_parquet(args.pages)
        # adaptive pool: a FIXED concurrency=4 can starve a small cluster
        # (4 actors pin every CPU and the downstream write never schedules)
        pages.map_batches(ExtractText, batch_format="pyarrow", concurrency=(1, 4)).write_parquet(f"{args.out}/text")
        edges, url_map = build_edge_table(ray.data.read_parquet(args.pages))
        edges.write_parquet(f"{args.out}/edges")
        url_map.write_parquet(f"{args.out}/url_map")
        print(json.dumps({"cmd": "ingest", "edges": edges.count(), "sec": round(time.perf_counter() - t0, 2)}))
        return 0

    from .ckpt import CheckpointManager

    ck = CheckpointManager(args.checkpoint, args.cmd) if getattr(args, "checkpoint", None) else None

    if args.cmd == "pagerank":
        from .analytics import pagerank

        seeds = np.array([int(x) for x in args.seeds.split(",")], dtype=np.int64) if args.seeds else None
        with _load_graph(args) as g:
            # --weighted loads edge weights AND switches rank flow to w/Σw_out
            scores = pagerank(
                g,
                damping=args.damping,
                max_iters=args.iters,
                tol=args.tol,
                checkpoint=ck,
                resume=args.resume,
                weighted=args.weighted,
                seeds=seeds,
            )
            v = np.arange(g.v_num, dtype=np.int64)
        ray.data.from_arrow(pa.table({"vid": v, "pagerank": scores})).write_parquet(args.out)
        print(json.dumps({"cmd": "pagerank", "vertices": len(v), "sec": round(time.perf_counter() - t0, 2)}))
    elif args.cmd == "hits":
        from .analytics import hits

        with _load_graph(args) as g:
            auth, hub = hits(g, iters=args.iters, checkpoint=ck, resume=args.resume)
            v = np.arange(g.v_num, dtype=np.int64)
        ray.data.from_arrow(pa.table({"vid": v, "auth": auth, "hub": hub})).write_parquet(args.out)
        print(json.dumps({"cmd": "hits", "vertices": len(v), "sec": round(time.perf_counter() - t0, 2)}))
    elif args.cmd == "bfs":
        from .analytics import bfs_distances

        with _load_graph(args) as g:
            dist = bfs_distances(g, args.source, checkpoint=ck, resume=args.resume)
            v = np.arange(g.v_num, dtype=np.int64)
        ray.data.from_arrow(pa.table({"vid": v, "dist": dist})).write_parquet(args.out)
        print(json.dumps({"cmd": "bfs", "reached": int((dist >= 0).sum()), "sec": round(time.perf_counter() - t0, 2)}))
    elif args.cmd == "sssp":
        from .analytics import sssp

        with _load_graph(args) as g:
            cost = sssp(g, args.source, checkpoint=ck, resume=args.resume)
            v = np.arange(g.v_num, dtype=np.int64)
        ray.data.from_arrow(pa.table({"vid": v, "cost": cost})).write_parquet(args.out)
        print(json.dumps({"cmd": "sssp", "reached": int(np.isfinite(cost).sum()), "sec": round(time.perf_counter() - t0, 2)}))
    elif args.cmd == "kcore":
        from .analytics import kcore

        with _load_graph(args, undirected=True) as g:
            member = kcore(g, k=args.k, checkpoint=ck, resume=args.resume)
            v = np.arange(g.v_num, dtype=np.int64)
        ray.data.from_arrow(pa.table({"vid": v, "in_kcore": member})).write_parquet(args.out)
        print(json.dumps({"cmd": "kcore", "k": args.k, "core_size": int(member.sum()), "sec": round(time.perf_counter() - t0, 2)}))
    elif args.cmd == "hostgraph":
        from .io.hostgraph import host_edges

        he, hm = host_edges(ray.data.read_parquet(args.edges), ray.data.read_parquet(args.url_map))
        he.write_parquet(f"{args.out}/host_edges")
        hm.write_parquet(f"{args.out}/host_map")
        print(json.dumps({"cmd": "hostgraph", "hosts": hm.count(), "sec": round(time.perf_counter() - t0, 2)}))
    elif args.cmd in ("cc", "lp"):
        from .analytics import connected_components, label_propagation

        with _load_graph(args, undirected=True) as g:
            if args.cmd == "cc":
                labels = connected_components(g, checkpoint=ck, resume=args.resume)
            else:
                labels = label_propagation(g, iters=args.iters, checkpoint=ck, resume=args.resume)
            v = np.arange(g.v_num, dtype=np.int64)
        ray.data.from_arrow(pa.table({"vid": v, "label": labels})).write_parquet(args.out)
        print(json.dumps({"cmd": args.cmd, "vertices": len(v), "sec": round(time.perf_counter() - t0, 2)}))
    elif args.cmd == "triangles":
        from .analytics import triangle_count

        with _load_graph(args, undirected=True) as g:
            n = triangle_count(g)
        print(json.dumps({"cmd": "triangles", "triangles": n, "sec": round(time.perf_counter() - t0, 2)}))
    elif args.cmd == "clustering":
        from .analytics import degree_assortativity, local_clustering

        with _load_graph(args, undirected=True) as g:
            tri, cc = local_clustering(g)
            r = degree_assortativity(g)
            v = np.arange(g.v_num, dtype=np.int64)
        ray.data.from_arrow(pa.table({"vid": v, "n_tri": tri, "clustering": cc})).write_parquet(args.out)
        print(
            json.dumps(
                {
                    "cmd": "clustering",
                    "vertices": len(v),
                    "avg_clustering": round(float(cc.mean()) if len(cc) else 0.0, 6),
                    "assortativity": None if np.isnan(r) else round(r, 6),
                    "sec": round(time.perf_counter() - t0, 2),
                }
            )
        )
    elif args.cmd == "walk":
        from .walk import deepwalk, mh_walk, node2vec, ppr_walk

        with _load_graph(args) as g:
            if args.kind == "deepwalk":
                paths = deepwalk(g, args.walkers, length=args.length, weighted=args.weighted, seed=args.seed)
            elif args.kind == "ppr":
                paths = ppr_walk(g, args.walkers, terminate_prob=args.terminate_prob, weighted=args.weighted, seed=args.seed)
            elif args.kind == "mh":
                paths = mh_walk(g, args.walkers, length=args.length, seed=args.seed)
            else:
                paths = node2vec(g, args.walkers, p=args.p, q=args.q, length=args.length, weighted=args.weighted, seed=args.seed)
            paths.write_parquet(args.out)
        print(json.dumps({"cmd": "walk", "kind": args.kind, "walkers": args.walkers, "sec": round(time.perf_counter() - t0, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
