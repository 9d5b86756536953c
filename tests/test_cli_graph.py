"""CLI smoke tests for the graph job-submit surface: the full
ingest -> analytics -> walk -> hostgraph chain through `python -m
kkray.cli` argument parsing, with real parquet outputs inspected.
(dedup/knn subcommands are covered in test_cli.py.)"""
import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from kkray.cli import main


def _out_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_ingest_analytics_walk_hostgraph(ray_session, tmp_path, capsys):
    from kkray.io.synth import synth_pages

    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(synth_pages(300, seed=11)[0], pages_path)
    out = str(tmp_path / "out")

    assert main(["ingest", "--pages", pages_path, "--out", out]) in (0, None)
    r = _out_json(capsys)
    assert r["cmd"] == "ingest" and r["edges"] > 0

    edges = f"{out}/edges"
    pr_out = str(tmp_path / "pr")
    assert main(["pagerank", "--edges", edges, "--out", pr_out, "--num-parts", "4", "--iters", "20"]) in (0, None)
    r = _out_json(capsys)
    pr = ray.data.read_parquet(pr_out).to_pandas()
    assert len(pr) == r["vertices"] and abs(pr["pagerank"].sum() - 1.0) < 1e-6

    cc_out = str(tmp_path / "cc")
    assert main(["cc", "--edges", edges, "--out", cc_out, "--num-parts", "3"]) in (0, None)
    ccdf = ray.data.read_parquet(cc_out).to_pandas()
    assert len(ccdf) == len(pr) and (ccdf["label"] <= ccdf["vid"]).all()

    wk_out = str(tmp_path / "wk")
    assert main(
        ["walk", "--edges", edges, "--out", wk_out, "--num-parts", "3",
         "--kind", "node2vec", "--walkers", "200", "--length", "5", "--p", "2.0", "--q", "0.5"]
    ) in (0, None)
    wdf = ray.data.read_parquet(wk_out).to_pandas()
    assert wdf["walker_id"].nunique() == 200

    hg_out = str(tmp_path / "hg")
    assert main(["hostgraph", "--edges", edges, "--url-map", f"{out}/url_map", "--out", hg_out]) in (0, None)
    r = _out_json(capsys)
    hm = ray.data.read_parquet(f"{hg_out}/host_map").to_pandas()
    assert len(hm) == r["hosts"] > 0


def test_cli_sssp_weighted_and_kcore(ray_session, tmp_path, capsys):
    rng = np.random.Generator(np.random.Philox(3))
    src = rng.integers(0, 50, 400)
    dst = rng.integers(0, 50, 400)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = (rng.random(len(src)) * 4 + 0.5).round(3)
    epath = str(tmp_path / "wedges.parquet")
    pq.write_table(
        pa.table({"src": src.astype(np.uint64), "dst": dst.astype(np.uint64), "weight": w}), epath
    )

    ss_out = str(tmp_path / "sssp")
    assert main(["sssp", "--edges", epath, "--out", ss_out, "--num-parts", "3", "--weighted", "--source", "0"]) in (0, None)
    r = _out_json(capsys)
    sdf = ray.data.read_parquet(ss_out).to_pandas()
    assert r["reached"] > 0 and np.isfinite(sdf["cost"]).sum() == r["reached"]

    kc_out = str(tmp_path / "kcore")
    assert main(["kcore", "--edges", epath, "--out", kc_out, "--num-parts", "3", "--k", "2"]) in (0, None)
    r = _out_json(capsys)
    kdf = ray.data.read_parquet(kc_out).to_pandas()
    assert int(kdf["in_kcore"].sum()) == r["core_size"]
