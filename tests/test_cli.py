"""CLI smoke tests for the training-data subcommands (dedup, knn) — the
job-submit surface over the textops operators; each writes real parquet."""
import json

import numpy as np
import pyarrow.parquet as pq
import pytest

from kkray.cli import main

SF = "/root/testdata/sf0.001"


def test_cli_dedup_exact_and_ngram(ray_session, tmp_path, capsys):
    out1 = str(tmp_path / "exact")
    assert main(["dedup", "--docs", f"{SF}/documents.parquet", "--out", out1, "--mode", "exact"]) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["cmd"] == "dedup" and line["rows"] > 0
    t = pq.read_table(out1)
    assert t.schema.names == ["doc_id", "dup_count"]
    assert t.num_rows == line["rows"]

    out2 = str(tmp_path / "ngram")
    assert main(
        ["dedup", "--docs", f"{SF}/documents.parquet", "--out", out2, "--mode", "ngram", "--threshold", "0.5"]
    ) == 0
    t2 = pq.read_table(out2)
    assert t2.schema.names == ["a", "b", "jaccard"]
    if t2.num_rows:
        a = t2.column("a").to_numpy()
        b = t2.column("b").to_numpy()
        assert (a < b).all()
        assert (t2.column("jaccard").to_numpy() >= 0.5).all()


def test_cli_knn_brute(ray_session, tmp_path, capsys):
    out = str(tmp_path / "knn")
    assert main(
        [
            "knn",
            "--embeddings", f"{SF}/embeddings.parquet",
            "--queries-file", f"{SF}/embeddings.parquet",
            "--out", out, "--k", "2",
        ]
    ) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    t = pq.read_table(out)
    assert t.num_rows == line["rows"] > 0
    assert set(t.schema.names) == {"query_id", "rank", "vec_id", "cosine"}
    # rank-0 neighbour of each self-query is itself (cosine 1)
    df = t.to_pandas()
    r0 = df[df["rank"] == 0].sort_values("query_id")
    assert np.allclose(r0["cosine"].to_numpy(), 1.0, atol=1e-9)


def test_cli_decontaminate(ray_session, tmp_path, capsys):
    # self-decontamination: every train doc with >=1 shingle overlaps itself
    out = str(tmp_path / "decon")
    assert main(
        [
            "decontaminate",
            "--train", f"{SF}/documents.parquet",
            "--bench", f"{SF}/documents.parquet",
            "--out", out,
        ]
    ) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    t = pq.read_table(out)
    assert t.num_rows == line["rows"] > 0
    assert set(t.schema.names) == {"doc_id", "n_shared"}
    assert (t.column("n_shared").to_numpy() >= 1).all()


def test_cli_prep(ray_session, tmp_path, capsys):
    out = str(tmp_path / "prep")
    assert main(
        [
            "prep",
            "--docs", f"{SF}/documents.parquet",
            "--out", out, "--chunk-size", "64", "--shards", "4",
        ]
    ) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["cmd"] == "prep" and line["chunks"] > 0
    import pyarrow.dataset as pads

    df = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    assert len(df) == line["chunks"]
    assert {"doc_id", "chunk_id", "n_tokens", "chunk_text", "shard", "pos"} <= set(df.columns)
    assert (df["n_tokens"] <= 64).all() and (df["n_tokens"] > 0).all()
    for _, g in df.groupby("shard"):
        assert sorted(g["pos"].tolist()) == list(range(len(g)))


def test_cli_prep_tiny_corpus(ray_session, tmp_path, capsys):
    # regression: a 2-doc corpus used to crash Ray 2.49 Dataset.join in
    # acero finalize when a hash partition received zero rows; the layout
    # now rides shard_assignment's single shuffle (carry_cols), no join
    import pandas as pd
    import ray

    docs = str(tmp_path / "tiny.parquet")
    pd.DataFrame(
        {"doc_id": [7, 11], "text": ["alpha beta gamma", "delta epsilon"]}
    ).to_parquet(docs)
    out = str(tmp_path / "prep_tiny")
    assert main(["prep", "--docs", docs, "--out", out, "--chunk-size", "2", "--shards", "3"]) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["chunks"] == 3  # ceil(3/2) + ceil(2/2)
    import pyarrow.dataset as pads

    df = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    assert len(df) == 3
    got = df.sort_values(["doc_id", "chunk_id"])["chunk_text"].tolist()
    assert got == ["alpha beta", "gamma", "delta epsilon"]


def test_cli_prep_uid_bounds(ray_session, tmp_path):
    import pandas as pd

    docs = str(tmp_path / "big_id.parquet")
    pd.DataFrame({"doc_id": [1 << 43], "text": ["a b"]}).to_parquet(docs)
    with pytest.raises(Exception, match="2\\^43"):
        main(["prep", "--docs", docs, "--out", str(tmp_path / "x"), "--chunk-size", "2", "--shards", "2"])
