"""Storage round-trips (the reference's test_storage.cpp technique) and
walk-rate epoching."""
import numpy as np
import pyarrow as pa
import ray.data

from kkray.io.storage import (
    dump_paths_text,
    gconvert,
    read_binary_edges,
    read_edgelist_text,
    read_metapath_schemes,
    write_binary_edges,
    write_edgelist_text,
    write_metapath_schemes,
)

from graphgen import random_edges


def test_binary_round_trip(ray_session, tmp_path):
    src, dst = random_edges(100, 500, seed=4)
    w = np.random.Generator(np.random.Philox(5)).random(len(src)).astype(np.float32)
    p = str(tmp_path / "edges.bin")
    write_binary_edges(p, src.astype(np.uint64), dst.astype(np.uint64), w)
    back = read_binary_edges(p, weighted=True, num_blocks=4).to_pandas()
    key = lambda s, d: sorted(zip(s, d))
    assert key(back["src"].astype(int), back["dst"].astype(int)) == key(src, dst)
    assert np.allclose(np.sort(back["weight"]), np.sort(w))


def test_text_round_trip_and_gconvert(ray_session, tmp_path):
    src, dst = random_edges(50, 200, seed=9)
    tbl = pa.table({"src": pa.array(src, pa.uint64()), "dst": pa.array(dst, pa.uint64())})
    tdir = str(tmp_path / "txt")
    write_edgelist_text(ray.data.from_arrow(tbl), tdir)
    back = read_edgelist_text(tdir).to_pandas()
    key = lambda s, d: sorted(zip(map(int, s), map(int, d)))
    assert key(back["src"], back["dst"]) == key(src, dst)
    # gconvert: text -> binary
    bp = str(tmp_path / "conv.bin")
    gconvert(tdir, bp)
    b2 = read_binary_edges(bp).to_pandas()
    assert key(b2["src"], b2["dst"]) == key(src, dst)


def test_schemes_round_trip(tmp_path):
    schemes = [[1, 2, 4], [6, 1]]
    p = str(tmp_path / "schemes.json")
    write_metapath_schemes(p, schemes)
    assert read_metapath_schemes(p) == schemes


def test_paths_text_dump(ray_session, tmp_path):
    from kkray.graph import Graph
    from kkray.walk import deepwalk

    src, dst = random_edges(30, 200, seed=11, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=2, v_num=30) as g:
        paths = deepwalk(g, walker_num=20, length=5, seed=1)
        d = str(tmp_path / "paths")
        dump_paths_text(paths, d, with_head_info=True)
    import glob

    lines = []
    for f in glob.glob(d + "/*"):
        lines.extend(open(f).read().splitlines())
    lines = [l for l in lines if l and not l.startswith('"')]
    # header line from write_csv: filter numeric lines
    lines = [l for l in lines if l.split()[0].isdigit()]
    assert len(lines) == 20
    for l in lines:
        toks = l.split()
        wid, length, verts = int(toks[0]), int(toks[1]), toks[2:]
        assert len(verts) == length + 1


def test_walk_rate_epochs(ray_session, tmp_path):
    from kkray.graph import Graph
    from kkray.walk import deepwalk

    src, dst = random_edges(40, 300, seed=21, undirected=True)
    with Graph.from_arrays(src, dst, num_parts=3, v_num=40) as g:
        out = deepwalk(g, walker_num=50, length=6, seed=2, walk_rate=0.25, output_dir=str(tmp_path / "w"))
        df = out.to_pandas()
    assert len(df) == 50
    import os

    epochs = sorted(os.listdir(str(tmp_path / "w")))
    assert epochs == ["epoch=%05d" % i for i in range(4)]
    # every complete epoch carries a _SUCCESS sentinel (write_parquet is
    # non-atomic; the sentinel is the commit marker)
    for e in epochs:
        assert os.path.exists(str(tmp_path / "w" / e / "_SUCCESS"))
    # simulate a crash mid-epoch: drop epoch 2's sentinel and one part file
    crash = tmp_path / "w" / "epoch=00002"
    os.remove(str(crash / "_SUCCESS"))
    os.remove(str(crash / sorted(f for f in os.listdir(str(crash)) if f.endswith(".parquet"))[0]))
    # rerun skips committed epochs, REWRITES the partial one, same rows out
    with Graph.from_arrays(src, dst, num_parts=3, v_num=40) as g2:
        out2 = deepwalk(g2, walker_num=50, length=6, seed=2, walk_rate=0.25, output_dir=str(tmp_path / "w"))
        df2 = out2.to_pandas()
    assert len(df2) == 50
    assert os.path.exists(str(crash / "_SUCCESS"))
    a = df.sort_values("walker_id").reset_index(drop=True)
    b = df2.sort_values("walker_id").reset_index(drop=True)
    assert (a["walker_id"] == b["walker_id"]).all()
    assert all(list(x) == list(y) for x, y in zip(a["path"], b["path"]))
