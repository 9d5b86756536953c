"""Property-based tests (hypothesis) for path assembly.

Both assembly routes — the routed-exchange ``assemble_footprint_refs``
(sharded-graph path) and the Dataset ``assemble_paths`` shuffle — must
reconstruct exactly the per-walker vertex sequence regardless of how the
footprint rows are permuted and split across input blocks, for any
walker-count / path-length mix including empty blocks and single-step
walkers.
"""
import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data
from hypothesis import given, settings, strategies as st

from kkray.walk.engine import assemble_footprint_refs, assemble_paths, paths_to_numpy


def _make_footprints(lengths: list[int], seed: int):
    """Build the footprint rows (walker_id, step, vertex) for walkers with
    the given path lengths (vertices = deterministic function of (wid, step)
    so the expectation is self-evident), then permute rows globally."""
    rng = np.random.default_rng(seed)
    wids, steps = [], []
    for wid, ln in enumerate(lengths):
        wids.append(np.full(ln, wid, dtype=np.int64))
        steps.append(np.arange(ln, dtype=np.int64))
    w = np.concatenate(wids) if wids else np.empty(0, dtype=np.int64)
    s = np.concatenate(steps) if steps else np.empty(0, dtype=np.int64)
    v = w * 1_000 + s * 7 + 3  # any injective-(wid,step) map works
    perm = rng.permutation(len(w))
    return w[perm], s[perm], v[perm]


def _expected(lengths: list[int]):
    return {
        wid: np.array([wid * 1_000 + s * 7 + 3 for s in range(ln)], dtype=np.int64)
        for wid, ln in enumerate(lengths)
    }


@settings(max_examples=12, deadline=None)
@given(
    lengths=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=60),
    num_refs=st.integers(min_value=1, max_value=7),
    num_reducers=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_assembly_reconstructs_any_row_layout(ray_session, lengths, num_refs, num_reducers, seed):
    w, s, v = _make_footprints(lengths, seed)
    # split the permuted rows into num_refs blocks (some possibly empty)
    cuts = np.sort(np.random.default_rng(seed + 1).integers(0, len(w) + 1, size=num_refs - 1))
    bounds = np.concatenate([[0], cuts, [len(w)]])
    tabs = [
        pa.table(
            {
                "walker_id": pa.array(w[a:b], pa.int64()),
                "step": pa.array(s[a:b], pa.int64()),
                "vertex": pa.array(v[a:b], pa.int64()),
            }
        )
        for a, b in zip(bounds[:-1], bounds[1:])
    ]
    exp = _expected(lengths)

    refs = [ray.put(t) for t in tabs]
    got = paths_to_numpy(assemble_footprint_refs(refs, num_reducers=num_reducers))
    assert set(got) == set(exp)
    for wid in exp:
        assert np.array_equal(got[wid], exp[wid]), (wid, got[wid], exp[wid])

    ds = ray.data.from_arrow(tabs)
    got2 = paths_to_numpy(assemble_paths(ds, num_shards=num_reducers))
    assert set(got2) == set(exp)
    for wid in exp:
        assert np.array_equal(got2[wid], exp[wid])

    # reported length column is steps-1 (edges walked)
    for row in assemble_footprint_refs(refs, num_reducers=num_reducers).take_all():
        assert row["length"] == len(exp[row["walker_id"]]) - 1
