"""Property-based checkpoint/resume test: for ANY (graph, partition
count, kill iteration, checkpoint cadence), a PageRank run killed after
its latest complete checkpoint and resumed on a FRESH actor pool must be
bit-identical to the uninterrupted run (the counter-based RNG/replay
design promises this for every configuration, not just the fixed ones in
test_checkpoint.py)."""
import shutil
import tempfile

import numpy as np
from hypothesis import given, settings, strategies as st

from kkray.ckpt import CheckpointManager
from kkray.graph import Graph
from kkray.analytics import pagerank

from graphgen import random_edges


@settings(max_examples=3, deadline=None)
@given(
    v=st.integers(min_value=5, max_value=80),
    e=st.integers(min_value=8, max_value=400),
    parts=st.integers(min_value=1, max_value=4),
    total_iters=st.integers(min_value=2, max_value=12),
    kill_after=st.integers(min_value=1, max_value=11),
    ce=st.integers(min_value=1, max_value=4),
    gseed=st.integers(min_value=0, max_value=10_000),
)
def test_pagerank_random_kill_resume_bit_identical(
    ray_session, v, e, parts, total_iters, kill_after, ce, gseed
):
    kill_after = min(kill_after, total_iters - 1)
    src, dst = random_edges(v, e, seed=gseed)
    if len(src) == 0:
        return
    with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
        full = pagerank(g, max_iters=total_iters, tol=None)
    tmp = tempfile.mkdtemp(prefix="kkray_ckpt_prop_")
    try:
        ck = CheckpointManager(tmp, "pr")
        with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
            pagerank(g, max_iters=kill_after, tol=None, checkpoint=ck, checkpoint_every=ce)
        with Graph.from_arrays(src, dst, num_parts=parts, v_num=v) as g:
            resumed = pagerank(
                g, max_iters=total_iters, tol=None, checkpoint=ck, checkpoint_every=ce, resume=True
            )
        assert np.array_equal(full, resumed)  # bit-identical, not allclose
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
