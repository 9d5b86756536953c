"""Property-based tests (hypothesis) for the text edge-list ingest path.

The round-4 vectorized pyarrow parse must accept any whitespace layout a
text edge file can legally contain — tabs, runs of spaces, leading and
trailing whitespace, blank lines, missing final newline — and round-trip
bit-exactly through the binary converter.
"""
import os

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from kkray.io.storage import gconvert, read_binary_edges, read_edgelist_text

WS = st.sampled_from([" ", "\t", "  ", " \t ", "   "])


@st.composite
def edge_file(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    edges, lines = [], []
    for _ in range(n):
        s = draw(st.integers(min_value=0, max_value=2**40))
        d = draw(st.integers(min_value=0, max_value=2**40))
        w = draw(st.floats(min_value=0.0, max_value=100.0, allow_nan=False, width=32))
        edges.append((s, d, np.float32(w)))
        lead = draw(st.sampled_from(["", " ", "\t"]))
        lines.append(f"{lead}{s}{draw(WS)}{d}{draw(WS)}{np.float32(w)!r}")
        if draw(st.booleans()):
            lines.append(draw(st.sampled_from(["", " ", "\t "])))  # blank-ish line
    text = "\n".join(lines)
    if draw(st.booleans()):
        text += "\n"
    return text, edges


@settings(max_examples=8, deadline=None)
@given(tf=edge_file())
def test_edgelist_parse_any_whitespace_roundtrips(ray_session, tf, tmp_path_factory):
    text, edges = tf
    d = tmp_path_factory.mktemp("el")
    p = os.path.join(str(d), "edges.txt")
    with open(p, "w") as f:
        f.write(text)

    t = read_edgelist_text(p, weighted=True).to_pandas()
    assert len(t) == len(edges)
    got = sorted(zip(t["src"], t["dst"], t["weight"]))
    exp = sorted((s, dd, w) for s, dd, w in edges)
    for (gs, gd, gw), (es, ed, ew) in zip(got, exp):
        assert (gs, gd) == (es, ed)
        assert np.float32(gw) == np.float32(ew)  # text of repr(float32) parses exactly

    # binary round-trip: gconvert -> read_graph gives identical records
    b = os.path.join(str(d), "edges.bin")
    gconvert(p, b, weighted=True)
    rb = read_binary_edges(b, weighted=True).to_pandas()
    got_b = sorted(zip(rb["src"], rb["dst"], rb["weight"]))
    for (gs, gd, gw), (es, ed, ew) in zip(got_b, exp):
        assert (gs, gd) == (es, ed)
        assert np.float32(gw) == np.float32(ew)
