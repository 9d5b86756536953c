"""Property-based tests (hypothesis): PNG codec round-trip and exact
n-gram Jaccard pairs vs a brute-force set reference.

Tiny vocabularies force shared shingles across many docs (the hot-template
regime), and awkward image shapes (1x1, single row/column) hit the codec's
scanline edge cases.
"""
import numpy as np
import pandas as pd
import ray.data
from hypothesis import given, settings, strategies as st

from kkray.textops.codecs import avi_decode, avi_encode, png_decode, png_encode, wav_decode, wav_encode
from kkray.textops.dedup import _shingles, ngram_jaccard_pairs


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_bit_exact(h, w, c, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w) if c == 1 else (h, w, c), dtype=np.uint8)
    out = png_decode(png_encode(img))
    exp = img[:, :, None] if img.ndim == 2 else img
    assert out.shape == exp.shape
    assert np.array_equal(out, exp)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    rate=st.sampled_from([8_000, 16_000, 44_100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_bit_exact(n, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, size=n).astype(np.int16)
    got, got_rate = wav_decode(wav_encode(samples, sample_rate=rate))
    assert got_rate == rate
    assert np.array_equal(got, samples[:, None])  # decode returns (n, channels)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=6),
    h=st.integers(min_value=1, max_value=10),
    w=st.integers(min_value=1, max_value=10),  # odd widths exercise stride padding
    fps=st.sampled_from([10, 24, 25, 30]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_avi_roundtrip_bit_exact(n, h, w, fps, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    got, got_fps = avi_decode(avi_encode(frames, fps=fps))
    assert got_fps == fps
    assert got.shape == frames.shape
    assert np.array_equal(got, frames)


def test_avi_rejects_compressed_and_non_avi():
    import struct

    import pytest as _pytest

    with _pytest.raises(ValueError):
        avi_decode(b"not a riff payload at all....")
    good = avi_encode(np.zeros((1, 2, 2, 3), dtype=np.uint8))
    # corrupt biCompression inside strf (offset found by scanning for the tag)
    i = good.index(b"strf") + 8 + 16
    bad = good[:i] + struct.pack("<I", 0x47504A4D) + good[i + 4 :]
    with _pytest.raises(ValueError):
        avi_decode(bad)


docs_strategy = st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=15,
)


@settings(max_examples=10, deadline=None)
@given(
    texts=docs_strategy,
    sn=st.integers(min_value=1, max_value=3),
    thr=st.sampled_from([0.2, 0.5, 0.8]),
)
def test_ngram_jaccard_pairs_match_bruteforce(ray_session, texts, sn, thr):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    # collect_arrow is the engine's small-result consumption helper — plain
    # Dataset.to_pandas drops columns of zero-row results (Ray quirk)
    from kkray.ops import collect_arrow

    got = (
        collect_arrow(ngram_jaccard_pairs(ray.data.from_pandas(df), shingle_n=sn, threshold=thr, num_partitions=2))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    exp_rows = []
    sets = [_shingles(t, sn) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if not sets[i] or not sets[j]:
                continue
            jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
            if jac >= thr:
                exp_rows.append((i, j, jac))
    exp = pd.DataFrame(exp_rows, columns=["a", "b", "jaccard"]).sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(exp), (got, exp)
    if len(exp):
        assert np.array_equal(got["a"].to_numpy(np.int64), exp["a"].to_numpy(np.int64))
        assert np.array_equal(got["b"].to_numpy(np.int64), exp["b"].to_numpy(np.int64))
        assert np.allclose(got["jaccard"].to_numpy(), exp["jaccard"].to_numpy(), atol=0, rtol=0)
