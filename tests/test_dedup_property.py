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


def test_avi_idx1_and_audio_stream_skipped():
    """Encoder writes a real idx1 (AVIF_HASINDEX is honest); decoder parses
    strf by the enclosing strh fccType, so an AVI that also carries an
    audio stream (16-byte WAVEFORMATEX strf) still decodes the video, and
    hex stream ids >= 10 ('0adb') parse instead of being misread."""
    import struct

    frames = np.arange(2 * 3 * 5 * 3, dtype=np.uint8).reshape(2, 3, 5, 3) % 251
    data = avi_encode(frames, fps=24)
    # idx1 present with one keyframe entry per frame, offsets resolving to
    # the actual '00db' chunks relative to the 'movi' fourcc
    i = data.index(b"idx1")
    (isz,) = struct.unpack_from("<I", data, i + 4)
    assert isz == 16 * 2
    movi = data.index(b"movi")
    for k in range(2):
        cc, flags, off, sz = struct.unpack_from("<4sIII", data, i + 8 + 16 * k)
        assert cc == b"00db" and flags == 0x10
        assert data[movi + off : movi + off + 4] == b"00db"
        (csz,) = struct.unpack_from("<I", data, movi + off + 4)
        assert csz == sz

    # build a synthetic AVI: audio strl FIRST (strf = WAVEFORMATEX, 16 bytes),
    # then the video strl, with the video data chunks under stream id 0x0a
    def chunk(tag, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind, payload):
        return chunk(b"LIST", kind + payload)

    h, w = 3, 5
    stride = (w * 3 + 3) & ~3
    frame_size = h * stride
    avih = struct.pack("<IIIIIIIIII4I", 40000, 0, 0, 0, 2, 0, 2, frame_size, w, h, 0, 0, 0, 0)
    strh_a = struct.pack("<4s4sIIIIIIIIII4H", b"auds", b"\x01\x00\x00\x00", 0, 0, 0, 1,
                         8000, 0, 16000, 2, 0xFFFFFFFF, 0, 0, 0, 0, 0)
    strf_a = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)  # WAVEFORMATEX, 16 bytes
    strh_v = struct.pack("<4s4sIIIIIIIIII4H", b"vids", b"DIB ", 0, 0, 0, 1, 24, 0, 2,
                         frame_size, 0xFFFFFFFF, 0, 0, 0, w, h)
    strf_v = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a))
               + lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_v)))
    bgr = frames[:, ::-1, :, ::-1]
    rows = np.zeros((2, h, stride), dtype=np.uint8)
    rows[:, :, : w * 3] = bgr.reshape(2, h, w * 3)
    movi_body = b"".join(chunk(b"01db", fb.tobytes()) for fb in rows.reshape(2, -1))
    movi_body += chunk(b"00wb", b"\x00\x00\x00\x00")  # audio data chunk (stream 0)
    movi_body += chunk(b"0adb", b"\x00\x00\x00\x00")  # hex stream id 10: parsed, ignored
    body = b"AVI " + hdrl + lst(b"movi", movi_body)
    synthetic = b"RIFF" + struct.pack("<I", len(body)) + body

    got, fps = avi_decode(synthetic)
    assert fps == 25
    assert np.array_equal(got, frames)
