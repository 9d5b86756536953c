"""Multimodal (image/audio/video) stages — REAL Ray-side plumbing,
STUBBED codecs.

Media travels as opaque ``binary`` columns with typed metadata
(media_type, width/height or sample_rate, duration). The decode /
feature-extract / resize / frame-sample kernels are actor-pool
``map_batches`` stages whose *Ray mechanics* (schema, batch sizing for
large payloads, once-per-actor setup, output layout) are real and tested;
the image codec is real where Pillow exists (``decoder="pil"``/"auto",
optional import at actor init) and a clearly-marked deterministic stub
where it doesn't (``decoder="fake"``: hash-derived tensor of the declared
shape, stable across runs — this container ships no image/audio libs, so
tests stay hermetic on the fake). Video decode (``SampleFrames``) would
need ffmpeg and remains stub-only.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _fake_pixels(payload: bytes, h: int, w: int, c: int = 3) -> np.ndarray:
    """Deterministic pseudo-decode: seed a Philox stream from the payload
    digest and emit the declared shape."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    rng = np.random.Generator(np.random.Philox(seed))
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


class DecodeImage:
    """pages/media(bytes, width, height) -> +pixels (flattened uint8 RGB).

    Decoders (resolved ONCE per actor in __init__, the stateful-stage
    rule): ``"pil"`` decodes real image bytes via Pillow (optional import —
    raises ImportError at actor init when Pillow is absent), ``"auto"``
    uses Pillow when importable else the deterministic fake, ``"fake"``
    emits a payload-hash-seeded tensor of the declared shape (hermetic for
    tests/benchmarks), ``"none"`` raises NotImplementedError.

    Batch sizing note: decoded frames are ~W*H*3 bytes; callers must size
    ``batch_size`` so batch x concurrency fits worker heap (the
    memory-aware rule for binary payloads)."""

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "none", "pil", "auto"):
            raise ValueError(decoder)
        self.decoder = decoder
        self._pil = None
        if decoder in ("pil", "auto"):
            try:
                from PIL import Image  # optional dependency

                self._pil = Image
            except ImportError:
                if decoder == "pil":
                    raise
                self.decoder = "fake"
            else:
                self.decoder = "pil"

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.decoder == "none":
            raise NotImplementedError(
                "real image decode requires Pillow/opencv; use decoder='pil' "
                "where Pillow is installed or decoder='fake' for the stub"
            )
        out = df.copy()
        if self.decoder == "pil":
            import io

            def dec(b):
                img = self._pil.open(io.BytesIO(b)).convert("RGB")
                return np.asarray(img, dtype=np.uint8)

            px, hs, ws = [], [], []
            for b in df["payload"]:
                arr = dec(bytes(b))
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                px.append(arr.ravel())
            out["pixels"] = px
            out["height"] = hs  # true decoded dims override declared metadata
            out["width"] = ws
            return out
        out["pixels"] = [
            _fake_pixels(b, int(h), int(w)).ravel()
            for b, h, w in zip(df["payload"], df["height"], df["width"])
        ]
        return out


class ResizeImage:
    """+pixels -> resized (nearest-neighbour, pure numpy — real kernel, no
    codec needed)."""

    def __init__(self, out_h: int, out_w: int):
        self.oh, self.ow = out_h, out_w

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        res = []
        for px, h, w in zip(df["pixels"], df["height"], df["width"]):
            img = np.asarray(px, dtype=np.uint8).reshape(int(h), int(w), 3)
            yi = (np.arange(self.oh) * h // self.oh).astype(int)
            xi = (np.arange(self.ow) * w // self.ow).astype(int)
            res.append(img[yi][:, xi].ravel())
        out["pixels"] = res
        out["height"] = self.oh
        out["width"] = self.ow
        return out


class ImageFeatures:
    """+pixels -> feature vector (channel means/stds + 8-bin luma histogram
    — a real vectorized kernel standing in for a model embedding)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        feats = []
        for px, h, w in zip(df["pixels"], df["height"], df["width"]):
            img = np.asarray(px, dtype=np.float64).reshape(int(h), int(w), 3)
            luma = img @ np.array([0.299, 0.587, 0.114])
            hist, _ = np.histogram(luma, bins=8, range=(0, 256))
            feats.append(
                np.concatenate([img.mean(axis=(0, 1)), img.std(axis=(0, 1)), hist / luma.size])
            )
        out["features"] = feats
        return out


class SampleFrames:
    """video(payload, n_frames, width, height) -> one row per sampled frame
    (uniform stride). Explode happens inside the batch."""

    def __init__(self, every: int = 10, decoder: str = "fake"):
        self.every = every
        self.decoder = decoder

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.decoder == "none":
            raise NotImplementedError("real video decode requires ffmpeg (not in this container)")
        rows = []
        for mid, payload, n, h, w in zip(df["media_id"], df["payload"], df["n_frames"], df["height"], df["width"]):
            for f in range(0, int(n), self.every):
                frame = _fake_pixels(payload + f.to_bytes(4, "little"), int(h), int(w))
                rows.append({"media_id": mid, "frame": f, "height": h, "width": w, "pixels": frame.ravel()})
        return pd.DataFrame(rows)
