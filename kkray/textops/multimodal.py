"""Multimodal (image/audio/video) stages — REAL Ray-side plumbing, REAL
in-container codecs for PNG and WAV, stub fallback elsewhere.

Media travels as opaque ``binary`` columns with typed metadata
(media_type, width/height or sample_rate, duration). The decode /
feature-extract / resize / frame-sample kernels are actor-pool
``map_batches`` stages whose *Ray mechanics* (schema, batch sizing for
large payloads, once-per-actor setup, output layout) are real and tested.

Codec status (honest labeling):
* PNG image decode is REAL in this container — ``kkray.textops.codecs``
  implements the codec on stdlib zlib (8-bit gray/RGB/RGBA,
  non-interlaced, all five scanline filters); ``decoder="png"`` uses it,
  ``decoder="auto"`` prefers Pillow when importable, then the stdlib PNG
  path for PNG-signature payloads, then the deterministic fake.
* WAV audio decode is REAL (stdlib ``wave``) — see ``DecodeAudio``.
* Video decode (``SampleFrames``) would need ffmpeg and remains
  stub-only; ``decoder="fake"`` emits a payload-hash-seeded tensor of the
  declared shape (stable across runs, hermetic for tests).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .codecs import png_decode, wav_decode


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
        if decoder not in ("fake", "none", "pil", "png", "auto"):
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
                # auto without Pillow: real stdlib PNG codec for PNG
                # payloads, fake otherwise (resolved per payload)
                self.decoder = "auto_png"
            else:
                self.decoder = "pil"

    @staticmethod
    def _to_rgb(arr: np.ndarray) -> np.ndarray:
        """gray/RGBA -> RGB (the pipeline's canonical pixel layout)."""
        if arr.shape[2] == 1:
            return np.repeat(arr, 3, axis=2)
        if arr.shape[2] == 4:
            return arr[:, :, :3]
        return arr

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.decoder == "none":
            raise NotImplementedError(
                "real image decode requires Pillow (decoder='pil') or PNG "
                "payloads (decoder='png'); decoder='fake' for the stub"
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
        if self.decoder in ("png", "auto_png"):
            px, hs, ws = [], [], []
            for b, h, w in zip(df["payload"], df["height"], df["width"]):
                b = bytes(b)
                if b[:8] == b"\x89PNG\r\n\x1a\n":
                    arr = self._to_rgb(png_decode(b))  # REAL decode
                elif self.decoder == "auto_png":
                    arr = _fake_pixels(b, int(h), int(w))
                else:
                    raise ValueError("decoder='png' got a non-PNG payload")
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                px.append(arr.ravel())
            out["pixels"] = px
            out["height"] = hs
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


class DecodeAudio:
    """audio(payload WAV bytes) -> +samples (int16, channel-mean mono),
    +sample_rate, +n_samples. REAL decode via the stdlib ``wave`` module —
    no stub involved; non-WAV payloads raise. Stateless, but kept as a
    callable class so the actor-pool pattern (and future codec state, e.g.
    a resampler) has a home."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        samples, rates, ns = [], [], []
        for b in df["payload"]:
            arr, rate = wav_decode(bytes(b))
            mono = arr.mean(axis=1).astype(np.int16) if arr.shape[1] > 1 else arr[:, 0]
            samples.append(mono)
            rates.append(rate)
            ns.append(len(mono))
        out["samples"] = samples
        out["sample_rate"] = np.array(rates, dtype=np.int64)
        out["n_samples"] = np.array(ns, dtype=np.int64)
        return out


class AudioFeatures:
    """+samples -> feature vector: RMS level, zero-crossing rate, spectral
    centroid + rolloff (numpy rFFT) — real vectorized DSP kernels standing
    in for a model embedding."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        feats = []
        for s, rate in zip(df["samples"], df["sample_rate"]):
            x = np.asarray(s, dtype=np.float64) / 32768.0
            n = max(len(x), 1)
            rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
            zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
            if len(x) > 1:
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(len(x), d=1.0 / float(rate))
                tot = mag.sum()
                centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
                cum = np.cumsum(mag)
                roll = float(freqs[np.searchsorted(cum, 0.85 * tot)]) if tot > 0 else 0.0
            else:
                centroid = roll = 0.0
            feats.append(np.array([rms, zcr, centroid, roll, float(n) / float(rate)]))
        out["features"] = feats
        return out


class SampleFrames:
    """video(payload, n_frames, width, height) -> one row per sampled frame
    (uniform stride). Explode happens inside the batch.

    ``decoder="avi"`` is a REAL in-container path: uncompressed-AVI
    payloads (RIFF + 24-bit DIB stream) are decoded by the from-scratch
    container parser in ``codecs.avi_decode`` — actual pixels, frame
    count taken from the stream itself. ``"auto"`` uses the real path for
    RIFF/'AVI ' payloads and the deterministic fake otherwise;
    compressed codecs (MJPG/H264/...) still require ffmpeg, which this
    container lacks — ``decoder="none"`` documents that honestly."""

    def __init__(self, every: int = 10, decoder: str = "fake"):
        self.every = every
        self.decoder = decoder

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.decoder == "none":
            raise NotImplementedError("real video decode requires ffmpeg (not in this container)")
        from .codecs import avi_decode

        rows = []
        for mid, payload, n, h, w in zip(df["media_id"], df["payload"], df["n_frames"], df["height"], df["width"]):
            payload = bytes(payload)
            is_avi = payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
            if self.decoder == "avi" or (self.decoder == "auto" and is_avi):
                frames, _fps = avi_decode(payload)
                for f in range(0, len(frames), self.every):
                    fh, fw = frames.shape[1], frames.shape[2]
                    rows.append({"media_id": mid, "frame": f, "height": fh, "width": fw, "pixels": frames[f].ravel()})
                continue
            for f in range(0, int(n), self.every):
                frame = _fake_pixels(payload + f.to_bytes(4, "little"), int(h), int(w))
                rows.append({"media_id": mid, "frame": f, "height": h, "width": w, "pixels": frame.ravel()})
        return pd.DataFrame(rows)
